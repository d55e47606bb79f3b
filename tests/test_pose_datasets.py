"""Behavioral tests for the head-pose dataset loaders (VERDICT r3 weak
#8: data/pose_datasets.py had import-level coverage only).

Synthetic fixtures replicate the on-disk schemas the loaders are gated
on: 300W-LP/AFLW2000 per-image .mat files with a radians `Pose_Para`
(reference mysixdrepnet.py:430-447), and the BIWI frame_XXXXX_rgb.png +
_pose.txt layout (mysixdrepnet.py:640-700).
"""

import os

import numpy as np
import pytest

from megaportraits_tpu.data.pose_datasets import (
    AFLW2000,
    BIWI,
    Pose300WLP,
    pose_batches,
)


def _write_image(path, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def wlp_dir(tmp_path):
    from scipy.io import savemat

    d = tmp_path / "300wlp"
    d.mkdir()
    # pitch, yaw, roll in radians (the .mat convention), then 3 unused
    # translation/scale slots as in the real files.
    poses = {
        "img0": (0.1, -0.3, 0.05),
        "img1": (-0.4, 0.2, 0.0),
    }
    for name, (p, y, r) in poses.items():
        savemat(str(d / f"{name}.mat"),
                {"Pose_Para": np.array([[p, y, r, 0.0, 0.0, 0.0]])})
        _write_image(str(d / f"{name}.jpg"))
    return str(d), poses


def test_pose300wlp_loads_pose_and_image(wlp_dir):
    data_dir, poses = wlp_dir
    ds = Pose300WLP(data_dir, img_size=24)
    assert len(ds) == 2
    img, rot, (pitch, yaw, roll) = ds[0]
    assert img.shape == (24, 24, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # Euler angles come back in degrees, converted from the .mat radians.
    p, y, r = poses["img0"]
    np.testing.assert_allclose(
        (pitch, yaw, roll),
        (np.degrees(p), np.degrees(y), np.degrees(r)),
        atol=1e-4,
    )
    # The returned matrix is a valid rotation consistent with the angles.
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)


def test_aflw2000_shares_schema(wlp_dir):
    data_dir, _ = wlp_dir
    ds = AFLW2000(data_dir, filename_list=["img1"], img_size=16)
    assert len(ds) == 1
    img, rot, _ = ds[0]
    assert img.shape == (16, 16, 3)
    assert rot.shape == (3, 3)


def test_biwi_reads_rotation_and_recovers_euler(tmp_path):
    d = tmp_path / "biwi" / "01"
    d.mkdir(parents=True)
    # A pure roll rotation: euler recovery must return (0, 0, 30 deg).
    th = np.radians(30.0)
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0.0],
         [np.sin(th), np.cos(th), 0.0],
         [0.0, 0.0, 1.0]], dtype=np.float32)
    vals = list(rot.reshape(-1)) + [10.0, 20.0, 30.0]  # R then t
    (d / "frame_00001_pose.txt").write_text(
        " ".join(f"{v:.6f}" for v in vals))
    _write_image(str(d / "frame_00001_rgb.png"))
    # A pose file without its rgb frame must be skipped, not crash.
    (d / "frame_00002_pose.txt").write_text(
        " ".join(f"{v:.6f}" for v in vals))

    ds = BIWI(str(tmp_path / "biwi"), img_size=20)
    assert len(ds) == 1
    img, rot_out, (pitch, yaw, roll) = ds[0]
    assert img.shape == (20, 20, 3)
    np.testing.assert_allclose(rot_out, rot, atol=1e-5)
    np.testing.assert_allclose((pitch, yaw, roll), (0.0, 0.0, 30.0),
                               atol=1e-4)


def test_pose_batches_stacks_and_cycles(wlp_dir):
    data_dir, _ = wlp_dir
    ds = Pose300WLP(data_dir, img_size=16)
    it = pose_batches(ds, batch_size=3, seed=1)
    batch = next(it)
    assert batch["image"].shape == (3, 16, 16, 3)
    assert batch["rotation"].shape == (3, 3, 3)
    # Infinite sampler: a second draw works and differs in general.
    batch2 = next(it)
    assert batch2["image"].shape == (3, 16, 16, 3)
