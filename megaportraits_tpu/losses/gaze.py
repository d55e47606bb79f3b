"""Gaze / blink losses (reference model.py:1756-1880).

The reference's GazeBlinkLoss (VGG16 eye backbone + keypoint MLP + gaze and
blink heads, RT-GENE-style training recipe) and MPGazeLoss (MediaPipe eye-
landmark masks + masked MSE) are host-coupled: MediaPipe FaceMesh is a CPU
library and is effectively disabled in the reference's own loss path
(model.py:1961,1971). Per SURVEY.md section 7 hard-part 3 the TPU design
keeps landmark extraction host-side and OPTIONAL from day one:

  * the device-side math (feature nets, heads, masked MSE) is pure jnp/linen
    and fully jittable;
  * eye landmarks/masks arrive as batch inputs produced on the host
    (eye_masks_from_landmarks). MediaPipe is absent in this environment, so
    there is no default landmark provider — plug any 468/68-point detector.

Defect fixed vs reference: GazeBlinkLoss's heads expect 256-d eye features
while its VGG16 backbone emits 4096 (model.py:1771,1785-1796, never
runnable); we project 4096 -> 256 explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.losses.perceptual import VGG
from megaportraits_tpu.nn.layers import TorchDense


class GazeBlinkLoss(nn.Module):
    """Gaze + blink prediction loss (model.py:1756-1825)."""

    w_mae: float = 15.0
    w_mse: float = 10.0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(
        self,
        left_eye: jnp.ndarray,    # [B, h, w, 3] eye crops
        right_eye: jnp.ndarray,
        keypoints: jnp.ndarray,   # [B, 136] (68 x/y landmarks)
        target_gaze: jnp.ndarray,  # [B, 2]
        target_blink: jnp.ndarray,  # [B, 1]
    ):
        p = self.policy

        backbone = VGG(cfg="vgg16", taps=((4, 2),), policy=p, name="backbone")

        def eye_features(eye):
            feats = backbone(p.cast_to_compute(eye))[0]
            pooled = jnp.mean(feats, axis=(1, 2))  # [B, 512]
            return pooled

        eye = eye_features(left_eye) + eye_features(right_eye)
        eye = TorchDense(256, policy=p, name="eye_proj")(eye)

        kp = keypoints.astype(p.compute_dtype)
        for i in (0, 1, 2):
            kp = nn.relu(TorchDense(64, policy=p, name=f"kp_fc{i}")(kp))

        gaze_in = jnp.concatenate([eye, kp], axis=-1)  # [B, 320]
        g = nn.relu(TorchDense(256, policy=p, name="gaze_fc0")(gaze_in))
        predicted_gaze = TorchDense(2, policy=p, name="gaze_fc1")(g)

        b = nn.relu(TorchDense(256, policy=p, name="blink_fc0")(eye))
        predicted_blink = TorchDense(1, policy=p, name="blink_fc1")(b)

        pg = predicted_gaze.astype(jnp.float32)
        tg = target_gaze.astype(jnp.float32)
        gaze_loss = (self.w_mae * jnp.mean(jnp.abs(pg - tg))
                     + self.w_mse * jnp.mean((pg - tg) ** 2))
        blink_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
            predicted_blink.astype(jnp.float32),
            target_blink.astype(jnp.float32),
        ))
        return gaze_loss + blink_loss, predicted_gaze, predicted_blink


def mp_gaze_loss(
    predicted_gaze: jnp.ndarray,
    target_gaze: jnp.ndarray,
    left_mask: jnp.ndarray,
    right_mask: jnp.ndarray,
) -> jnp.ndarray:
    """MPGazeLoss device math (model.py:1830-1880): per-eye masked MSE.

    Masks [B, H, W, 1] come from the host (eye_masks_from_landmarks).
    """
    pg = predicted_gaze.astype(jnp.float32)
    tg = target_gaze.astype(jnp.float32)
    left = jnp.mean((pg * left_mask - tg * left_mask) ** 2)
    right = jnp.mean((pg * right_mask - tg * right_mask) ** 2)
    return left + right


def gaze_masks_for_batch(images: np.ndarray) -> Optional[np.ndarray]:
    """Host helper for the train-step gaze term: detect landmarks on each
    [H, W, 3] frame with the installed provider and rasterize left/right
    eye-region masks.

    Returns [B, H, W, 2] float32 (channel 0 = left eye, 1 = right eye),
    or None when the provider yields no 68-point landmarks (box proxies
    carry no eye geometry — the term should then be skipped, matching
    the reference where MediaPipe gaze is effectively disabled,
    model.py:1961,1971)."""
    from megaportraits_tpu.data.landmarks import (
        LEFT_EYE, RIGHT_EYE, get_landmark_provider,
    )

    provider = get_landmark_provider()
    if getattr(provider, "num_points", 0) < 68:
        return None
    b, h, w = images.shape[:3]
    out = np.zeros((b, h, w, 2), np.float32)
    for i in range(b):
        lm = provider.detect(images[i])
        if lm is None or lm.shape[0] < 68:
            return None
        for ch, idx in ((0, LEFT_EYE), (1, RIGHT_EYE)):
            pts = lm[list(idx)].astype(np.int32)
            out[i, :, :, ch:ch + 1] = eye_masks_from_landmarks(
                [tuple(p) for p in pts], h, w
            )
    return out


def eye_masks_from_landmarks(
    landmarks_px: Sequence[Tuple[int, int]],
    height: int,
    width: int,
) -> np.ndarray:
    """Host helper: polygon landmark pixels -> [H, W, 1] float mask."""
    mask = np.zeros((height, width), dtype=np.float32)
    try:
        import cv2

        cv2.fillPoly(mask, [np.asarray(landmarks_px, dtype=np.int32)], 1.0)
    except Exception:
        pts = np.asarray(landmarks_px)
        y0, y1 = pts[:, 1].min(), pts[:, 1].max() + 1
        x0, x1 = pts[:, 0].min(), pts[:, 0].max() + 1
        mask[max(y0, 0):y1, max(x0, 0):x1] = 1.0
    return mask[..., None]
