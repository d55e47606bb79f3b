"""Alternative head-pose warp math (reference warp.py — dead code there,
never imported, with an undefined-variable bug at warp.py:108; reimplemented
working for component parity, SURVEY.md section 2.3).

Implements the binned-softmax pose decoding used by Hopenet-style
estimators plus the coordinate-grid rt-warp variant.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from megaportraits_tpu.ops.affine_grid import rotation_matrix_from_euler_deg


def headpose_pred_to_degree(pred: jnp.ndarray) -> jnp.ndarray:
    """[B, 66] binned logits -> degrees (warp.py:12-25):
    softmax-expected bin index * 3 - 99."""
    idx = jnp.arange(66, dtype=jnp.float32)
    probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
    return jnp.sum(probs * idx, axis=-1) * 3.0 - 99.0


def get_rotation_matrix(yaw: jnp.ndarray, pitch: jnp.ndarray,
                        roll: jnp.ndarray) -> jnp.ndarray:
    """Euler degrees -> rotation matrix (warp.py:28-68 semantics)."""
    angles = jnp.stack([pitch, yaw, roll], axis=-1)
    return rotation_matrix_from_euler_deg(angles)


def make_coordinate_grid(spatial_size: Tuple[int, ...]) -> jnp.ndarray:
    """Identity grid in [-1, 1] (warp.py:71-85). 2D -> [H,W,2] (x,y);
    3D -> [D,H,W,3] (x,y,z)."""
    axes = [np.linspace(-1.0, 1.0, s) if s > 1 else np.zeros(1)
            for s in spatial_size]
    mesh = np.meshgrid(*axes, indexing="ij")
    # channel order: minor-first (x over W, then y, then z)
    grid = np.stack(list(reversed(mesh)), axis=-1)
    return jnp.asarray(grid.astype(np.float32))


def compute_rt_warp2(
    rotation_logits: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    translation: jnp.ndarray,
    grid_size: Tuple[int, int, int] = (16, 64, 64),
) -> jnp.ndarray:
    """Binned pose logits + translation -> rt warp grid [B, D, H, W, 3]
    (warp.py:88-114, with the reference's undefined-`t` bug fixed: the
    translation argument is actually applied)."""
    yaw_logits, pitch_logits, roll_logits = rotation_logits
    yaw = headpose_pred_to_degree(yaw_logits)
    pitch = headpose_pred_to_degree(pitch_logits)
    roll = headpose_pred_to_degree(roll_logits)
    rot = get_rotation_matrix(yaw, pitch, roll)  # [B,3,3]

    grid = make_coordinate_grid(grid_size)  # [D,H,W,3]
    flat = grid.reshape(-1, 3)
    warped = jnp.einsum(
        "bij,nj->bni", rot, flat, precision=jax.lax.Precision.HIGHEST
    ) + translation.astype(jnp.float32)[:, None, :]
    b = rot.shape[0]
    return warped.reshape(b, *grid_size, 3)
