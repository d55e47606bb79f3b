"""Rotation/translation warp math (torch F.affine_grid equivalent).

The reference builds head-pose warps by converting Euler angles (degrees) to a
rotation matrix, assembling a 4x4 affine, optionally inverting it, and
evaluating ``F.affine_grid`` over a 64^3 lattice (reference model.py:777-856).
JAX has no affine_grid; we reproduce torch's exact coordinate conventions
here. Everything is closed-form elementwise math plus one [B,3,4]x[N,4]
batched matmul — MXU-friendly, no gathers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotation_matrix_from_euler_deg(rotation_deg: jnp.ndarray) -> jnp.ndarray:
    """Euler degrees [B,3] -> rotation matrices [B,3,3].

    Matches reference compute_rotation_matrix (model.py:811-856):
    R = R_x(a0) @ R_y(a1) @ R_z(a2), angles in degrees.
    """
    rad = rotation_deg * (jnp.pi / 180.0)
    ca, cb, cg = jnp.cos(rad[:, 0]), jnp.cos(rad[:, 1]), jnp.cos(rad[:, 2])
    sa, sb, sg = jnp.sin(rad[:, 0]), jnp.sin(rad[:, 1]), jnp.sin(rad[:, 2])
    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)

    r_a = jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=1),
            jnp.stack([zero, ca, -sa], axis=1),
            jnp.stack([zero, sa, ca], axis=1),
        ],
        axis=1,
    )
    r_b = jnp.stack(
        [
            jnp.stack([cb, zero, sb], axis=1),
            jnp.stack([zero, one, zero], axis=1),
            jnp.stack([-sb, zero, cb], axis=1),
        ],
        axis=1,
    )
    r_g = jnp.stack(
        [
            jnp.stack([cg, -sg, zero], axis=1),
            jnp.stack([sg, cg, zero], axis=1),
            jnp.stack([zero, zero, one], axis=1),
        ],
        axis=1,
    )
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(r_a, jnp.matmul(r_b, r_g, precision=hi), precision=hi)


@functools.lru_cache(maxsize=None)
def _base_grid_3d(
    d: int, h: int, w: int, align_corners: bool
) -> np.ndarray:
    """Homogeneous base grid [D,H,W,4] with torch affine_grid conventions.

    Coordinates are (x, y, z, 1) where x varies along W, y along H, z along D.
    align_corners=False scales linspace(-1,1,S) by (S-1)/S (pixel centers).
    """

    def axis_coords(s: int) -> np.ndarray:
        if s == 1:
            return np.zeros((1,), dtype=np.float64)
        c = np.linspace(-1.0, 1.0, s)
        if not align_corners:
            c = c * (s - 1) / s
        return c

    zs = axis_coords(d)
    ys = axis_coords(h)
    xs = axis_coords(w)
    grid = np.empty((d, h, w, 4), dtype=np.float64)
    grid[..., 0] = xs[None, None, :]
    grid[..., 1] = ys[None, :, None]
    grid[..., 2] = zs[:, None, None]
    grid[..., 3] = 1.0
    return grid.astype(np.float32)


def affine_grid_3d(
    theta: jnp.ndarray,
    size: Tuple[int, int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch ``F.affine_grid(theta, (B,1,D,H,W))`` equivalent.

    Args:
      theta: [B, 3, 4] affine matrices.
      size: output lattice (D, H, W).
    Returns:
      grid [B, D, H, W, 3] with (x, y, z) in the last axis.
    """
    d, h, w = size
    base = jnp.asarray(_base_grid_3d(d, h, w, align_corners))  # [D,H,W,4]
    flat = base.reshape(-1, 4)  # [N,4]
    out = jnp.einsum(
        "bij,nj->bni",
        theta,
        flat,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(theta.shape[0], d, h, w, 3)


def compute_rt_warp(
    rotation_deg: jnp.ndarray,
    translation: jnp.ndarray,
    invert: bool = False,
    grid_size: int = 64,
) -> jnp.ndarray:
    """Head-pose rotation/translation warp field.

    Mirrors reference compute_rt_warp (model.py:777-809): 4x4 affine from
    (R, t), optional inverse (source->canonical), F.affine_grid over
    grid_size^3 with align_corners=False.

    Returns channels-last flow [B, D, H, W, 3] with (x, y, z) components —
    the reference keeps [B, 3, D, H, W]; we stay channels-last for TPU layout.
    """
    b = rotation_deg.shape[0]
    rot = rotation_matrix_from_euler_deg(rotation_deg)
    affine = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    affine = affine.at[:, :3, :3].set(rot)
    affine = affine.at[:, :3, 3].set(translation)
    if invert:
        affine = jnp.linalg.inv(affine)
    return affine_grid_3d(
        affine[:, :3, :], (grid_size, grid_size, grid_size), align_corners=False
    )
