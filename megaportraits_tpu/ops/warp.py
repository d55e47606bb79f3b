"""3D flow-field application — THE hot op of the MegaPortraits pipeline.

Reference: ``apply_warping_field`` (model.py:1028-1065) — trilinear-resize the
flow to the volume dims, add it to an identity meshgrid, renormalize, then
``F.grid_sample(..., mode='bilinear', padding_mode='border',
align_corners=True)`` over a [B, 96, 16, 64, 64] feature volume.

TPU design notes
----------------
* Volumes are channels-last [B, D, H, W, C]; each gathered sample pulls a
  whole contiguous C-vector (C=96 -> one near-full 128-lane register row), so
  the XLA gather is HBM-bandwidth-bound, not latency-bound. For the canonical
  16x64x64x96 volume the 8-corner gather reads ~100 MB/image in bf16 —
  a fraction of a millisecond of HBM time per frame.
* All index/weight math (identity grid, flow add, renormalize, corner
  weights) is fused elementwise VPU work; XLA fuses it into the gather
  prologue. A Pallas kernel for the full fusion lives in ops/pallas/.
* ``normalize_mode='reference'`` reproduces the reference's renormalization
  bit-for-bit (including its [W-1,H-1,D-1] divide of already-normalized
  coords — see model.py:1056-1058); ``'standard'`` uses the textbook
  grid+flow in [-1,1]. Parity tests pin the reference mode against torch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from megaportraits_tpu.ops.resize import linear_resize


@functools.lru_cache(maxsize=None)
def _identity_grid(d: int, h: int, w: int) -> np.ndarray:
    """[D,H,W,3] identity grid with (x,y,z) in [-1,1], align-corners spacing.

    Matches the meshgrid stacked as (grid_w, grid_h, grid_d) in reference
    model.py:1040-1044.
    """
    zs = np.linspace(-1.0, 1.0, d) if d > 1 else np.zeros((1,))
    ys = np.linspace(-1.0, 1.0, h) if h > 1 else np.zeros((1,))
    xs = np.linspace(-1.0, 1.0, w) if w > 1 else np.zeros((1,))
    grid = np.empty((d, h, w, 3), dtype=np.float64)
    grid[..., 0] = xs[None, None, :]
    grid[..., 1] = ys[None, :, None]
    grid[..., 2] = zs[:, None, None]
    return grid.astype(np.float32)


def _unnormalize(t, size, align_corners):
    if align_corners:
        return (t + 1.0) * 0.5 * (size - 1)
    return ((t + 1.0) * size - 1.0) * 0.5


def grid_sample_3d(
    v: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = True,
    impl: str = "block",
) -> jnp.ndarray:
    """Trilinear 3D grid sample, border padding, torch conventions.

    Args:
      v: volume [B, D, H, W, C] (channels-last).
      coords: sample coordinates [B, Do, Ho, Wo, 3], (x, y, z) in [-1, 1].
      align_corners: torch align_corners flag (reference uses True).
      impl: 'block' — ONE lax.gather of 2x2x2xC corner blocks per sample
            (8x fewer index records than the naive form, contiguous
            2*C-element x-runs; the default, ~35%% faster on TPU);
            'block_xc' — same data as ONE gather of [2,2,2C] slices from
            an x*C-merged volume (one fewer offset dim; layout candidate
            for shaving XLA's gather-loop overhead — pallas/README.md
            round-4 note);
            'corners' — 8 independent flat gathers (reference oracle).

    Returns:
      [B, Do, Ho, Wo, C] sampled volume. Differentiable in both arguments.
    """
    if impl == "block":
        return _grid_sample_3d_block(v, coords, align_corners)
    if impl == "block_xc":
        return _grid_sample_3d_block_xc(v, coords, align_corners)
    return _grid_sample_3d_corners(v, coords, align_corners)


def _corner_setup(v, coords, align_corners):
    b, d, h, w, c = v.shape
    coords = coords.astype(jnp.float32)
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    # Border padding == clamp pixel coords into the valid range.
    xp = jnp.clip(_unnormalize(x, w, align_corners), 0.0, w - 1)
    yp = jnp.clip(_unnormalize(y, h, align_corners), 0.0, h - 1)
    zp = jnp.clip(_unnormalize(z, d, align_corners), 0.0, d - 1)
    return xp, yp, zp


def _grid_sample_3d_corners(v, coords, align_corners=True):
    b, d, h, w, c = v.shape
    _, do, ho, wo, _ = coords.shape
    xp, yp, zp = _corner_setup(v, coords, align_corners)

    x0 = jnp.floor(xp)
    y0 = jnp.floor(yp)
    z0 = jnp.floor(zp)
    tx = xp - x0
    ty = yp - y0
    tz = zp - z0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, d - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    z1i = jnp.minimum(z0i + 1, d - 1)

    v_flat = v.reshape(b, d * h * w, c)
    n_out = do * ho * wo

    def flat_idx(zi, yi, xi):
        return ((zi * h + yi) * w + xi).reshape(b, n_out)

    def take(idx):
        return jnp.take_along_axis(v_flat, idx[..., None], axis=1)

    # 8-corner trilinear blend; weights broadcast over C.
    out = jnp.zeros((b, n_out, c), dtype=jnp.float32)
    for zi, wz in ((z0i, 1.0 - tz), (z1i, tz)):
        for yi, wy in ((y0i, 1.0 - ty), (y1i, ty)):
            for xi, wx in ((x0i, 1.0 - tx), (x1i, tx)):
                weight = (wz * wy * wx).reshape(b, n_out, 1)
                out = out + weight * take(flat_idx(zi, yi, xi)).astype(
                    jnp.float32
                )
    return out.reshape(b, do, ho, wo, c).astype(v.dtype)


def _grid_sample_3d_block(v, coords, align_corners=True):
    """One gather of [2,2,2,C] corner blocks per sample point.

    Corner starts are clamped to size-2 so the 2-wide window stays in
    bounds; the fractional weight is taken relative to the clamped start
    (t in [0, 1] still reproduces border clamping exactly: at the high
    border t hits 1.0 and all weight moves to the far corner).
    """
    b, d, h, w, c = v.shape
    _, do, ho, wo, _ = coords.shape
    xp, yp, zp = _corner_setup(v, coords, align_corners)

    # Clamped block starts (degenerate axes with size 1 clamp to 0).
    x0i = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, max(w - 2, 0))
    y0i = jnp.clip(jnp.floor(yp).astype(jnp.int32), 0, max(h - 2, 0))
    z0i = jnp.clip(jnp.floor(zp).astype(jnp.int32), 0, max(d - 2, 0))
    tx = xp - x0i
    ty = yp - y0i
    tz = zp - z0i

    n_out = do * ho * wo
    starts = jnp.stack(
        [z0i.reshape(b, n_out), y0i.reshape(b, n_out),
         x0i.reshape(b, n_out)],
        axis=-1,
    )  # [B, N, 3]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    blocks = jax.lax.gather(
        v,
        starts,
        dimension_numbers=dnums,
        slice_sizes=(1, 2, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 2, 2, 2, C]

    wz = jnp.stack([1.0 - tz, tz], axis=-1).reshape(b, n_out, 2)
    wy = jnp.stack([1.0 - ty, ty], axis=-1).reshape(b, n_out, 2)
    wx = jnp.stack([1.0 - tx, tx], axis=-1).reshape(b, n_out, 2)
    weights = (wz[:, :, :, None, None] * wy[:, :, None, :, None]
               * wx[:, :, None, None, :])  # [B, N, 2, 2, 2]
    out = jnp.sum(
        blocks.astype(jnp.float32) * weights[..., None], axis=(2, 3, 4)
    )
    return out.reshape(b, do, ho, wo, c).astype(v.dtype)


def _grid_sample_3d_block_xc(v, coords, align_corners=True):
    """Corner-block gather from an x*C-merged volume: slices [1,2,2,2C]
    at start (b, z0, y0, x0*C). Identical bytes to 'block' (the x-run IS
    contiguous 2C elements in row-major [B,D,H,W,C]); one fewer offset
    dimension in the gather — a layout candidate for XLA's gather-loop
    overhead (the measured 1.1-1.8 ms vs ~0.13 ms roofline gap)."""
    b, d, h, w, c = v.shape
    _, do, ho, wo, _ = coords.shape
    xp, yp, zp = _corner_setup(v, coords, align_corners)

    x0i = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, max(w - 2, 0))
    y0i = jnp.clip(jnp.floor(yp).astype(jnp.int32), 0, max(h - 2, 0))
    z0i = jnp.clip(jnp.floor(zp).astype(jnp.int32), 0, max(d - 2, 0))
    tx = xp - x0i
    ty = yp - y0i
    tz = zp - z0i

    n_out = do * ho * wo
    starts = jnp.stack(
        [z0i.reshape(b, n_out), y0i.reshape(b, n_out),
         (x0i * c).reshape(b, n_out)],
        axis=-1,
    )  # [B, N, 3]

    v_xc = v.reshape(b, d, h, w * c)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    blocks = jax.lax.gather(
        v_xc,
        starts,
        dimension_numbers=dnums,
        slice_sizes=(1, 2, 2, 2 * c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(b, n_out, 2, 2, 2, c)

    wz = jnp.stack([1.0 - tz, tz], axis=-1).reshape(b, n_out, 2)
    wy = jnp.stack([1.0 - ty, ty], axis=-1).reshape(b, n_out, 2)
    wx = jnp.stack([1.0 - tx, tx], axis=-1).reshape(b, n_out, 2)
    weights = (wz[:, :, :, None, None] * wy[:, :, None, :, None]
               * wx[:, :, None, None, :])
    out = jnp.sum(
        blocks.astype(jnp.float32) * weights[..., None], axis=(2, 3, 4)
    )
    return out.reshape(b, do, ho, wo, c).astype(v.dtype)


def _reflect_coords(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch reflection padding (align_corners=False): reflect about
    -0.5 and size-0.5, then clamp into the valid pixel range."""
    lo, hi = -0.5, size - 0.5
    span = hi - lo
    x = jnp.mod(x - lo, 2.0 * span)
    x = jnp.where(x > span, 2.0 * span - x, x) + lo
    return jnp.clip(x, 0.0, size - 1)


def grid_sample_2d(
    v: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Bilinear 2D grid sample, torch conventions, NHWC.

    Args:
      v: [B, H, W, C]; coords: [B, Ho, Wo, 2] with (x, y) in [-1, 1].
      padding_mode: 'border' | 'reflection' | 'zeros'.
    """
    b, h, w, c = v.shape
    _, ho, wo, _ = coords.shape
    coords = coords.astype(jnp.float32)
    x, y = coords[..., 0], coords[..., 1]

    def unnormalize(t, size):
        if align_corners:
            return (t + 1.0) * 0.5 * (size - 1)
        return ((t + 1.0) * size - 1.0) * 0.5

    xp = unnormalize(x, w)
    yp = unnormalize(y, h)
    if padding_mode == "reflection":
        xp = _reflect_coords(xp, w)
        yp = _reflect_coords(yp, h)
    elif padding_mode == "border":
        xp = jnp.clip(xp, 0.0, w - 1)
        yp = jnp.clip(yp, 0.0, h - 1)

    x0 = jnp.floor(xp)
    y0 = jnp.floor(yp)
    tx = xp - x0
    ty = yp - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v_flat = v.reshape(b, h * w, c)
    n_out = ho * wo
    out = jnp.zeros((b, n_out, c), jnp.float32)
    for yi, wy in ((y0i, 1.0 - ty), (y0i + 1, ty)):
        for xi, wx in ((x0i, 1.0 - tx), (x0i + 1, tx)):
            weight = (wy * wx).reshape(b, n_out, 1)
            if padding_mode == "zeros":
                valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
                weight = weight * valid.reshape(b, n_out, 1)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            idx = (yc * w + xc).reshape(b, n_out)
            vals = jnp.take_along_axis(v_flat, idx[..., None], axis=1)
            out = out + weight * vals.astype(jnp.float32)
    return out.reshape(b, ho, wo, c).astype(v.dtype)


def apply_warping_field(
    v: jnp.ndarray,
    flow: jnp.ndarray,
    normalize_mode: str = "reference",
) -> jnp.ndarray:
    """Warp a feature volume by a 3D flow field (reference model.py:1028-1065).

    Args:
      v: feature volume [B, D, H, W, C] (reference uses D=16, H=W=64, C=96).
      flow: flow field [B, Df, Hf, Wf, 3] channels-last, (x,y,z) components
        (the reference carries [B, 3, D, H, W]).
      normalize_mode: 'reference' replicates the reference renormalization
        ``2*(grid+flow)/[W-1,H-1,D-1] - 1`` exactly (required for parity with
        trained PyTorch checkpoints); 'standard' samples at grid+flow
        directly (the textbook semantics).

    Returns:
      warped volume [B, D, H, W, C].
    """
    b, d, h, w, c = v.shape
    # Trilinear resize flow to the volume dims, align_corners=True
    # (model.py:1036).
    flow = linear_resize(flow, (d, h, w), axes=(1, 2, 3), align_corners=True)
    grid = jnp.asarray(_identity_grid(d, h, w))[None]
    warped = grid + flow.astype(jnp.float32)
    if normalize_mode == "reference":
        norm = jnp.asarray([w - 1, h - 1, d - 1], dtype=jnp.float32)
        warped = 2.0 * warped / norm - 1.0
    elif normalize_mode != "standard":
        raise ValueError(f"unknown normalize_mode: {normalize_mode}")
    return grid_sample_3d(v, warped, align_corners=True)
