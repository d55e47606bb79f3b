"""Resize / pooling primitives with exact PyTorch semantics, TPU-first.

The reference leans on torch ``F.interpolate`` (bilinear/trilinear/nearest,
both align_corners conventions — e.g. reference model.py:971,1036,1019) and
``F.avg_pool``. There is no JAX builtin with torch's exact corner conventions,
so we build them from scratch — and we do it the TPU way: 1-D linear
interpolation along an axis is a contraction with a *static* [out, in]
interpolation matrix, so every resize lowers to dense matmuls on the MXU
instead of gathers. The matrices are computed at trace time from static
shapes and folded into the compiled program as constants.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1-D interpolation matrices (torch-exact source-index math)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _linear_interp_matrix(
    in_size: int, out_size: int, align_corners: bool
) -> np.ndarray:
    """[out_size, in_size] matrix M with (M @ x) == torch linear resize of x.

    torch semantics (aten/native UpSample.h):
      align_corners=True : src = i * (in-1)/(out-1)
      align_corners=False: src = (i + 0.5) * in/out - 0.5, negatives clamp to 0
    then idx0 = floor(src), idx1 = min(idx0+1, in-1), lam = src - idx0.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            if src < 0.0:
                src = 0.0
        idx0 = int(np.floor(src))
        idx0 = min(idx0, in_size - 1)
        idx1 = min(idx0 + 1, in_size - 1)
        lam = src - idx0
        m[i, idx0] += 1.0 - lam
        m[i, idx1] += lam
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' (legacy) source indices: src = floor(i * in/out)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def _contract_axis(x: jnp.ndarray, m: np.ndarray, axis: int) -> jnp.ndarray:
    """Apply [out,in] matrix along `axis` of x via tensordot (MXU matmul).

    bf16 inputs keep bf16 storage between axes (halves HBM traffic — the
    G2d upsample chain is bandwidth-bound) with f32 accumulation inside the
    matmul; f32 inputs keep the exact float32/HIGHEST parity path.
    """
    lowp = x.dtype == jnp.bfloat16
    mat = jnp.asarray(m, dtype=x.dtype if lowp else jnp.float32)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum(
        "...i,oi->...o",
        moved,
        mat,
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if lowp
                   else jax.lax.Precision.HIGHEST),
    ).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def linear_resize(
    x: jnp.ndarray,
    out_sizes: Sequence[int],
    axes: Sequence[int],
    align_corners: bool,
) -> jnp.ndarray:
    """Separable multi-linear resize with torch bilinear/trilinear semantics.

    Equivalent of torch ``F.interpolate(x, size=..., mode='bilinear'|
    'trilinear', align_corners=...)`` over the given spatial `axes`.
    Output dtype matches input dtype; float32 inputs interpolate exactly in
    float32 (torch parity), bfloat16 inputs stay bfloat16 end-to-end.
    """
    orig_dtype = x.dtype
    out = x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32)
    for size, axis in zip(out_sizes, axes):
        in_size = out.shape[axis]
        if in_size == size:
            continue
        m = _linear_interp_matrix(in_size, size, align_corners)
        out = _contract_axis(out, m, axis)
    return out.astype(orig_dtype)


def nearest_resize(
    x: jnp.ndarray, out_sizes: Sequence[int], axes: Sequence[int]
) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')`` over the given axes."""
    out = x
    for size, axis in zip(out_sizes, axes):
        in_size = out.shape[axis]
        if in_size == size:
            continue
        if size % in_size == 0:
            # Integer upsample fast path — pure reshape/broadcast, no gather.
            out = jnp.repeat(out, size // in_size, axis=axis)
        else:
            idx = jnp.asarray(_nearest_index(in_size, size))
            out = jnp.take(out, idx, axis=axis)
    return out


def upsample_nearest(
    x: jnp.ndarray, scale_factors: Sequence[int], axes: Sequence[int]
) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=...)`` (default mode='nearest')."""
    sizes = [x.shape[a] * s for a, s in zip(axes, scale_factors)]
    return nearest_resize(x, sizes, axes)


def avg_pool_2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """AvgPool2d over NHWC, matching torch nn.AvgPool2d(k, s) (no padding)."""
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    ) / float(window * window)


def avg_pool_3d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """AvgPool3d over NDHWC, matching torch nn.AvgPool3d(k, s)."""
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, window, 1),
        (1, stride, stride, stride, 1),
        "VALID",
    ) / float(window**3)


@functools.lru_cache(maxsize=None)
def gaussian_kernel_2d(scale: float) -> Tuple[np.ndarray, int, int]:
    """Gaussian kernel for band-limited downsampling.

    Mirrors the construction in reference model.py:646-681
    (AntiAliasInterpolation2d): sigma = (1/scale - 1)/2,
    kernel_size = 2*round(sigma*4)+1, separable product-of-gaussians,
    normalized to sum 1. Returns (kernel[k,k], pad_a, pad_b).
    """
    sigma = (1.0 / scale - 1.0) / 2.0
    ksize = 2 * round(sigma * 4) + 1
    ka = ksize // 2
    kb = ka - 1 if ksize % 2 == 0 else ka
    grid = np.arange(ksize, dtype=np.float64)
    mean = (ksize - 1) / 2.0
    g1 = np.exp(-((grid - mean) ** 2) / (2.0 * sigma**2))
    kernel = np.outer(g1, g1)
    kernel = kernel / kernel.sum()
    return kernel.astype(np.float32), ka, kb


def image_pyramid(x: jnp.ndarray, scales: Sequence[float] = (0.5, 0.25)):
    """Anti-aliased image pyramid (reference ImagePyramide, model.py:1070-1085).

    Returns {str(scale): band-limited downsample} over NHWC images.
    """
    return {str(s): anti_alias_downsample(x, s) for s in scales}


def anti_alias_downsample(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Band-limited downsample of NHWC images (ImagePyramide building block).

    Matches reference AntiAliasInterpolation2d.forward (model.py:683-691):
    zero-pad, depthwise gaussian blur, then nearest interpolate by `scale`.
    The depthwise conv is expressed with feature_group_count so XLA maps it
    onto the MXU/VPU without materializing per-channel loops.
    """
    if scale == 1.0:
        return x
    kernel, ka, kb = gaussian_kernel_2d(scale)
    c = x.shape[-1]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (ka, kb), (ka, kb), (0, 0)))
    # Depthwise conv: HWIO kernel with I=1, O=C, feature_group_count=C.
    k = jnp.asarray(kernel)[:, :, None, None] * jnp.ones((1, 1, 1, c), jnp.float32)
    out = jax.lax.conv_general_dilated(
        xf,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    h, w = out.shape[1], out.shape[2]
    out = nearest_resize(out, [int(h * scale), int(w * scale)], axes=[1, 2])
    return out.astype(orig_dtype)
