"""Pallas fused 3x3 SAME conv (+ scale/shift + ReLU + residual) for TPU.

Targets the G2d hot path: stride-1 3x3 convs over [1, 64, 64, 512] bf16
(8x ResBlock2D-512, ~64% of streaming reenactment time). The kernel holds
the zero-padded input volume in VMEM and computes the conv as 9 shifted
[Yt*X, C] @ [C, F] MXU matmuls — y-shifts are outer-dim slices, x-shifts are
sublane rolls with static boundary masks — accumulating in f32 and fusing
the BatchNorm-style scale/shift, ReLU and residual add into the epilogue.

Constraints: H*W*C must fit VMEM (true for the 64x64x512 target), C and F
multiples of 128, X a multiple of the sublane tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, shift_ref, res_ref, o_ref, *,
            y_tile: int, x_size: int, relu: bool, has_residual: bool):
    i = pl.program_id(0)
    y0 = i * y_tile  # position in the PADDED input (pad=1 top)

    c = x_ref.shape[-1]
    f = o_ref.shape[-1]
    acc = jnp.zeros((y_tile * x_size, f), jnp.float32)

    zcol = jnp.zeros((y_tile, 1, c), x_ref.dtype)
    for dy in range(3):
        rows = x_ref[pl.ds(y0 + dy, y_tile), :, :]  # [Yt, X, C]
        for dx in range(3):
            if dx == 1:
                shifted = rows
            elif dx == 0:
                # left neighbor: shift right by one x, zero-fill x=0
                shifted = jnp.concatenate(
                    [zcol, rows[:, : x_size - 1, :]], axis=1
                )
            else:
                # right neighbor: shift left by one x, zero-fill x=X-1
                shifted = jnp.concatenate([rows[:, 1:, :], zcol], axis=1)
            flat = shifted.reshape(y_tile * x_size, c)
            acc += jnp.dot(flat, w_ref[dy, dx, :, :],
                           preferred_element_type=jnp.float32)

    acc = acc.reshape(y_tile, x_size, f)
    acc = acc * scale_ref[:].astype(jnp.float32) \
        + shift_ref[:].astype(jnp.float32)
    if has_residual:
        acc = acc + res_ref[pl.ds(y0, y_tile), :, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[pl.ds(y0, y_tile), :, :] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "y_tile")
)
def fused_conv3x3(
    x: jnp.ndarray,              # [H, W, C] bf16
    w: jnp.ndarray,              # [3, 3, C, F]
    scale: jnp.ndarray,          # [F] fused BN scale (or ones)
    shift: jnp.ndarray,          # [F] fused BN shift + conv bias (or zeros)
    residual: Optional[jnp.ndarray] = None,  # [H, W, F]
    relu: bool = True,
    y_tile: int = 8,
) -> jnp.ndarray:
    h, x_size, c = x.shape
    f = w.shape[-1]
    assert h % y_tile == 0
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))  # y zero-pad only

    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((1, 1, f), x.dtype)

    kernel = functools.partial(
        _kernel, y_tile=y_tile, x_size=x_size, relu=relu,
        has_residual=has_residual,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, x_size, f), x.dtype),
        grid=(h // y_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # padded input, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift
            pl.BlockSpec(memory_space=pltpu.VMEM),  # residual
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xp, w, scale, shift, res)
