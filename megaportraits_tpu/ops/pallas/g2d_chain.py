"""Whole-chain fused ResBlock2D kernel: N blocks in ONE pallas_call.

The per-conv fused kernel (conv2d.py) beats XLA 1.85x standalone but loses
embedded because every pallas_call is a fusion/overlap boundary (16 per
G2d trunk). This kernel runs the ENTIRE 8-block 64x64x512 trunk in a single
call: grid over blocks, activations ping-pong in VMEM scratch and never
touch HBM between blocks, per-conv weights hand-DMA'd HBM->VMEM with
double buffering (the automatic pipeline's whole-block weight buffers blow
the ~22MB working budget this toolchain allows).

Per block: h = relu(bn1(conv1(x))); x = relu(bn2(conv2(h)) + x), with the
eval-mode BN folded into per-conv scale/shift. Convs are the 9-shifted-
matmul form of conv2d.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_from(src_ref, w_ref, y0, y_tile, x_size, c):
    """3x3 SAME conv of one y-tile; w_ref [9, C, C] in VMEM."""
    acc = jnp.zeros((y_tile * x_size, c), jnp.float32)
    zcol = jnp.zeros((y_tile, 1, c), src_ref.dtype)
    for dy in range(3):
        rows = src_ref[pl.ds(y0 + dy, y_tile), :, :]
        for dx in range(3):
            if dx == 1:
                shifted = rows
            elif dx == 0:
                shifted = jnp.concatenate(
                    [zcol, rows[:, : x_size - 1, :]], axis=1
                )
            else:
                shifted = jnp.concatenate([rows[:, 1:, :], zcol], axis=1)
            acc += jnp.dot(shifted.reshape(y_tile * x_size, c),
                           w_ref[dy * 3 + dx, :, :],
                           preferred_element_type=jnp.float32)
    return acc.reshape(y_tile, x_size, c)


def _kernel(x_hbm, w_hbm, scale_ref, shift_ref, o_hbm,
            a_ref, b_ref, w0_ref, w1_ref, sems, *,
            h: int, x_size: int, c: int, y_tile: int, n_blocks: int):
    blk = pl.program_id(0)
    n_tiles = h // y_tile

    def w_dma(slot_ref, sem_idx, block_idx, conv_idx):
        return pltpu.make_async_copy(
            w_hbm.at[block_idx, pl.ds(conv_idx * 9, 9)],
            slot_ref,
            sems.at[sem_idx],
        )

    # First grid step: input HBM -> A scratch (+ zero halo rows), and kick
    # off this block's conv1 weights.
    @pl.when(blk == 0)
    def _():
        a_ref[0, :, :] = jnp.zeros((x_size, c), a_ref.dtype)
        a_ref[h + 1, :, :] = jnp.zeros((x_size, c), a_ref.dtype)
        b_ref[0, :, :] = jnp.zeros((x_size, c), b_ref.dtype)
        b_ref[h + 1, :, :] = jnp.zeros((x_size, c), b_ref.dtype)
        in_dma = pltpu.make_async_copy(
            x_hbm, a_ref.at[pl.ds(1, h)], sems.at[2]
        )
        in_dma.start()
        w_dma(w0_ref, 0, 0, 0).start()
        in_dma.wait()

    # conv1 weights were prefetched (by blk-1's epilogue, or above for blk 0)
    w_dma(w0_ref, 0, blk, 0).wait()
    # prefetch conv2 weights while conv1 computes
    w_dma(w1_ref, 1, blk, 1).start()

    def conv1_body(t, _):
        y0 = t * y_tile
        out = _conv_from(a_ref, w0_ref, y0, y_tile, x_size, c)
        out = out * scale_ref[0, 0, :].astype(jnp.float32) \
            + shift_ref[0, 0, :].astype(jnp.float32)
        b_ref[pl.ds(1 + y0, y_tile), :, :] = jnp.maximum(
            out, 0.0
        ).astype(b_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, conv1_body, 0)

    w_dma(w1_ref, 1, blk, 1).wait()

    # prefetch NEXT block's conv1 weights while conv2 computes
    @pl.when(blk + 1 < n_blocks)
    def _():
        w_dma(w0_ref, 0, blk + 1, 0).start()

    def conv2_body(t, _):
        y0 = t * y_tile
        out = _conv_from(b_ref, w1_ref, y0, y_tile, x_size, c)
        out = out * scale_ref[0, 1, :].astype(jnp.float32) \
            + shift_ref[0, 1, :].astype(jnp.float32)
        res = a_ref[pl.ds(1 + y0, y_tile), :, :].astype(jnp.float32)
        a_ref[pl.ds(1 + y0, y_tile), :, :] = jnp.maximum(
            out + res, 0.0
        ).astype(a_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, conv2_body, 0)

    @pl.when(blk == n_blocks - 1)
    def _():
        out_dma = pltpu.make_async_copy(
            a_ref.at[pl.ds(1, h)], o_hbm, sems.at[2]
        )
        out_dma.start()
        out_dma.wait()


@functools.partial(jax.jit, static_argnames=("y_tile",))
def fused_resblock_chain(
    x: jnp.ndarray,        # [H, X, C] bf16
    weights: jnp.ndarray,  # [N, 2, 3, 3, C, C]
    scales: jnp.ndarray,   # [N, 2, C] f32 (BN folded)
    shifts: jnp.ndarray,   # [N, 2, C] f32
    y_tile: int = 8,
) -> jnp.ndarray:
    h, x_size, c = x.shape
    n_blocks = weights.shape[0]
    assert h % y_tile == 0
    weights = weights.reshape(n_blocks, 18, c, c)

    kernel = functools.partial(
        _kernel, h=h, x_size=x_size, c=c, y_tile=y_tile, n_blocks=n_blocks,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, x_size, c), x.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # weights stay in HBM
            pl.BlockSpec((1, 2, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((h + 2, x_size, c), x.dtype),  # A (padded)
            pltpu.VMEM((h + 2, x_size, c), x.dtype),  # B (padded)
            pltpu.VMEM((9, c, c), weights.dtype),     # conv1 weights
            pltpu.VMEM((9, c, c), weights.dtype),     # conv2 weights
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x, weights, scales, shifts)
