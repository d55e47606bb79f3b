"""Whole-chain fused ResBlock2D kernel, v2 — under the Mosaic scratch bug.

v1 (g2d_chain.py) is numerically correct but crashes the remote Mosaic
compiler at C=512: the bisect (ops/pallas/README.md) shows ANY MXU dot plus
>~8 MB of VMEM scratch kills it, and v1's A/B activation ping-pong alone is
8.6 MB. v2 restructures to fit under the threshold:

  * ONE persistent activation buffer A [(H+4), X, C] (4.5 MB at 64x64x512
    bf16, 2 zero halo rows top+bottom), updated IN PLACE per block. The
    write order makes this legal: h-strip t+1 is computed BEFORE out-strip
    t overwrites its rows, so every conv1 read happens before overwrite.
  * conv1 outputs live only as two small overlapping STRIP buffers of
    (y_tile+2) rows (line-buffer trick): each out-strip's conv2 needs
    h rows [t*yt-1, (t+1)*yt], so conv1 recomputes the 2 boundary rows per
    strip (~2/y_tile extra conv1 FLOPs) instead of keeping the whole h
    plane resident.
  * per-TAP weight slices [C, C] (0.5 MB bf16) are hand-DMA'd HBM->VMEM
    through two ping-pong slots with a static wait/use/start-next-same-slot
    schedule — weight VMEM never exceeds 1 MB, at the cost of re-streaming
    the 4.7 MB of per-conv weights once per strip (~600 MB of extra HBM
    reads for the whole 8-block trunk, hidden under MXU compute by the
    double buffering).

Scratch at C=512, y_tile=8: 4.5 (A) + 2x0.66 (h strips) + 2x0.5 (w)
= ~6.8 MB < 8 MB.

Numerics match v1/XLA: bf16 storage, f32 accumulation, BN folded into
per-conv scale/shift, zero SAME padding for both convs (conv2 pads h with
zeros — NOT conv1-of-padded-x — hence the explicit zeroing of the first/
last halo rows of the first/last strips).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_hbm, scale_ref, shift_ref, o_hbm,
            a_ref, h0_ref, h1_ref, w0_ref, w1_ref, sems, *,
            h: int, x_size: int, c: int, y_tile: int, n_blocks: int):
    blk = pl.program_id(0)
    n_strips = h // y_tile
    hs = y_tile + 2  # h-strip rows incl. conv2 halo
    wslots = (w0_ref, w1_ref)

    # ---- weight streaming -------------------------------------------------
    # Per-block flat schedule of (conv, tap) uses:
    #   prologue: conv1 taps 0..8          (for h strip 0)
    #   body t (T times): conv1 taps 0..8  (for h strip t+1; dummy at t=T-1)
    #                     conv2 taps 0..8  (for out strip t)
    # Slot = parity of the flat position; every use site does
    # wait(slot) -> dot -> start DMA for the next use of the SAME slot
    # (statically position+2, which is the same (conv, tap+2) except at
    # chunk edges — see call sites).

    def w_start(slot, b_idx, conv_idx, tap):
        pltpu.make_async_copy(
            w_hbm.at[b_idx, conv_idx, tap], wslots[slot], sems.at[slot]
        ).start()

    def w_wait(slot):
        pltpu.make_async_copy(
            w_hbm.at[0, 0, 0], wslots[slot], sems.at[slot]
        ).wait()

    @pl.when(blk == 0)
    def _():
        # Zero halos (2 rows top and bottom) + input DMA.
        a_ref[0, :, :] = jnp.zeros((x_size, c), a_ref.dtype)
        a_ref[1, :, :] = jnp.zeros((x_size, c), a_ref.dtype)
        a_ref[h + 2, :, :] = jnp.zeros((x_size, c), a_ref.dtype)
        a_ref[h + 3, :, :] = jnp.zeros((x_size, c), a_ref.dtype)
        in_dma = pltpu.make_async_copy(x_hbm, a_ref.at[pl.ds(2, h)],
                                       sems.at[2])
        in_dma.start()
        # Prime the first two weight slots (later blocks are primed by the
        # previous block's final starts). Prologue tap k sits at flat
        # position 9+k, so tap 0 -> slot 1, tap 1 -> slot 0.
        w_start(1, 0, 0, 0)
        w_start(0, 0, 0, 1)
        in_dma.wait()

    scale1 = scale_ref[0, 0, :].astype(jnp.float32)
    shift1 = shift_ref[0, 0, :].astype(jnp.float32)
    scale2 = scale_ref[0, 1, :].astype(jnp.float32)
    shift2 = shift_ref[0, 1, :].astype(jnp.float32)
    def conv_strip(src_ref, base, rows, conv_idx, pos0, next_starts):
        """9-tap shifted-matmul conv of `rows` rows starting at `base` of
        src_ref; streams weights. pos0: flat position of tap 0 (parity
        picks the slot). next_starts[tap] = (b_idx, conv_idx, tap) to
        start after using this tap's slot, or None."""
        acc = jnp.zeros((rows * x_size, c), jnp.float32)
        zc = jnp.zeros((rows, 1, c), src_ref.dtype)
        for tap in range(9):
            dy, dx = tap // 3, tap % 3
            r = src_ref[pl.ds(base + dy, rows), :, :]
            if dx == 1:
                shifted = r
            elif dx == 0:
                shifted = jnp.concatenate([zc, r[:, : x_size - 1, :]],
                                          axis=1)
            else:
                shifted = jnp.concatenate([r[:, 1:, :], zc], axis=1)
            slot = (pos0 + tap) % 2
            w_wait(slot)
            acc += jnp.dot(shifted.reshape(rows * x_size, c),
                           wslots[slot][...],
                           preferred_element_type=jnp.float32)
            nxt = next_starts[tap]
            if nxt is not None:
                b_idx, nconv, ntap, guard = nxt
                if guard is None:
                    w_start(slot, b_idx, nconv, ntap)
                else:
                    @pl.when(guard)
                    def _():
                        w_start(slot, b_idx, nconv, ntap)
        return acc.reshape(rows, x_size, c)

    # ---- prologue: h strip 0 ---------------------------------------------
    # Flat positions: prologue tap k at 9+k (slots [1,0,1,0,1,0,1,0,1]);
    # body conv1 tap j ALSO at parity (9+j)%2 — the odd-length prologue
    # makes p8 (slot 1) and body-b0 (slot 1) consecutive same-slot, so
    # p8's start feeds b0 serially (one lost overlap per block, correct
    # semaphore pairing). Next-same-slot chain:
    #   tap k<=6 -> prologue tap k+2; tap 7 (slot 0) -> body conv1 tap 1;
    #   tap 8 (slot 1) -> body conv1 tap 0.
    pro_next = [
        (blk, 0, 2, None), (blk, 0, 3, None), (blk, 0, 4, None),
        (blk, 0, 5, None), (blk, 0, 6, None), (blk, 0, 7, None),
        (blk, 0, 8, None),
        (blk, 0, 1, None),   # tap 7 (slot 0) -> body conv1 tap 1 (slot 0)
        (blk, 0, 0, None),   # tap 8 (slot 1) -> body conv1 tap 0 (slot 1)
    ]
    h_first = conv_strip(a_ref, 0, hs, 0, 9, pro_next)
    h_first = jnp.maximum(h_first * scale1 + shift1, 0.0)
    h0_ref[...] = h_first.astype(h0_ref.dtype)
    h0_ref[0, :, :] = jnp.zeros((x_size, c), h0_ref.dtype)  # h row -1 = 0

    # ---- strip loop --------------------------------------------------------
    # Body flat positions: conv1 tap j at 9+j (slot (9+j)%2 = (j+1)%2),
    # conv2 tap j at 18+j... parity repeats every 18, so conv2 tap j's slot
    # is j%2. Next-same-slot chains:
    #   conv1 tap j (j<=6)  -> conv1 tap j+2
    #   conv1 tap 7         -> conv2 tap 0
    #   conv1 tap 8         -> conv2 tap 1
    #   conv2 tap j (j<=6)  -> conv2 tap j+2
    #   conv2 tap 7/8       -> NEXT iteration's conv1 tap 0/1 (same block),
    #                          or the NEXT BLOCK's prologue tap 0/1 at
    #                          t = T-1 (guarded away on the last block).
    def body(t, _):
        last_strip = t == n_strips - 1
        nb = jnp.where(last_strip, blk + 1, blk)
        c1_next = [
            (blk, 0, 2, None), (blk, 0, 3, None), (blk, 0, 4, None),
            (blk, 0, 5, None), (blk, 0, 6, None), (blk, 0, 7, None),
            (blk, 0, 8, None),
            (blk, 1, 0, None),  # -> conv2 tap 0
            (blk, 1, 1, None),  # -> conv2 tap 1
        ]
        not_done = jnp.logical_or(blk + 1 < n_blocks,
                                  jnp.logical_not(last_strip))
        c2_next = [
            (blk, 1, 2, None), (blk, 1, 3, None), (blk, 1, 4, None),
            (blk, 1, 5, None), (blk, 1, 6, None), (blk, 1, 7, None),
            (blk, 1, 8, None),
            (nb, 0, 0, not_done),  # -> next strip/block conv1 tap 0
            (nb, 0, 1, not_done),  # -> next strip/block conv1 tap 1
        ]

        # conv1 for strip t+1 (dummy compute at t=T-1: weights must still
        # stream for schedule uniformity; result discarded).
        base_next = jnp.where(last_strip, 0, (t + 1) * y_tile)
        hn = conv_strip(a_ref, base_next, hs, 0, 9, c1_next)
        hn = jnp.maximum(hn * scale1 + shift1, 0.0)
        dst = jnp.where((t + 1) % 2 == 0, 0, 1)

        @pl.when(jnp.logical_and(jnp.logical_not(last_strip), dst == 0))
        def _():
            h0_ref[...] = hn.astype(h0_ref.dtype)

        @pl.when(jnp.logical_and(jnp.logical_not(last_strip), dst == 1))
        def _():
            h1_ref[...] = hn.astype(h1_ref.dtype)

        # Zero h row `h` (conv2 SAME padding) when strip t+1 is the last.
        @pl.when(jnp.logical_and(t + 1 == n_strips - 1, dst == 0))
        def _():
            h0_ref[hs - 1, :, :] = jnp.zeros((x_size, c), h0_ref.dtype)

        @pl.when(jnp.logical_and(t + 1 == n_strips - 1, dst == 1))
        def _():
            h1_ref[hs - 1, :, :] = jnp.zeros((x_size, c), h1_ref.dtype)

        # conv2 + residual for strip t, from h strip t (slot t%2).
        def do_conv2(src_ref):
            out = conv_strip(src_ref, 0, y_tile, 1, 18, c2_next)
            out = out * scale2 + shift2
            res = a_ref[pl.ds(2 + t * y_tile, y_tile), :, :] \
                .astype(jnp.float32)
            a_ref[pl.ds(2 + t * y_tile, y_tile), :, :] = jnp.maximum(
                out + res, 0.0
            ).astype(a_ref.dtype)

        # Both branches stream the same weight schedule; only the source
        # strip buffer differs.
        @pl.when(t % 2 == 0)
        def _():
            do_conv2(h0_ref)

        @pl.when(t % 2 == 1)
        def _():
            do_conv2(h1_ref)

        return 0

    jax.lax.fori_loop(0, n_strips, body, 0)

    @pl.when(blk == n_blocks - 1)
    def _():
        out_dma = pltpu.make_async_copy(a_ref.at[pl.ds(2, h)], o_hbm,
                                        sems.at[2])
        out_dma.start()
        out_dma.wait()


@functools.partial(jax.jit, static_argnames=("y_tile", "interpret"))
def fused_resblock_chain_v2(
    x: jnp.ndarray,        # [H, X, C] bf16
    weights: jnp.ndarray,  # [N, 2, 3, 3, C, C] ((dy,dx) taps, Cin, Cout)
    scales: jnp.ndarray,   # [N, 2, C] f32 (BN folded)
    shifts: jnp.ndarray,   # [N, 2, C] f32
    y_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    h, x_size, c = x.shape
    n_blocks = weights.shape[0]
    assert h % y_tile == 0 and h // y_tile >= 2
    weights = weights.reshape(n_blocks, 2, 9, c, c)
    hs = y_tile + 2

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
            pltpu.VMEM((h + 4, x_size, c), x.dtype),   # A (2-row halos)
            pltpu.VMEM((hs, x_size, c), x.dtype),      # h strip ping
            pltpu.VMEM((hs, x_size, c), x.dtype),      # h strip pong
            pltpu.VMEM((c, c), weights.dtype),         # weight slot 0
            pltpu.VMEM((c, c), weights.dtype),         # weight slot 1
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Stack temporaries (f32 strip accumulators, shifted-row
            # concats) push total VMEM past the 16 MB default scoped
            # limit; v5e has headroom.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, weights, scales, shifts)
