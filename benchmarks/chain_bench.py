"""Hardware check + microbench of the whole-chain ResBlock kernel v2.

Usage: python benchmarks/chain_bench.py [--c 512] [--n 8] [--y-tile 8]

1. compiles fused_resblock_chain_v2 at the production shape (the v1 kernel
   crashed the remote Mosaic compiler here — ops/pallas/README.md bisect);
2. checks numerical parity vs the XLA conv chain on device;
3. slope-times kernel vs XLA chain.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def xla_chain(x, w, scales, shifts):
    hcur = x
    n = w.shape[0]
    for b in range(n):
        c1 = jax.lax.conv_general_dilated(
            hcur[None], w[b, 0], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        m = jnp.maximum(
            c1.astype(jnp.float32) * scales[b, 0] + shifts[b, 0], 0.0
        ).astype(x.dtype)
        c2 = jax.lax.conv_general_dilated(
            m[None], w[b, 1], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        hcur = jnp.maximum(
            c2.astype(jnp.float32) * scales[b, 1] + shifts[b, 1]
            + hcur.astype(jnp.float32), 0.0
        ).astype(x.dtype)
    return hcur


def slope_time(fn, args, k_small=4, k_large=24, reps=3):
    def chained(k):
        @jax.jit
        def run(args):
            def body(carry, _):
                out = fn(*((args[0] + carry.astype(args[0].dtype) * 1e-6,)
                           + args[1:]))
                return jnp.mean(out).astype(jnp.float32), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return acc

        float(run(args))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run(args))
        return (time.perf_counter() - t0) / reps

    t1, t2 = chained(k_small), chained(k_large)
    return max((t2 - t1) / (k_large - k_small), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--y-tile", type=int, default=8)
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    from megaportraits_tpu.ops.pallas.g2d_chain_v2 import (
        fused_resblock_chain_v2,
    )

    h = x_size = args.hw
    c, n = args.c, args.n
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (h, x_size, c), jnp.bfloat16)
    # Variance-preserving weight scale (1/sqrt(fan_in)): with exploding
    # activations, bf16 rounding amplifies geometrically over 16 convs and
    # swamps the parity check; BN-folded production scales are ~unit.
    wscale = (9 * c) ** -0.5
    w = (jax.random.normal(jax.random.PRNGKey(1), (n, 2, 3, 3, c, c),
                           jnp.bfloat16) * wscale)
    scales = jax.random.uniform(jax.random.PRNGKey(2), (n, 2, c),
                                jnp.float32, 0.8, 1.2)
    shifts = jax.random.normal(jax.random.PRNGKey(3), (n, 2, c)) * 0.05

    print(f"compiling chain v2 at [{h},{x_size},{c}] x {n} blocks, "
          f"y_tile={args.y_tile} ...")
    t0 = time.perf_counter()
    got = fused_resblock_chain_v2(x, w, scales, shifts, y_tile=args.y_tile)
    got = np.asarray(got, dtype=np.float32)
    print(f"COMPILED + ran in {time.perf_counter() - t0:.1f}s")

    ref = np.asarray(jax.jit(xla_chain)(x, w, scales, shifts),
                     dtype=np.float32)
    err = np.abs(got - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    print(f"parity: max|err|={err:.3e} (rel {rel:.3e})")
    if rel > 2e-2:
        print("PARITY FAIL")
        return 1

    if not args.skip_bench:
        t_pallas = slope_time(
            lambda x_, w_, s_, h_: fused_resblock_chain_v2(
                x_, w_, s_, h_, y_tile=args.y_tile),
            (x, w, scales, shifts))
        t_xla = slope_time(xla_chain, (x, w, scales, shifts))
        flops = n * 2 * 2 * h * x_size * 9 * c * c
        print(f"pallas chain: {t_pallas * 1e3:.3f} ms "
              f"({flops / t_pallas / 1e12:.0f} TF/s)")
        print(f"XLA chain:    {t_xla * 1e3:.3f} ms "
              f"({flops / t_xla / 1e12:.0f} TF/s)")
        print(f"speedup: {t_xla / t_pallas:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
