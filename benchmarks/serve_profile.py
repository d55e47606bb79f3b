"""Per-segment serving profile of the 512^2 drive path (VERDICT r2 item 5).

Breaks the streaming drive path (Gbase.drive: Emtn -> WarpGenerator C2D ->
apply_warping_field -> projection+G2d) into separately-timed segments and
compares each against its roofline, plus batch-N aggregate throughput —
either a faster serving number or proof each remaining ms is at its
ceiling.

Usage: python benchmarks/serve_profile.py [--size 512] [--batches 1 2 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import DEFAULT_POLICY as P


def slope_time(fn, make_input, k_small=2, k_large=14, reps=3):
    """Device time per fn application (slope method, see bench.py)."""

    def chained(k):
        xs = make_input(k)

        @jax.jit
        def run(xs):
            def body(carry, x):
                out = fn(jax.tree_util.tree_map(
                    lambda a: a + carry.astype(a.dtype) * 1e-6, x))
                flat = jax.tree_util.tree_leaves(out)
                acc = sum(jnp.mean(o).astype(jnp.float32) for o in flat)
                return acc, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return acc

        float(run(xs))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run(xs))
        return (time.perf_counter() - t0) / reps

    t1, t2 = chained(k_small), chained(k_large)
    return max((t2 - t1) / (k_large - k_small), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--skip-segments", action="store_true")
    ap.add_argument("--skip-whole", action="store_true")
    args = ap.parse_args()
    size = args.size

    from megaportraits_tpu.models.gbase import Gbase

    model = Gbase(policy=P)
    rng = jax.random.PRNGKey(0)
    xs = jax.random.uniform(rng, (1, size, size, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(rng, xs, xs)
    print("init done", flush=True)

    rows = []

    # Segments FIRST (small graphs, fast compiles through the remote
    # service); the big whole-drive chains go last so a timeout still
    # leaves the per-segment table.
    if not args.skip_segments:
        profile_segments(model, variables, xs, size, rows)

    # --- whole drive at each batch size --------------------------------
    for b in ([] if args.skip_whole else args.batches):
        xb = jnp.tile(xs, (b, 1, 1, 1))
        state = jax.jit(
            lambda v, x: model.apply(v, x, method=Gbase.encode_source)
        )(variables, xb)

        def drive(xd, _state=state):
            return model.apply(variables, _state, xd, method=Gbase.drive)

        t = slope_time(
            drive,
            lambda k, _b=b: jax.random.uniform(
                jax.random.PRNGKey(1), (k, _b, size, size, 3), jnp.bfloat16),
            k_small=1, k_large=5,
        )
        rows.append((f"drive total (batch {b})", t * 1e3,
                     f"{b / t:.1f} fps aggregate"))
        print(rows[-1], flush=True)

    print_table(rows)


def print_table(rows):
    print("\n| segment | ms | note |")
    print("|---|---|---|")
    for name, ms, note in rows:
        print(f"| {name} | {ms:.2f} | {note} |")


def profile_segments(model, variables, xs, size, rows):
    from megaportraits_tpu.models.gbase import Gbase

    state1 = jax.jit(
        lambda v, x: model.apply(v, x, method=Gbase.encode_source)
    )(variables, xs)

    def seg_motion(xd):
        return model.apply(variables, xd, method=Gbase.encode_motion)

    t_motion = slope_time(
        seg_motion,
        lambda k: jax.random.uniform(
            jax.random.PRNGKey(1), (k, 1, size, size, 3), jnp.bfloat16),
    )
    rows.append(("Emtn (motion encode @224/256 inputs)", t_motion * 1e3, ""))
    print(rows[-1], flush=True)

    rd, td, zd = jax.jit(
        lambda v, x: model.apply(v, x, method=Gbase.encode_motion)
    )(variables, xs)

    def seg_warpgen(z):
        return model.apply(
            variables, rd, td, z, state1["es"],
            method=lambda m, r, t, z, e: m.warp_generator_c2d(r, t, z, e),
        )

    t_wg = slope_time(
        seg_warpgen,
        lambda k: jax.random.normal(
            jax.random.PRNGKey(2), (k, 1, 512), jnp.float32),
    )
    rows.append(("WarpGenerator C2D (FlowField + rt grid)", t_wg * 1e3, ""))
    print(rows[-1], flush=True)

    w_c2d = jax.jit(
        lambda v, z: model.apply(
            v, rd, td, z, state1["es"],
            method=lambda m, r, t, z, e: m.warp_generator_c2d(r, t, z, e),
        )
    )(variables, zd)

    from megaportraits_tpu.ops.warp import apply_warping_field

    def seg_warp(w):
        return apply_warping_field(state1["vc2d"], w, "reference")

    t_warp = slope_time(
        seg_warp,
        lambda k: jnp.tile(w_c2d[None], (k, 1, 1, 1, 1, 1)),
    )
    rows.append(("apply_warping_field (trilinear gather)", t_warp * 1e3,
                 "memory/gather-bound"))
    print(rows[-1], flush=True)

    vc2d_w = jax.jit(lambda v, w: apply_warping_field(v, w, "reference"))(
        state1["vc2d"], w_c2d)
    projected = jnp.sum(vc2d_w, axis=1)

    def seg_g2d(p_in):
        return model.apply(
            variables, p_in, method=lambda m, x: m.g2d(x, False)
        )

    t_g2d = slope_time(
        seg_g2d, lambda k: jnp.tile(projected[None], (k, 1, 1, 1, 1)),
    )
    rows.append(("G2d (projection decoder)", t_g2d * 1e3,
                 "543 GFLOP; ceiling ~3.9 ms @139TF/s b8-conv-rate"))
    print(rows[-1], flush=True)

    total_segments = (t_motion + t_wg + t_warp + t_g2d) * 1e3
    rows.append(("segment sum (b1)", total_segments, "vs drive total"))
    print_table(rows)


if __name__ == "__main__":
    main()
