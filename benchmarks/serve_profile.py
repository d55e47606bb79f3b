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


def slope_time(fn, make_input, k_small=2, k_large=14, reps=3, bound=()):
    """Device time per fn application (slope method, see bench.py).

    ``bound`` holds any weights/state pytrees ``fn`` needs: they are passed
    through jit as ARGUMENTS (fn receives them first, then the per-step
    input). Closing over them instead would inline them as HLO constants —
    the compile request then carries the full weight set as literals and
    the remote compile service dies on it (broken pipe).
    """

    def chained(k):
        xs = make_input(k)

        @jax.jit
        def run(bound, xs):
            def body(carry, x):
                out = fn(*bound, jax.tree_util.tree_map(
                    lambda a: a + carry.astype(a.dtype) * 1e-6, x))
                flat = jax.tree_util.tree_leaves(out)
                acc = sum(jnp.mean(o).astype(jnp.float32) for o in flat)
                return acc, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return acc

        float(run(bound, xs))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run(bound, xs))
        return (time.perf_counter() - t0) / reps

    t1, t2 = chained(k_small), chained(k_large)
    return max((t2 - t1) / (k_large - k_small), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--skip-segments", action="store_true")
    ap.add_argument("--skip-whole", action="store_true")
    ap.add_argument(
        "--g2d-sweep", action="store_true",
        help="G2d-only batch sweep (1,2,4,8): effective TFLOP/s per batch "
             "— isolates how much of the b1 gap is MXU batch utilization")
    args = ap.parse_args()
    size = args.size

    from megaportraits_tpu.models.gbase import Gbase

    model = Gbase(policy=P)
    rng = jax.random.PRNGKey(0)
    xs = jax.random.uniform(rng, (1, size, size, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(rng, xs, xs)
    print("init done", flush=True)

    rows = []

    if args.g2d_sweep:
        g2d_batch_sweep(model, variables, xs, size, rows)
        print_table(rows)
        return

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

        def drive(v, st, xd):
            return model.apply(v, st, xd, method=Gbase.drive)

        t = slope_time(
            drive,
            lambda k, _b=b: jax.random.uniform(
                jax.random.PRNGKey(1), (k, _b, size, size, 3), jnp.bfloat16),
            bound=(variables, state),
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


def g2d_batch_sweep(model, variables, xs, size, rows):
    """Time G2d alone at batch 1/2/4/8 and report effective TFLOP/s.

    G2d is ~543 GFLOP at 512^2 output (SURVEY.md: 8x ResBlock2D-512 @64^2
    + 3 upsample stages). If the per-sample time drops with batch, the b1
    residual over the conv ceiling is MXU batch-utilization — recoverable
    by multi-stream serving — rather than a fixable graph problem.
    """
    from megaportraits_tpu.models.gbase import Gbase

    gflop = 543.0 * (size / 512) ** 2
    v = jax.jit(
        lambda v, x: model.apply(v, x, method=Gbase.encode_source)
    )(variables, xs)["vc2d"]
    projected1 = jnp.sum(v, axis=1)

    for b in (1, 2, 4, 8):
        proj = jnp.tile(projected1, (b, 1, 1, 1))

        def seg_g2d(v, p_in):
            return model.apply(v, p_in, method=lambda m, x: m.g2d(x, False))

        t = slope_time(
            seg_g2d,
            lambda k, _p=proj: jnp.tile(_p[None], (k, 1, 1, 1, 1)),
            k_small=2, k_large=14, bound=(variables,),
        )
        tf_s = gflop * b / t / 1e3
        rows.append((f"G2d batch {b}", t * 1e3,
                     f"{t / b * 1e3:.2f} ms/sample, {tf_s:.0f} TFLOP/s"))
        print(rows[-1], flush=True)


def profile_segments(model, variables, xs, size, rows):
    from megaportraits_tpu.models.gbase import Gbase

    state1 = jax.jit(
        lambda v, x: model.apply(v, x, method=Gbase.encode_source)
    )(variables, xs)

    def seg_motion(v, xd):
        return model.apply(v, xd, method=Gbase.encode_motion)

    t_motion = slope_time(
        seg_motion,
        lambda k: jax.random.uniform(
            jax.random.PRNGKey(1), (k, 1, size, size, 3), jnp.bfloat16),
        k_small=2, k_large=26, bound=(variables,),
    )
    rows.append(("Emtn (motion encode @224/256 inputs)", t_motion * 1e3, ""))
    print(rows[-1], flush=True)

    rd, td, zd = jax.jit(
        lambda v, x: model.apply(v, x, method=Gbase.encode_motion)
    )(variables, xs)

    def seg_warpgen(v, rtes, z):
        r, t, es = rtes
        return model.apply(
            v, r, t, z, es,
            method=lambda m, r, t, z, e: m.warp_generator_c2d(r, t, z, e),
        )

    t_wg = slope_time(
        seg_warpgen,
        lambda k: jax.random.normal(
            jax.random.PRNGKey(2), (k, 1, 512), jnp.float32),
        bound=(variables, (rd, td, state1["es"])),
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

    def seg_warp(vol, w):
        return apply_warping_field(vol, w, "reference")

    t_warp = slope_time(
        seg_warp,
        lambda k: jnp.tile(w_c2d[None], (k, 1, 1, 1, 1, 1)),
        bound=(state1["vc2d"],),
    )
    rows.append(("apply_warping_field (trilinear gather)", t_warp * 1e3,
                 "memory/gather-bound"))
    print(rows[-1], flush=True)

    vc2d_w = jax.jit(lambda v, w: apply_warping_field(v, w, "reference"))(
        state1["vc2d"], w_c2d)
    projected = jnp.sum(vc2d_w, axis=1)

    def seg_g2d(v, p_in):
        return model.apply(v, p_in, method=lambda m, x: m.g2d(x, False))

    t_g2d = slope_time(
        seg_g2d, lambda k: jnp.tile(projected[None], (k, 1, 1, 1, 1)),
        bound=(variables,),
    )
    rows.append(("G2d (projection decoder)", t_g2d * 1e3,
                 "543 GFLOP; ceiling ~3.9 ms @139TF/s b8-conv-rate"))
    print(rows[-1], flush=True)

    total_segments = (t_motion + t_wg + t_warp + t_g2d) * 1e3
    rows.append(("segment sum (b1)", total_segments, "vs drive total"))
    print(rows[-1], flush=True)


if __name__ == "__main__":
    main()
