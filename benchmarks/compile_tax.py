"""Quantify the remote-compile-service workaround tax (VERDICT r2 item 10).

The axon remote compile service crashes on specific large graphs
(SIGKILL/broken pipe after ~20 min): k>=4 scan of the 512 train step, and
fused bf16 GHR/Gbase inference forwards at 128-256px (round-2 bisects,
benchmarks/RESULTS.md). The workarounds — split teacher graphs, k=1 steps,
fp32 teacher — each cost performance. This harness measures the costs that
CAN be measured without re-crashing the service (a crash restarts it and
burns ~20 min, so known-crashing configs are cited, not re-probed):

  * split teacher forward (Gbase graph + Genh graph, 2 device calls) vs
    fused GHR forward at a size where BOTH compile (512 bf16),
  * fp32 vs bf16 teacher forward (split path),
  * k=1 vs k=2 scan of the stage-1 train step @256 (k=4 documented crash
    at 512; k=2 @256 probes the scan-unroll benefit at low risk).

Usage: python benchmarks/compile_tax.py [--skip-scan]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _materialize(out):
    # block_until_ready does NOT wait through the axon tunnel (bench.py
    # methodology note) — force a host readback of one scalar-ish leaf.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.mean(leaf.astype(jnp.float32)))


def timed_compile(label, fn, *args):
    t0 = time.perf_counter()
    _materialize(fn(*args))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _materialize(fn(*args))
    t_run = (time.perf_counter() - t0) / reps
    print(f"{label}: compile+first {t_compile:.1f}s, "
          f"per-call {t_run * 1e3:.1f}ms", flush=True)
    return t_compile, t_run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--skip-scan", action="store_true")
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--only-scan", action="store_true",
                    help="just the k=1 vs k=2 train-step scan probe @256 — "
                         "also discriminates per-call dispatch overhead "
                         "from device time (2 steps in one call)")
    args = ap.parse_args()
    size = args.size

    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
    from megaportraits_tpu.models.genh import GHR
    from megaportraits_tpu.train.train_student import make_teacher_forward

    rows = []
    rng = jax.random.PRNGKey(0)

    policies = () if args.only_scan else (
        (DEFAULT_POLICY, "bf16"), (FP32_POLICY, "fp32"))
    for policy, tag in policies:
        teacher = GHR(policy=policy)
        dt = policy.compute_dtype
        dummy = jnp.zeros((1, size, size, 3), dt)
        t_vars = jax.jit(teacher.init)(rng, dummy, dummy)
        xs = jax.random.uniform(rng, (1, size, size, 3), dt)
        xd = jax.random.uniform(jax.random.PRNGKey(1), (1, size, size, 3), dt)

        split_fwd = make_teacher_forward(teacher, t_vars)
        c, r = timed_compile(f"teacher split {tag} @{size}",
                             split_fwd, xs, xd)
        rows.append((f"teacher forward split {tag} @{size}", c, r))

        if not args.skip_fused and tag == "bf16" and size >= 512:
            # Fused GHR compiles at 512 bf16 (the 128-256px bf16 fused
            # graphs are the documented crashers).
            fused = jax.jit(
                lambda v, a, b: teacher.apply(v, a, b).astype(jnp.float32))
            c, r = timed_compile(f"teacher fused {tag} @{size}",
                                 fused, t_vars, xs, xd)
            rows.append((f"teacher forward fused {tag} @{size}", c, r))

    if not args.skip_scan:
        from megaportraits_tpu.core.config import Config
        from megaportraits_tpu.train.train_base import (
            init_states, make_train_step,
        )

        s = 256
        cfg = Config()
        cfg.data.train_width = cfg.data.train_height = s
        cfg.training.steps_per_epoch = 1
        gbase, disc, ploss, p_vars, g_state, d_state = init_states(
            cfg, rng, policy=DEFAULT_POLICY, image_size=s,
        )
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (5, 2, s, s, 3))
        batch = dict(zip(("source", "driving", "source_next", "source_star",
                          "driving_star"), imgs))
        for k in (1, 2):
            step = make_train_step(gbase, disc, ploss, p_vars, cfg,
                                   donate=False, unroll=k)
            b = (batch if k == 1 else
                 jax.tree_util.tree_map(
                     lambda x: jnp.stack([x] * k), batch))

            def run(g, d, bb, _step=step):
                g2, d2, m, _ = _step(g, d, bb)
                return m["loss_G"]

            c, r = timed_compile(f"train step @256 b2 scan k={k}",
                                 run, g_state, d_state, b)
            rows.append((f"train step @256 b2 scan k={k}", c, r / k))

    print("\n| config | compile+first (s) | per-unit run (ms) |")
    print("|---|---|---|")
    for name, c, r in rows:
        print(f"| {name} | {c:.1f} | {r * 1e3:.1f} |")
    print("| k=4 scan of 512 train step | documented SIGKILL crash "
          "(round 2, 7/7) | n/a |")
    print("| fused bf16 GHR @128-256 | documented crash (round 2) | n/a |")


if __name__ == "__main__":
    main()
