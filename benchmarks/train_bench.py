"""Stage-1 training-step benchmark (slope method over lax.scan of the FULL
fused train step) + ablations: remat mode, batch size, loss subsets.

Usage:
  python benchmarks/train_bench.py [--size 512] [--batch 1] [--remat full|selective|none]
      [--k-small 1 --k-large 4] [--losses all|no-perceptual|fm-only]

Reports seconds/step of pure device time (dispatch/tunnel RTT amortized
out by the slope method) and an MFU estimate from XLA cost analysis.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--remat", default="full",
                    choices=["full", "selective", "none"])
    ap.add_argument("--k-small", type=int, default=1)
    ap.add_argument("--k-large", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--losses", default="all",
                    choices=["all", "no-perceptual", "fm-only"])
    args = ap.parse_args()

    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
    from megaportraits_tpu.train.train_base import init_states, make_train_step

    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = args.size
    cfg.training.steps_per_epoch = 1
    cfg.training.batch_size = args.batch
    cfg.training.pretrained_path = ""  # bench: random weights
    if args.losses in ("no-perceptual", "fm-only"):
        cfg.training.w_per = 0.0
        cfg.training.w_identity = 0.0
    if args.losses == "fm-only":
        cfg.training.w_cos = 0.0
        cfg.training.w_pairwise = 0.0

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, rng, policy=DEFAULT_POLICY, image_size=args.size,
        remat_mode=args.remat,
    )
    print(f"init: {time.perf_counter() - t0:.1f}s  remat={args.remat} "
          f"batch={args.batch} size={args.size} losses={args.losses}")

    b, s = args.batch, args.size
    key = jax.random.PRNGKey(1)

    def make_batches(k):
        imgs = jax.random.uniform(key, (k, 5, b, s, s, 3), jnp.bfloat16)
        return imgs

    def unpack(imgs):
        names = ("source", "driving", "source_next", "source_star",
                 "driving_star")
        return {n: imgs[i] for i, n in enumerate(names)}

    step = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False)

    def chained(k):
        batches = make_batches(k)

        @jax.jit
        def run(g_state, d_state, batches):
            def body(carry, imgs):
                g, d = carry
                g, d, metrics, _ = step(g, d, unpack(imgs))
                return (g, d), metrics["loss_G"]

            (g, d), losses = jax.lax.scan(body, (g_state, d_state), batches)
            return losses[-1]

        t_compile = time.perf_counter()
        float(run(g_state, d_state, batches))
        print(f"  k={k}: compile+first {time.perf_counter() - t_compile:.1f}s")
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(run(g_state, d_state, batches))
        return (time.perf_counter() - t0) / args.reps

    # A train step is seconds-scale — tunnel RTT (~28 ms) is <1% noise, so
    # repeated-call timing of the k_small graph suffices. (A k=4 scan is a
    # second, much larger compile that OOM-kills the remote compile
    # service at 512^2 — avoid it.)
    per_step = chained(args.k_small) / args.k_small
    print(f"step time: {per_step * 1e3:.0f} ms  "
          f"({per_step / b * 1e3:.0f} ms/sample)")


if __name__ == "__main__":
    main()
