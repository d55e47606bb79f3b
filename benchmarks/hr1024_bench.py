"""Stage-2 at the contract resolution: 512 -> 1024 (VERDICT r3 item 5).

The reference's README promises 512 -> 1024 enhancement
(/root/reference/README.md:104) but its HR trainer assumes a 1024
dataset it never had (/root/reference/train_highres.py:297-364); no
1024 ground truth exists in this env either (the junk clips are
512-native), so the TRAIN step here runs against synthetic HR targets —
what this harness demonstrates is that the stage-2 train and inference
graphs COMPILE, FIT HBM, and run at a measured rate at the contract
resolution on one chip.

Measures:
  1. Genh train step at 512->1024: frozen Gbase@512 forward inside the
     step (train_highres.py:319-321 semantics), bilinear x2 pre-upscale,
     Genh@1024 with supervised + cycle + VGG19 terms. Sequential-call
     timing with scalar readback (per-call dispatch ~11 ms << step time).
  2. GHR inference at 1024: encode source once, then per frame
     Gbase.drive@512 -> bilinear x2 -> Genh@1024, slope method over a
     lax.scan (same methodology as bench.py).
  3. Peak HBM in both regimes (utils/profiling.device_memory_stats).

    python benchmarks/hr1024_bench.py [--train-steps 8] [--infer-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def hbm_line(tag: str) -> str:
    from megaportraits_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    if not stats:
        return f"{tag}: (no memory stats on this backend)"
    used = stats.get("bytes_in_use", 0) / 2**30
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
    lim = stats.get("bytes_limit", 0) / 2**30
    return f"{tag}: HBM in use {used:.2f} GiB, peak {peak:.2f} GiB, limit {lim:.2f} GiB"


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--upscale", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--train-steps", type=int, default=8)
    ap.add_argument("--infer-only", action="store_true")
    ap.add_argument("--train-only", action="store_true")
    args = ap.parse_args()

    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
    from megaportraits_tpu.models.gbase import Gbase

    size, up, b = args.size, args.upscale, args.batch
    hr = size * up
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.training.steps_per_epoch = 1

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    gbase = Gbase(policy=DEFAULT_POLICY)
    xs = jax.random.uniform(rng, (b, size, size, 3), jnp.bfloat16)
    g_vars = jax.jit(gbase.init)(rng, xs, xs)
    print(f"gbase init {time.perf_counter() - t0:.1f}s", flush=True)

    lines = [f"stage-2 contract-resolution bench: {size} -> {hr}, batch {b}"]

    if not args.infer_only:
        from megaportraits_tpu.train.train_hr import (
            init_hr_state, make_hr_train_step,
        )

        genh, ploss, p_vars, state = init_hr_state(
            cfg, jax.random.PRNGKey(1), policy=DEFAULT_POLICY,
            image_size=size, upscale=up,
        )
        print(f"hr init {time.perf_counter() - t0:.1f}s", flush=True)
        step = make_hr_train_step(genh, gbase, g_vars, ploss, p_vars, cfg,
                                  upscale=up)
        batch = {
            "source": xs,
            "driving": jax.random.uniform(
                jax.random.PRNGKey(2), (b, size, size, 3), jnp.bfloat16),
            "target_hr": jax.random.uniform(
                jax.random.PRNGKey(3), (b, hr, hr, 3), jnp.bfloat16),
        }
        tc = time.perf_counter()
        state, metrics = step(state, batch)
        loss0 = float(metrics["loss_hr"])
        compile_s = time.perf_counter() - tc
        print(f"train step compiled+ran in {compile_s:.1f}s "
              f"loss {loss0:.4f}", flush=True)
        ts = time.perf_counter()
        n = max(1, args.train_steps)
        for _ in range(n):
            state, metrics = step(state, batch)
            last = float(metrics["loss_hr"])  # forces completion
        per_step = (time.perf_counter() - ts) / n
        lines.append(
            f"train step (Gbase@{size} frozen + Genh@{hr}, sup+cycle+vgg19): "
            f"{per_step * 1e3:.0f} ms/step over {n} steps "
            f"(loss {loss0:.3f} -> {last:.3f}; compile+first {compile_s:.0f}s)"
        )
        lines.append(hbm_line("after train steps"))
        print(lines[-2] + "\n" + lines[-1], flush=True)
        del state, step, p_vars, batch

    if not args.train_only:
        from megaportraits_tpu.models.genh import Genh
        from megaportraits_tpu.ops.resize import linear_resize

        genh_i = Genh(policy=DEFAULT_POLICY)
        e_vars = jax.jit(genh_i.init)(
            jax.random.PRNGKey(4), jnp.zeros((b, hr, hr, 3), jnp.bfloat16))
        src_state = jax.jit(
            lambda v, x: gbase.apply(v, x, method=Gbase.encode_source)
        )(g_vars, xs)

        def chained(k):
            xds = jax.random.uniform(
                jax.random.PRNGKey(5), (k, b, size, size, 3), jnp.bfloat16)

            @jax.jit
            def run(g_vars, e_vars, src_state, xds):
                def body(carry, xd):
                    xhat = gbase.apply(g_vars, src_state, xd + carry * 1e-6,
                                       method=Gbase.drive)
                    xhat = linear_resize(xhat, [hr, hr], axes=(1, 2),
                                         align_corners=False)
                    xhat = genh_i.apply(e_vars, xhat)
                    return jnp.mean(xhat).astype(jnp.bfloat16), ()

                acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0), xds)
                return acc

            float(run(g_vars, e_vars, src_state, xds))  # compile + warm

            def one_pass(reps=3):
                tp = time.perf_counter()
                for _ in range(reps):
                    float(run(g_vars, e_vars, src_state, xds))
                return (time.perf_counter() - tp) / reps

            return min(one_pass(), one_pass())

        k_small, k_large = 2, 10
        t_small = chained(k_small)
        t_large = chained(k_large)
        per_frame = max((t_large - t_small) / (k_large - k_small), 1e-9)
        lines.append(
            f"GHR inference (drive@{size} -> x{up} -> Genh@{hr}): "
            f"{per_frame * 1e3:.2f} ms/frame = {1.0 / per_frame:.1f} fps/chip"
        )
        lines.append(hbm_line("after inference"))
        print(lines[-2] + "\n" + lines[-1], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "hr_quality", "HR1024_BENCH.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
