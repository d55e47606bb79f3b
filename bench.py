"""Benchmark: Gbase 512x512 one-shot reenactment throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north-star >= 30 frames/sec/chip (the reference
publishes no numbers of its own — BASELINE.md).

Measures the streaming serving path (source encoded once via
Gbase.encode_source, then Gbase.drive per driving frame — the reenactment
workload the fps target describes).

Methodology: this environment reaches the TPU through a tunnel whose
per-call round-trip is ~28 ms and whose block_until_ready does not wait for
device completion, so naive per-call timing is meaningless. We run K drive
steps inside ONE jit via lax.scan (distinct driving frames, data-dependent
carry) with a single scalar readback, for two values of K; the slope gives
the true per-frame device time.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 30.0


def _require_device(timeout_s: float = 120.0):
    """Fail fast (exit 2) if the TPU backend is unreachable — the axon
    plugin hangs jax.devices() while its tunnel is down; see
    core/debug.probe_device_count."""
    import sys

    from megaportraits_tpu.core.debug import probe_device_count

    if probe_device_count(timeout_s) is None:
        print(
            f"bench: TPU backend unavailable (init hung or failed within "
            f"{timeout_s:.0f}s — tunnel down?)",
            file=sys.stderr,
        )
        raise SystemExit(2)


def main():
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
    from megaportraits_tpu.models.gbase import Gbase

    _require_device()

    size = 512
    model = Gbase(policy=DEFAULT_POLICY)
    rng = jax.random.PRNGKey(0)
    xs = jax.random.uniform(rng, (1, size, size, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(rng, xs, xs)

    state = jax.jit(
        lambda v, xs: model.apply(v, xs, method=Gbase.encode_source)
    )(variables, xs)

    def chained(k):
        xds = jax.random.uniform(
            jax.random.PRNGKey(1), (k, 1, size, size, 3), jnp.bfloat16
        )

        @jax.jit
        def run(variables, state, xds):
            def body(carry, xd):
                xhat = model.apply(
                    variables, state, xd + carry * 1e-6, method=Gbase.drive
                )
                return jnp.mean(xhat).astype(jnp.bfloat16), ()

            acc, _ = jax.lax.scan(body, jnp.bfloat16(0.0), xds)
            return acc

        # Convention (VERDICT r4 Weak #6): 2 untimed warm-up executions
        # after compile (the first pass after a cold service restart can
        # run ~40% slow — measured 73.5 vs 123.2 fps on identical code,
        # round 4), then MEDIAN of 5 timed passes of 3 runs each.
        float(run(variables, state, xds))  # compile
        for _ in range(2):
            float(run(variables, state, xds))  # warm-up, untimed
        reps, passes = 3, 5

        def one_pass():
            t0 = time.perf_counter()
            for _ in range(reps):
                float(run(variables, state, xds))
            return (time.perf_counter() - t0) / reps

        times = sorted(one_pass() for _ in range(passes))
        return times[len(times) // 2]

    k_small, k_large = 2, 18
    t_small = chained(k_small)
    t_large = chained(k_large)
    per_frame = max((t_large - t_small) / (k_large - k_small), 1e-9)
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "gbase_512_streaming_reenactment_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "convention": "scan-slope (K=2 vs 18); per K: compile + 2 warm-up "
                      "runs, median of 5 passes x 3 runs",
    }))


if __name__ == "__main__":
    main()
