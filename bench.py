"""Benchmark: Gbase 512x512 one-shot reenactment throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north-star >= 30 frames/sec/chip (the reference
publishes no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 30.0


def main():
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
    from megaportraits_tpu.models.gbase import Gbase

    size = 512
    batch = 1
    model = Gbase(policy=DEFAULT_POLICY)
    rng = jax.random.PRNGKey(0)
    xs = jax.random.uniform(rng, (batch, size, size, 3), jnp.bfloat16)
    xd = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3),
                            jnp.bfloat16)
    variables = jax.jit(model.init)(rng, xs, xd)

    @jax.jit
    def forward(variables, xs, xd):
        xhat, _ = model.apply(variables, xs, xd)
        return xhat

    # Warmup / compile.
    forward(variables, xs, xd).block_until_ready()

    iters = 30
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        forward(variables, xs, xd).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    fps = batch / p50

    print(json.dumps({
        "metric": "gbase_512_reenactment_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
