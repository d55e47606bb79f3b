"""Per-component device-time microbenchmarks (slope method — see bench.py).

Usage: python benchmarks/micro.py [component ...]
Components: warp eapp emtn g3d g2d flow disc gbase student
(student is opt-in: Student@1024 serving fps, not in the default sweep)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from megaportraits_tpu.core.debug import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import DEFAULT_POLICY as P


def slope_time(fn, make_input, k_small=2, k_large=18, reps=3):
    """Device time per fn application, amortizing tunnel RTT."""

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


def bench_warp():
    """Production-shape trilinear warp, one row per gather layout
    (ops/warp.grid_sample_3d impl choices — the block_xc layout is the
    round-4 candidate for shaving XLA's gather-loop overhead)."""
    from megaportraits_tpu.ops.warp import grid_sample_3d
    from megaportraits_tpu.ops.resize import linear_resize
    from megaportraits_tpu.ops.warp import _identity_grid

    b, d, h, w, c = 1, 16, 64, 64, 96
    v = jax.random.normal(jax.random.PRNGKey(0), (b, d, h, w, c), jnp.bfloat16)

    def make(k):
        return jax.random.uniform(
            jax.random.PRNGKey(1), (k, b, 64, 64, 64, 3), jnp.float32,
            minval=-1, maxval=1,
        )

    def warp_with(impl):
        def f(flow):
            fl = linear_resize(flow, (d, h, w), axes=(1, 2, 3),
                               align_corners=True)
            grid = jnp.asarray(_identity_grid(d, h, w))[None]
            warped = grid + fl.astype(jnp.float32)
            norm = jnp.asarray([w - 1, h - 1, d - 1], dtype=jnp.float32)
            warped = 2.0 * warped / norm - 1.0
            return grid_sample_3d(v, warped, align_corners=True, impl=impl)

        return f

    for impl in ("block", "block_xc", "corners"):
        t = slope_time(warp_with(impl), make)
        print(f"apply_warping_field [1,16,64,64,96] impl={impl}: "
              f"{t * 1e3:.3f} ms")


def bench_student(size=1024):
    """Student serving rate at the north-star resolution (the 56.4 fps
    claim is a round-1 number measured on a since-revised design —
    VERDICT r3 weak #7). Batch 1, streaming, eval-mode."""
    from megaportraits_tpu.models.student import Student

    student = Student(num_avatars=4, policy=P)
    rng = jax.random.PRNGKey(0)
    xd0 = jax.random.normal(rng, (1, size, size, 3), jnp.bfloat16)
    av = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(student.init)(rng, xd0, av)

    def make(k):
        return jax.random.normal(
            jax.random.PRNGKey(2), (k, 1, size, size, 3), jnp.bfloat16)

    t = slope_time(lambda xd: student.apply(variables, xd, av), make,
                   k_large=10)
    print(f"Student [1,{size},{size},3]: {t * 1e3:.3f} ms/frame "
          f"= {1.0 / t:.1f} fps/chip")


def _bench_module(name, module, shapes, dtypes=None):
    rng = jax.random.PRNGKey(0)
    dtypes = dtypes or [jnp.bfloat16] * len(shapes)
    args = [jax.random.normal(rng, s, dt) for s, dt in zip(shapes, dtypes)]
    variables = jax.jit(module.init)(rng, *args)

    def make(k):
        return [
            jax.random.normal(jax.random.PRNGKey(2), (k, *s), dt)
            for s, dt in zip(shapes, dtypes)
        ]

    t = slope_time(lambda xs: module.apply(variables, *xs), make)
    print(f"{name}: {t * 1e3:.3f} ms")


def main():
    targets = sys.argv[1:] or ["warp", "flow", "g3d", "g2d", "eapp", "emtn",
                               "disc", "gbase"]
    size = 512
    for t in targets:
        if t == "warp":
            bench_warp()
        elif t == "student":
            bench_student()
        elif t == "flow":
            from megaportraits_tpu.models.warpgen import FlowField
            _bench_module("FlowField", FlowField(policy=P), [(1, 512)])
        elif t == "g3d":
            from megaportraits_tpu.models.g3d import G3d
            _bench_module("G3d [1,16,64,64,96]", G3d(policy=P),
                          [(1, 16, 64, 64, 96)])
        elif t == "g2d":
            from megaportraits_tpu.models.g2d import G2d
            _bench_module("G2d [1,64,64,96]", G2d(policy=P), [(1, 64, 64, 96)])
        elif t == "eapp":
            from megaportraits_tpu.models.eapp import Eapp
            _bench_module(f"Eapp [1,{size},{size},3]", Eapp(policy=P),
                          [(1, size, size, 3)])
        elif t == "emtn":
            from megaportraits_tpu.models.emtn import Emtn
            _bench_module(f"Emtn [1,{size},{size},3]", Emtn(policy=P),
                          [(1, size, size, 3)])
        elif t == "disc":
            from megaportraits_tpu.models.discriminator import Discriminator
            _bench_module(f"Discriminator [{size}]", Discriminator(policy=P),
                          [(1, size, size, 3), (1, size, size, 3)])
        elif t == "gbase":
            from megaportraits_tpu.models.gbase import Gbase
            _bench_module(f"Gbase [{size}]", Gbase(policy=P),
                          [(1, size, size, 3), (1, size, size, 3)])


if __name__ == "__main__":
    main()
