"""Data-parallel scaling measurement on the virtual 8-device CPU mesh.

    JAX_PLATFORM_NAME ignored here — self-provisions CPU devices like
    __graft_entry__: run plainly as `python benchmarks/dp_scaling.py`.

Measures the fused stage-1 step at fixed GLOBAL batch 8 on 1 vs 8 mesh
devices. CAVEAT, stated up front: this host has ONE physical core, so all
8 virtual devices timeshare it — the numbers measure GSPMD partitioning
OVERHEAD (sharded program + collectives vs single-device program), not
parallel speedup; real scaling needs real chips. The correctness half
(sharded grads == single-device grads) lives in
tests/test_train_smoke.py::test_data_parallel_grads_match_single_device.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _respawn():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    env["_DP_SCALING_CHILD"] = "1"
    raise SystemExit(subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, cwd=REPO
    ).returncode)


def main():
    sys.path.insert(0, REPO)
    import jax

    if "_DP_SCALING_CHILD" not in os.environ:
        _respawn()
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import FP32_POLICY
    from megaportraits_tpu.parallel.mesh import make_mesh, DATA_AXIS
    from megaportraits_tpu.train.train_base import init_states, make_train_step

    size, batch = 64, 8
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.training.steps_per_epoch = 1
    cfg.training.batch_size = batch
    cfg.training.pretrained_path = ""

    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, jax.random.PRNGKey(0), policy=FP32_POLICY, image_size=size
    )
    step = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False)
    rng = np.random.default_rng(0)
    batch_np = {
        k: rng.random((batch, size, size, 3)).astype(np.float32)
        for k in ("source", "driving", "source_next", "source_star",
                  "driving_star")
    }

    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh({DATA_AXIS: n}, devices=jax.devices()[:n])
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P(DATA_AXIS))
        g = jax.device_put(g_state, rep)
        d = jax.device_put(d_state, rep)
        b = {k: jax.device_put(v, sh) for k, v in batch_np.items()}
        t0 = time.perf_counter()
        out = step(g, d, b)
        jax.block_until_ready(out[2])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = step(g, d, b)
            jax.block_until_ready(out[2])
        t = (time.perf_counter() - t0) / 3
        rows.append((n, t, compile_s))
        print(f"devices={n}: {t * 1e3:.0f} ms/step (global batch {batch}; "
              f"first-call {compile_s:.0f}s)")
    base = rows[0][1]
    for n, t, _ in rows[1:]:
        print(f"  {n}-dev overhead vs 1-dev: {t / base:.2f}x "
              f"(1 physical core — see module docstring)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
