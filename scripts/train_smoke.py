"""Run a few fused stage-1 train steps on the real device (sanity/throughput).

Usage: python scripts/train_smoke.py [size] [batch] [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax

from megaportraits_tpu.core.config import Config
from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
from megaportraits_tpu.train.train_base import init_states, make_train_step


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.training.steps_per_epoch = 10

    t0 = time.time()
    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, jax.random.PRNGKey(0), policy=DEFAULT_POLICY, image_size=size)
    print("init:", round(time.time() - t0, 1), "s", flush=True)

    step = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False)
    rng = np.random.default_rng(0)

    def img():
        return rng.random((batch, size, size, 3)).astype(np.float32)

    batch_d = {k: img() for k in ("source", "driving", "source_next",
                                  "source_star", "driving_star")}
    t0 = time.time()
    g_state, d_state, metrics, _ = step(g_state, d_state, batch_d)
    m0 = {k: round(float(v), 4) for k, v in metrics.items()}
    print("first step (incl. compile):", round(time.time() - t0, 1), "s",
          m0, flush=True)
    t0 = time.time()
    for _ in range(steps):
        g_state, d_state, metrics, _ = step(g_state, d_state, batch_d)
    m = {k: round(float(v), 4) for k, v in metrics.items()}
    dt = time.time() - t0
    print(f"{steps} steps in {dt:.1f}s (incl. tunnel dispatch): {m}",
          flush=True)


if __name__ == "__main__":
    main()
