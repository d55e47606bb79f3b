"""Stage-2 training driver: ``python -m megaportraits_tpu.train.main_hr``.

TPU counterpart of train_highres.py's train_hr stage (train_highres.py:297):
loads/initializes a (frozen) Gbase, trains Genh at 2x pre-upscale for the
512 -> 1024 contract, Orbax checkpoints + TensorBoard.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from megaportraits_tpu.core.checkpoint import CheckpointManager
from megaportraits_tpu.core.config import Config, load_config
from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
from megaportraits_tpu.data.dataset import EMODataset
from megaportraits_tpu.data.prefetch import prefetch_to_device
from megaportraits_tpu.models.gbase import Gbase
from megaportraits_tpu.ops.resize import linear_resize
from megaportraits_tpu.parallel.mesh import batch_sharding, make_mesh
from megaportraits_tpu.train.train_hr import init_hr_state, make_hr_train_step
from megaportraits_tpu.utils.logging import MetricsWriter


def train_hr(cfg: Config, max_steps: int | None = None,
             gbase_ckpt: str | None = None, upscale: int = 2) -> dict:
    policy = DEFAULT_POLICY if cfg.training.use_bf16 else FP32_POLICY
    mesh = make_mesh(cfg.training.mesh_shape)
    rng = jax.random.PRNGKey(cfg.training.seed)
    size = cfg.data.train_width

    gbase = Gbase(policy=policy)
    dummy = jnp.zeros((1, size, size, 3), policy.compute_dtype)
    gbase_vars = jax.jit(gbase.init)(rng, dummy, dummy)
    if gbase_ckpt:
        for path in (gbase_ckpt + "/export", gbase_ckpt):
            try:
                restored = CheckpointManager(path).restore(
                    {"g_variables": gbase_vars}
                )
            except Exception:
                restored = None
            if restored is not None:
                gbase_vars = restored["g_variables"]
                break

    dataset = EMODataset(
        width=size, height=size,
        n_sample_frames=cfg.training.n_sample_frames,
        sample_rate=cfg.training.sample_rate,
        video_dir=cfg.training.video_dir,
        json_file=cfg.training.json_file,
        seed=cfg.training.seed,
    )
    cfg.training.steps_per_epoch = cfg.training.steps_per_epoch or max(
        1, len(dataset) * cfg.training.n_sample_frames // cfg.training.batch_size
    )

    genh, ploss, p_vars, state = init_hr_state(
        cfg, rng, policy, image_size=size, upscale=upscale
    )
    step_fn = make_hr_train_step(genh, gbase, gbase_vars, ploss, p_vars, cfg,
                                 upscale=upscale)
    ckpt = CheckpointManager(cfg.training.checkpoint_path)
    writer = MetricsWriter("runs/hr_logs")

    def hr_batches():
        for batch in dataset.frame_batches(cfg.training.batch_size,
                                           cfg.training.frame_offset,
                                           seed=cfg.training.seed):
            # HR target: the driving frame upsampled to the HR canvas (the
            # overfit harness has no real 1024 ground truth; with a 1024
            # dataset, plug the native frames in here).
            target = batch["driving"]
            if upscale != 1:
                target = np.repeat(np.repeat(target, upscale, 1), upscale, 2)
            yield {"source": batch["source"], "driving": batch["driving"],
                   "target_hr": target}

    batches = prefetch_to_device(hr_batches(), sharding=batch_sharding(mesh))
    total = max_steps or cfg.training.hr_epochs * cfg.training.steps_per_epoch
    metrics = {}
    t0 = time.time()
    for step_idx, batch in zip(range(total), batches):
        state, metrics = step_fn(state, batch)
        if (step_idx + 1) % cfg.training.log_interval == 0:
            host = {k: float(v) for k, v in metrics.items()}
            writer.write(step_idx, host)
            print(f"hr step {step_idx + 1}/{total}: {host} "
                  f"({(step_idx + 1) / (time.time() - t0):.2f} it/s)")
        if (step_idx + 1) % cfg.training.save_interval == 0:
            ckpt.save(step_idx + 1, {"genh": state})
    ckpt.save(total, {"genh": state}, wait=True)
    writer.close()
    return {k: float(v) for k, v in metrics.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/training/stage2-hr.yaml")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--gbase-ckpt", default=None)
    parser.add_argument("--upscale", type=int, default=2)
    args = parser.parse_args()
    train_hr(load_config(args.config), args.max_steps, args.gbase_ckpt,
             args.upscale)


if __name__ == "__main__":
    main()
