"""Stage-3 training driver: ``python -m megaportraits_tpu.train.main_student``.

TPU counterpart of train_student (train_highres.py:365-405): frozen GHR
teacher, per-avatar SPADE student, MSE distillation.
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
from megaportraits_tpu.models.genh import GHR
from megaportraits_tpu.parallel.mesh import (
    batch_sharding,
    check_per_chip_batch,
    make_mesh,
)
from megaportraits_tpu.train.train_student import (
    init_student_state,
    make_student_train_step,
)
from megaportraits_tpu.utils.logging import MetricsWriter


def train_student(cfg: Config, max_steps: int | None = None,
                  teacher_ckpt: str | None = None) -> dict:
    policy = DEFAULT_POLICY if cfg.training.use_bf16 else FP32_POLICY
    mesh = make_mesh(cfg.training.mesh_shape)
    check_per_chip_batch(cfg.training.batch_size, mesh)
    rng = jax.random.PRNGKey(cfg.training.seed)
    size = cfg.data.train_width

    teacher = GHR(policy=policy, arch=cfg.make_arch())
    dummy = jnp.zeros((1, size, size, 3), policy.compute_dtype)
    teacher_vars = jax.jit(teacher.init)(rng, dummy, dummy)
    if teacher_ckpt:
        mgr = CheckpointManager(teacher_ckpt)
        restored = mgr.restore({"ghr_variables": teacher_vars})
        if restored is not None:
            teacher_vars = restored["ghr_variables"]

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
    num_avatars = min(cfg.training.num_avatars, len(dataset))

    student, state = init_student_state(cfg, rng, policy, image_size=size)
    step_fn = make_student_train_step(student, teacher, teacher_vars, cfg)
    ckpt = CheckpointManager(cfg.training.checkpoint_path)
    writer = MetricsWriter("runs/student_logs")

    def avatar_batches():
        rng_np = np.random.default_rng(cfg.training.seed)
        b = cfg.training.batch_size
        while True:
            idx = rng_np.integers(num_avatars, size=b)
            src, drv = [], []
            for avatar in idx:
                item = dataset[int(avatar)]
                fi = int(rng_np.integers(len(item["driving_frames"])))
                src.append(item["source_frames"][fi % len(item["source_frames"])])
                drv.append(item["driving_frames"][fi])
            yield {"source": np.stack(src), "driving": np.stack(drv),
                   "avatar_index": idx.astype(np.int32)}

    batches = prefetch_to_device(avatar_batches(),
                                 sharding=batch_sharding(mesh))
    total = max_steps or (cfg.training.student_epochs
                          * cfg.training.steps_per_epoch)
    metrics = {}
    t0 = time.time()
    for step_idx, batch in zip(range(total), batches):
        state, metrics = step_fn(state, batch)
        if (step_idx + 1) % cfg.training.log_interval == 0:
            host = {k: float(v) for k, v in metrics.items()}
            writer.write(step_idx, host)
            print(f"student step {step_idx + 1}/{total}: {host} "
                  f"({(step_idx + 1) / (time.time() - t0):.2f} it/s)")
        if (step_idx + 1) % cfg.training.save_interval == 0:
            ckpt.save(step_idx + 1, {"student": state})
    ckpt.save(total, {"student": state}, wait=True)
    writer.close()
    return {k: float(v) for k, v in metrics.items()}


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config",
                        default="configs/training/stage3-student.yaml")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--teacher-ckpt", default=None)
    args = parser.parse_args()
    train_student(load_config(args.config), args.max_steps, args.teacher_ckpt)


if __name__ == "__main__":
    main()
