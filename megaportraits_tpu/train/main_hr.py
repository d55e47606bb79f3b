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
from megaportraits_tpu.parallel.mesh import (
    batch_sharding,
    check_per_chip_batch,
    make_mesh,
)
from megaportraits_tpu.train.train_hr import init_hr_state, make_hr_train_step
from megaportraits_tpu.utils.logging import MetricsWriter


def train_hr(cfg: Config, max_steps: int | None = None,
             gbase_ckpt: str | None = None, upscale: int = 2,
             native_hr: bool = True) -> dict:
    """Stage-2 Genh training.

    With ``native_hr`` (default) and ``upscale > 1``, frames are DECODED at
    the HR resolution (size * upscale) and the driving frame at native
    resolution is the supervised target, while Gbase consumes anti-aliased
    downsamples — real super-resolution supervision (the junk clips are
    512^2 native, so a 256-base -> 512-HR run needs no new data; reference
    train_highres.py:297-364 assumes a 1024 dataset it never had). With
    ``native_hr=False`` the old placeholder path (nearest-upsampled driving
    frame as target) is kept for schema compatibility.
    """
    policy = DEFAULT_POLICY if cfg.training.use_bf16 else FP32_POLICY
    mesh = make_mesh(cfg.training.mesh_shape)
    check_per_chip_batch(cfg.training.batch_size, mesh)
    rng = jax.random.PRNGKey(cfg.training.seed)
    size = cfg.data.train_width
    native_hr = native_hr and upscale > 1

    gbase = cfg.make_gbase(policy=policy)
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

    decode_size = size * upscale if native_hr else size
    dataset = EMODataset(
        width=decode_size, height=decode_size,
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

    evaluator = None
    holdout = cfg.training.holdout_frames if cfg.training.eval_interval else 0
    if cfg.training.eval_interval and native_hr:
        from megaportraits_tpu.eval.heldout import HeldoutEvaluator

        clips_hr = {
            vid: dataset.load_and_process_video(vid)["source_frames"]
            for vid in dataset.video_ids
        }
        evaluator = HeldoutEvaluator.for_genh(
            genh, gbase, gbase_vars, clips_hr, holdout,
            cfg.training.batch_size, base_size=size, upscale=upscale,
        )
        print(f"held-out early stopping: {evaluator.n_pairs} eval pairs, "
              f"every {cfg.training.eval_interval} steps")
    elif cfg.training.eval_interval:
        print("WARNING: eval_interval ignored — held-out HR eval needs "
              "native_hr targets (synthetic targets carry no held-out "
              "signal)")
        holdout = 0

    def _downsample(frames: np.ndarray) -> np.ndarray:
        """Anti-aliased host-side downsample [B, H, W, 3] -> base size."""
        import cv2

        return np.stack([
            cv2.resize(f, (size, size), interpolation=cv2.INTER_AREA)
            for f in frames
        ])

    def hr_batches():
        for batch in dataset.frame_batches(cfg.training.batch_size,
                                           cfg.training.frame_offset,
                                           seed=cfg.training.seed,
                                           holdout=holdout):
            if native_hr:
                # REAL super-resolution supervision: native-resolution
                # driving frame is the target; Gbase sees anti-aliased
                # base-size downsamples.
                yield {"source": _downsample(batch["source"]),
                       "driving": _downsample(batch["driving"]),
                       "target_hr": batch["driving"]}
                continue
            # Placeholder path: nearest-upsampled driving frame as target.
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
        if evaluator is not None and (
                step_idx + 1) % cfg.training.eval_interval == 0:
            score, improved = evaluator.consider(state, step_idx + 1)
            writer.write(step_idx, {"heldout_psnr": score})
            print(f"hr step {step_idx + 1}: held-out HR PSNR {score:.2f} dB"
                  f"{'  <- best' if improved else ''}")
    ckpt.save(total, {"genh": state}, wait=True)

    # Export inference payload in the downstream convention
    # ({'genh_variables': ...} — hr_quality.py --export-genh /
    # validate_student --genh-ckpt). With early stopping on, the
    # best-held-out-PSNR snapshot is exported instead of the final state.
    export = CheckpointManager(cfg.training.checkpoint_path + "/export")
    export_step = total
    if evaluator is not None:
        genh_variables, best_step, is_best = evaluator.export_variables(state)
        if is_best:
            export_step = best_step
            print(f"exporting best snapshot (step {best_step}, "
                  f"held-out {evaluator.best_psnr:.2f} dB)")
    else:
        genh_variables = {"params": state.params}
        if state.batch_stats is not None:
            genh_variables["batch_stats"] = state.batch_stats
    export.save(export_step, {"genh_variables": genh_variables}, wait=True)
    writer.close()
    return {k: float(v) for k, v in metrics.items()}


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/training/stage2-hr.yaml")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--gbase-ckpt", default=None)
    parser.add_argument("--upscale", type=int, default=2)
    parser.add_argument(
        "--synthetic-targets", action="store_true",
        help="use the legacy nearest-upsampled targets instead of "
             "native-resolution decode",
    )
    args = parser.parse_args()
    train_hr(load_config(args.config), args.max_steps, args.gbase_ckpt,
             args.upscale, native_hr=not args.synthetic_targets)


if __name__ == "__main__":
    main()
