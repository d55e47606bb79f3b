"""Stage-1 training driver: ``python -m megaportraits_tpu.train.main_base
[--config configs/training/stage1-base.yaml]``.

The TPU counterpart of ``python train.py`` (reference train.py:387-435):
EMODataset (npz-cached host pipeline) -> double-buffered device prefetch ->
jitted fused train step (data-parallel over the mesh 'data' axis) ->
TensorBoard metrics, PNG debug dumps, Orbax checkpoints with auto-resume.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from megaportraits_tpu.core.checkpoint import CheckpointManager
from megaportraits_tpu.core.config import Config, load_config
from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
from megaportraits_tpu.data.dataset import EMODataset
from megaportraits_tpu.data.prefetch import prefetch_to_device
from megaportraits_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from megaportraits_tpu.train.train_base import init_states, make_train_step
from megaportraits_tpu.utils.image import save_image
from megaportraits_tpu.utils.logging import MetricsWriter


def train_base(cfg: Config, max_steps: int | None = None) -> dict:
    policy = DEFAULT_POLICY if cfg.training.use_bf16 else FP32_POLICY
    mesh = make_mesh(cfg.training.mesh_shape)
    # The data axis must divide the global batch; shrink to the largest
    # divisor when it doesn't (e.g. batch 2 on an 8-device test mesh).
    from megaportraits_tpu.parallel.mesh import DATA_AXIS

    if cfg.training.batch_size % mesh.shape[DATA_AXIS]:
        n = mesh.shape[DATA_AXIS]
        while cfg.training.batch_size % n:
            n -= 1
        mesh = make_mesh({DATA_AXIS: n}, devices=jax.devices()[:n])
    from megaportraits_tpu.parallel.mesh import check_per_chip_batch

    check_per_chip_batch(cfg.training.batch_size, mesh)
    rng = jax.random.PRNGKey(cfg.training.seed)

    dataset = EMODataset(
        width=cfg.data.train_width,
        height=cfg.data.train_height,
        n_sample_frames=cfg.training.n_sample_frames,
        sample_rate=cfg.training.sample_rate,
        video_dir=cfg.training.video_dir,
        json_file=cfg.training.json_file,
        seed=cfg.training.seed,
    )
    steps_per_epoch = cfg.training.steps_per_epoch or max(
        1, len(dataset) * cfg.training.n_sample_frames // cfg.training.batch_size
    )
    cfg.training.steps_per_epoch = steps_per_epoch

    gbase, disc, ploss, p_vars, g_state, d_state = init_states(cfg, rng, policy)
    g_state = jax.device_put(g_state, replicated_sharding(mesh))
    d_state = jax.device_put(d_state, replicated_sharding(mesh))
    p_vars = jax.device_put(p_vars, replicated_sharding(mesh))

    ckpt = CheckpointManager(cfg.training.checkpoint_path)
    latest = ckpt.latest_step()
    if latest is not None:
        restored = ckpt.restore({"g": g_state, "d": d_state}, latest)
        g_state, d_state = restored["g"], restored["d"]
        print(f"Resumed from checkpoint step {latest}")

    unroll = max(1, cfg.training.unroll_steps)
    step_fn = make_train_step(gbase, disc, ploss, p_vars, cfg, unroll=unroll)
    writer = MetricsWriter()

    holdout = cfg.training.holdout_frames if cfg.training.eval_interval else 0
    raw_batches = dataset.frame_batches(
        cfg.training.batch_size, cfg.training.frame_offset,
        seed=cfg.training.seed, holdout=holdout,
    )

    evaluator = None
    if cfg.training.eval_interval:
        from megaportraits_tpu.eval.heldout import HeldoutEvaluator

        clips = {
            vid: dataset.load_and_process_video(vid)["source_frames"]
            for vid in dataset.video_ids
        }
        evaluator = HeldoutEvaluator.for_gbase(
            gbase, clips, holdout, cfg.training.batch_size)
        print(f"held-out early stopping: {evaluator.n_pairs} eval pairs, "
              f"every {cfg.training.eval_interval} steps")

    if cfg.training.use_gaze_loss:
        # Host side of the opt-in gaze term: rasterize eye masks from the
        # driving frames with the installed 68-point landmark provider.
        # Without one (no converted FAN weights) the term is skipped —
        # matching the reference, where gaze is effectively disabled in
        # the canonical path (model.py:1961,1971).
        from megaportraits_tpu.losses.gaze import gaze_masks_for_batch

        def with_gaze(it):
            warned = False
            had_masks = False
            for b in it:
                masks = gaze_masks_for_batch(b["driving"])
                if masks is None:
                    if had_masks:
                        # Keep the batch structure stable once the jitted
                        # step has seen masks (avoids a retrace): a zero
                        # mask zeroes the term for this batch.
                        d = b["driving"]
                        b["gaze_masks"] = np.zeros(
                            (*d.shape[:3], 2), np.float32
                        )
                    elif not warned:
                        print("use_gaze_loss: no 68-point landmark "
                              "provider (converted FAN weights absent) — "
                              "gaze term skipped")
                        warned = True
                else:
                    had_masks = True
                    b["gaze_masks"] = masks
                yield b

        raw_batches = with_gaze(raw_batches)

    def grouped():
        if unroll == 1:
            yield from raw_batches
            return
        while True:
            group = [next(raw_batches) for _ in range(unroll)]
            yield {
                k: np.stack([g[k] for g in group]) for k in group[0]
            }

    batches = prefetch_to_device(grouped(), sharding=batch_sharding(mesh))

    total_steps = max_steps or cfg.training.base_epochs * steps_per_epoch
    start = int(g_state.step)
    t0 = time.time()
    metrics = {}
    for call_idx, batch in zip(
        range(start // unroll, -(-total_steps // unroll)), batches
    ):
        g_state, d_state, metrics, xhat = step_fn(g_state, d_state, batch)
        step_idx = (call_idx + 1) * unroll
        if step_idx % cfg.training.log_interval < unroll:
            host = {k: float(v) for k, v in metrics.items()}
            host["steps_per_sec"] = (step_idx - start) / (time.time() - t0)
            writer.write(step_idx, host)
            print(f"step {step_idx}/{total_steps}: "
                  f"G={host['loss_G']:.4f} D={host['loss_D']:.4f} "
                  f"({host['steps_per_sec']:.2f} it/s)")
            if xhat is not None:
                save_image(np.asarray(xhat, dtype=np.float32),
                           f"output_images/pred_frame_{step_idx}.png")
        if step_idx % cfg.training.save_interval < unroll:
            ckpt.save(step_idx, {"g": g_state, "d": d_state})
        if evaluator is not None and (
                step_idx % cfg.training.eval_interval < unroll):
            score, improved = evaluator.consider(g_state, step_idx)
            writer.write(step_idx, {"heldout_psnr": score})
            print(f"step {step_idx}: held-out self-PSNR {score:.2f} dB"
                  f"{'  <- best' if improved else ''}")
    ckpt.save(total_steps, {"g": g_state, "d": d_state}, wait=True)

    # Export inference payload (params + stats only — the reference's
    # Gbase.pth equivalent, train.py:429). With early stopping on, the
    # best-held-out-PSNR snapshot is exported instead of the final state.
    export = CheckpointManager(cfg.training.checkpoint_path + "/export")
    export_step = total_steps
    if evaluator is not None:
        g_variables, best_step, is_best = evaluator.export_variables(g_state)
        if is_best:
            export_step = best_step
            print(f"exporting best snapshot (step {best_step}, "
                  f"held-out {evaluator.best_psnr:.2f} dB)")
    else:
        g_variables = {"params": g_state.params}
        if g_state.batch_stats is not None:
            g_variables["batch_stats"] = g_state.batch_stats
    export.save(export_step, {"g_variables": g_variables}, wait=True)
    writer.close()
    return {k: float(v) for k, v in metrics.items()}


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/training/stage1-base.yaml")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args()
    train_base(load_config(args.config), args.max_steps)


if __name__ == "__main__":
    main()
