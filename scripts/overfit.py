"""Overfit harness: train stage-1 on the reference's junk videos
(BASELINE.json configs[2] — 'train_base overfit run on data/overfit.json').

Usage: python scripts/overfit.py [--size 256] [--steps 60] [--batch 2]
Preprocesses the 4 junk/*.mp4 clips into the npz cache (cache under
/tmp/megaportraits_cache since /root/reference is read-only), runs fused
train steps on the device, prints the loss trajectory, dumps sample frames.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax

from megaportraits_tpu.core.config import Config
from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
from megaportraits_tpu.data.dataset import EMODataset
from megaportraits_tpu.train.train_base import init_states, make_train_step
from megaportraits_tpu.utils.image import save_image


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--video-dir", default="/root/reference/junk")
    parser.add_argument("--json-file",
                        default="/root/reference/data/overfit.json")
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument(
        "--sample-rate", type=int, default=10,
        help="decode every Nth frame (the junk clips are 74-181 frames "
             "at 24 fps; rate 5 with --frames 24 yields 15-24 frames/clip "
             "— more per-clip diversity against the 4-clip overtraining "
             "cliff than the rate-10 default's 8-19)",
    )
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument(
        "--pool", type=int, default=0,
        help="precompute N batches, keep them device-resident, and sample "
             "from them on-device per step (removes the ~1.2 s/step tunnel "
             "upload; fine for overfit runs where batch diversity is the "
             "pool size)",
    )
    parser.add_argument(
        "--export", default="",
        help="Orbax export dir for the trained Gbase variables "
             "({'g_variables': ...}, the main_base export schema) — feeds "
             "validate_student/eval runs",
    )
    parser.add_argument(
        "--eval-every", type=int, default=0,
        help="held-out self-reenactment PSNR every N steps; keeps the "
             "best-PSNR snapshot and exports THAT (early stopping — the "
             "round-3 overtraining study shows ~600 steps is the cliff at "
             "4-clip scale; VERDICT r3 item 1a)",
    )
    parser.add_argument(
        "--eval-bn-mode", choices=["batch", "running"], default="batch",
        help="held-out eval forward convention: 'batch' = train-mode BN "
             "stats (GAN-generator convention), 'running' = the SERVING "
             "forward (eval mode) — use with --norm group, where the "
             "generator has no train/eval gap (VERDICT r4 Weak #5)",
    )
    parser.add_argument(
        "--eval-burn-in", type=int, default=0,
        help="ignore held-out evals before this step when tracking the "
             "best snapshot (guards early-stopping against an early "
             "noise spike)",
    )
    parser.add_argument(
        "--holdout", type=int, default=4,
        help="frames reserved per clip as the held-out eval tail "
             "(excluded from training batches when --eval-every is set)",
    )
    parser.add_argument(
        "--norm", choices=["batch", "group"], default="batch",
        help="ResBlock2D norm flavor (core/arch.py): 'batch' = reference "
             "BN parity, 'group' = AffineGroupNorm(32) — identical "
             "train/eval forward, no running-stats gap (the round-5 "
             "GN-vs-BN decision study)",
    )
    parser.add_argument(
        "--export-clean", action="store_true",
        help="wipe a non-empty --export dir at startup instead of "
             "refusing (a leftover step would shadow this run's export)",
    )
    parser.add_argument(
        "--all-clips", action="store_true",
        help="train on EVERY video in --video-dir instead of only the "
             "clips listed in --json-file (overfit.json lists just one; "
             "multi-identity data makes the star/cycle terms real and "
             "gives the held-out eval >= one full batch of pairs)",
    )
    args = parser.parse_args()

    if args.all_clips:
        # An empty clips dict makes EMODataset fall back to listing
        # --video-dir (same trick as benchmarks/eval_table.py).
        import json as _json
        import tempfile

        tmp_json = os.path.join(tempfile.gettempdir(), "overfit_all.json")
        with open(tmp_json, "w") as f:
            _json.dump({"clips": {}}, f)
        args.json_file = tmp_json

    cache = "/tmp/megaportraits_cache"
    os.makedirs(cache, exist_ok=True)
    t0 = time.time()
    dataset = EMODataset(
        width=args.size, height=args.size,
        n_sample_frames=args.frames, sample_rate=args.sample_rate,
        video_dir=args.video_dir, json_file=args.json_file,
        cache_dir=cache,
    )
    # Warm the cache for all clips (preprocessing resumability contract).
    for vid in dataset.video_ids:
        dataset.load_and_process_video(vid)
        print(f"preprocessed {vid} ({time.time() - t0:.1f}s)", flush=True)

    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = args.size
    cfg.training.steps_per_epoch = args.steps
    cfg.training.lr = 3e-5
    cfg.model.norm = args.norm

    # Export-dir discipline (ADVICE r4): ONE manager for the whole run,
    # opened up front; a non-empty dir is refused (or wiped with
    # --export-clean) so a previous run's steps can neither collide with
    # incremental saves (StepAlreadyExistsError mid-run) nor shadow this
    # run's result at restore time.
    export_mgr = None
    last_saved_step = None
    if args.export:
        from megaportraits_tpu.core.checkpoint import CheckpointManager

        export_mgr = CheckpointManager(args.export)
        if export_mgr.latest_step() is not None:
            if not args.export_clean:
                sys.exit(
                    f"--export dir {args.export} already holds step "
                    f"{export_mgr.latest_step()}; pass --export-clean to "
                    f"wipe it or choose a fresh dir"
                )
            import shutil

            export_mgr.close()
            shutil.rmtree(args.export)
            export_mgr = CheckpointManager(args.export)

    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, jax.random.PRNGKey(0), policy=DEFAULT_POLICY,
        image_size=args.size,
    )
    print(f"init done ({time.time() - t0:.1f}s)", flush=True)
    step = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False,
                           pool_index=bool(args.pool))

    holdout = args.holdout if args.eval_every else 0
    batches = dataset.frame_batches(args.batch, frame_offset=3, seed=0,
                                    holdout=holdout)
    first_g = None

    # Held-out self-reenactment eval + best-snapshot early stopping
    # (eval/heldout.py; batch-stat BN — the GAN-generator convention, see
    # the module docstring and RESULTS.md round 4).
    evaluator = None
    if args.eval_every:
        from megaportraits_tpu.eval.heldout import HeldoutEvaluator

        clips = {
            vid: dataset.load_and_process_video(vid)["source_frames"]
            for vid in dataset.video_ids
        }
        evaluator = HeldoutEvaluator.for_gbase(gbase, clips, holdout,
                                               args.batch,
                                               burn_in=args.eval_burn_in,
                                               bn_mode=args.eval_bn_mode)
        if not evaluator.n_pairs:
            print("WARNING: no held-out eval pairs — check --holdout "
                  "vs clip lengths", flush=True)
    if args.pool:
        import jax.numpy as jnp

        pool_list = [next(batches) for _ in range(args.pool)]
        pool = {
            k: jnp.asarray(np.stack([b[k] for b in pool_list]))
            for k in pool_list[0]
        }
        rng = np.random.default_rng(1)
        print(f"pool of {args.pool} batches uploaded "
              f"({time.time() - t0:.1f}s)", flush=True)

    for i in range(args.steps):
        if args.pool:
            pi = int(rng.integers(args.pool))
            g_state, d_state, metrics, xhat = step(g_state, d_state, pool, pi)
            driving_img = pool_list[pi]["driving"]
        else:
            batch = next(batches)
            g_state, d_state, metrics, xhat = step(g_state, d_state, batch)
            driving_img = batch["driving"]
        if i == 0 or (i + 1) % args.log_every == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            if first_g is None:
                first_g = m["loss_G"]
            print(f"step {i + 1}: {m} ({time.time() - t0:.1f}s)", flush=True)
            save_image(np.asarray(xhat, dtype=np.float32),
                       f"output_images/overfit_pred_{i + 1}.png")
            save_image(driving_img,
                       f"output_images/overfit_target_{i + 1}.png")
        if evaluator is not None and (i + 1) % args.eval_every == 0:
            psnr, improved = evaluator.consider(g_state, i + 1)
            print(f"step {i + 1}: held-out self-PSNR {psnr:.2f} dB"
                  f"{'  <- best' if improved else ''} "
                  f"({time.time() - t0:.1f}s)", flush=True)
            if improved and export_mgr is not None:
                # Export the best snapshot AS SOON as it improves, not
                # only at the end — a tunnel outage mid-run must not
                # lose the trained model (the axon service has died
                # mid-session before; ROADMAP round 3). Async save: the
                # snapshot is already host-resident numpy (device_get in
                # consider()), so training continues while Orbax writes.
                export_mgr.save(i + 1,
                                {"g_variables": evaluator.best_variables})
                last_saved_step = i + 1
    final_g = float(metrics["loss_G"])
    print(f"loss_G: {first_g:.4f} -> {final_g:.4f} "
          f"({'DECREASED' if final_g < first_g else 'NOT DECREASED'})",
          flush=True)
    if evaluator is not None and evaluator.best_variables is not None:
        print(f"best held-out self-PSNR {evaluator.best_psnr:.2f} dB at "
              f"step {evaluator.best_step} (exporting THAT snapshot)",
              flush=True)

    if export_mgr is not None:
        from megaportraits_tpu.core.checkpoint import CheckpointManager

        final_variables = {"params": g_state.params}
        if g_state.batch_stats is not None:
            final_variables["batch_stats"] = g_state.batch_stats
        export_step = args.steps
        g_variables = final_variables
        if evaluator is not None:
            g_variables, best_step, is_best = evaluator.export_variables(
                g_state)
            if is_best:
                export_step = best_step
        if last_saved_step != export_step:
            # Guard on what THIS RUN wrote (ADVICE r4: a disk-state guard
            # can mistake a previous run's step for this run's save and
            # silently skip exporting the new weights).
            export_mgr.save(export_step, {"g_variables": g_variables},
                            wait=True)
        export_mgr.close()
        print(f"exported trained Gbase (step {export_step}) to "
              f"{args.export}", flush=True)
        if evaluator is not None and export_step != args.steps:
            # A single early noise spike can pin "best" to an
            # undertrained snapshot; keep the final state too so the
            # visually-better endpoint is never discarded (the gallery
            # chooses between them on evidence).
            mgr = CheckpointManager(args.export.rstrip("/") + "_final")
            mgr.save(args.steps, {"g_variables": final_variables},
                     wait=True)
            mgr.close()
            print(f"exported FINAL-state Gbase (step {args.steps}) to "
                  f"{args.export}_final", flush=True)


if __name__ == "__main__":
    main()
