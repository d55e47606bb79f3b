"""Stage-1 quality gallery: committed visual evidence that the framework
produces faces (VERDICT r3 item 1 — the single most persuasive artifact).

Takes a trained Gbase export (scripts/overfit.py --export / main_base) and
writes triptych PNGs to a NON-gitignored path (benchmarks/stage1_quality/):

  train_<k>.png    source | driving | self-reenactment   (training frames)
  heldout_<k>.png  source | driving | self-reenactment   (held-out tail)
  cross_<k>.png    source A | driving B | cross-reenactment

plus RESULTS.txt with self-PSNR per set, the checkpoint provenance, and
the BN-recalibration setting.

--recalibrate N: refresh BatchNorm running statistics with N train-mode
forwards over training frames before eval-mode inference. Needed for
checkpoints trained before the round-4 batch-stats threading fix
(ADVICE r3 high): those kept appearance/synthesis BN stats frozen at
init, which is exactly why round-3's committed held-out outputs were gray
rectangles. Reference counterpart of the dumps: train.py:206-215.

    python benchmarks/stage1_gallery.py --gbase-ckpt checkpoints/overfit256
        [--size 256] [--recalibrate 8] [--out benchmarks/stage1_quality]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray) -> float:
    mse = float(np.mean((pred.astype(np.float32)
                         - target.astype(np.float32)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbase-ckpt", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--holdout", type=int, default=4)
    ap.add_argument("--per-clip", type=int, default=2,
                    help="triptychs per clip per set")
    ap.add_argument("--recalibrate", type=int, default=8,
                    help="train-mode forwards to refresh BN stats "
                         "(0 = trust the checkpoint's running stats)")
    ap.add_argument("--out", default="benchmarks/stage1_quality")
    ap.add_argument("--video-dir", default="/root/reference/junk")
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 forwards (use on CPU hosts: the axon "
                         "remote compile service crashes on bf16 full-"
                         "arch forwards at 128-256px — memory note)")
    ap.add_argument("--norm", choices=["batch", "group"], default="batch",
                    help="must match the checkpoint's ResBlock2D norm "
                         "flavor (scripts/overfit.py --norm)")
    ap.add_argument("--eval-batch", type=int, default=1,
                    help="batch DIVERSE pairs (round-robin across clips) "
                         "per forward in bn_mode=batch: the trained "
                         "generator's BN layers saw multi-image batch "
                         "statistics (train batch 2, 4-mix synthesis "
                         "concat = batch 8), and per-single-image stats "
                         "measurably degrade output")
    ap.add_argument("--bn-mode", choices=["running", "batch"],
                    default="batch",
                    help="BatchNorm statistics for prediction: 'running' "
                         "= eval-mode (the reference inference.py "
                         "convention); 'batch' = per-input batch stats "
                         "(the GAN-generator convention, e.g. torch "
                         "track_running_stats=False). At 4-clip overfit "
                         "scale the train/eval BN gap is large (measured: "
                         "running-stats output is a washed blob even "
                         "after exact recalibration); 'batch' shows what "
                         "the generator actually learned. Recorded in "
                         "RESULTS.txt.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from megaportraits_tpu.core.checkpoint import CheckpointManager
    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
    from megaportraits_tpu.data.dataset import EMODataset
    from megaportraits_tpu.utils.image import save_image

    t0 = time.time()
    size = args.size
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.model.norm = args.norm
    policy = FP32_POLICY if args.fp32 else DEFAULT_POLICY
    gbase = cfg.make_gbase(policy=policy)
    dummy = jnp.zeros((1, size, size, 3), policy.compute_dtype)
    g_vars = jax.jit(gbase.init)(jax.random.PRNGKey(0), dummy, dummy)
    restored = None
    for path in (os.path.join(args.gbase_ckpt, "export"), args.gbase_ckpt):
        try:
            restored = CheckpointManager(path).restore({"g_variables": g_vars})
        except Exception:
            restored = None
        if restored is not None:
            ckpt_path, ckpt_step = path, CheckpointManager(path).latest_step()
            break
    if restored is None:
        raise SystemExit(f"no restorable export under {args.gbase_ckpt}")
    g_vars = restored["g_variables"]
    print(f"restored {ckpt_path} step {ckpt_step} ({time.time() - t0:.0f}s)",
          flush=True)

    cache = "/tmp/megaportraits_cache"
    os.makedirs(cache, exist_ok=True)
    dataset = EMODataset(
        width=size, height=size, n_sample_frames=8, sample_rate=10,
        video_dir=args.video_dir,
        json_file="/root/reference/data/overfit.json", cache_dir=cache,
    )
    # Gallery over ALL clips in video_dir, not just overfit.json's one.
    dataset.video_ids = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(args.video_dir) if f.endswith(".mp4")
    )
    clips = {}
    for vid in dataset.video_ids:
        clips[vid] = dataset.load_and_process_video(vid)["source_frames"]
        print(f"frames ready: {vid} ({time.time() - t0:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # BN recalibration — EXACT, not EMA-chased: every _BatchNorm updates
    # running = 0.9*running + 0.1*batch (nn/blocks.py:191-194), so one
    # train-mode pass against the UNCHANGED checkpoint stats lets us
    # recover that pass's true batch statistics as 10*new - 9*old. The
    # final running stats are the mean of the recovered batch stats over
    # N passes — equivalent to torch's canonical BN-recalibration, and it
    # converges in N passes instead of the ~50+ an EMA chase needs.
    # ------------------------------------------------------------------
    if args.recalibrate and "batch_stats" in g_vars:
        recal = jax.jit(
            lambda v, a, b: gbase.apply(v, a, b, True,
                                        mutable=["batch_stats"])[1]
        )
        rng = np.random.default_rng(0)
        vids = list(clips)
        s0 = jax.device_get(g_vars["batch_stats"])
        acc = None
        for it in range(args.recalibrate):
            vid = vids[it % len(vids)]
            frames = clips[vid]
            n_train = max(1, len(frames) - args.holdout)
            i, k = rng.integers(n_train, size=2)
            xs = frames[int(i)][None].astype(np.float32)
            xd = frames[int(k)][None].astype(np.float32)
            new = jax.device_get(recal(g_vars, xs, xd)["batch_stats"])
            batch = jax.tree_util.tree_map(
                lambda n, o: 10.0 * np.asarray(n, np.float64)
                - 9.0 * np.asarray(o, np.float64), new, s0
            )
            acc = batch if acc is None else jax.tree_util.tree_map(
                np.add, acc, batch
            )
            print(f"recalibrate {it + 1}/{args.recalibrate} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        flat, treedef = jax.tree_util.tree_flatten_with_path(acc)
        leaves = []
        for path, leaf in flat:
            mean_stat = leaf / args.recalibrate
            keys = "/".join(str(getattr(k, "key", k)) for k in path)
            if "var" in keys:
                # Inversion noise can push tiny variances negative.
                mean_stat = np.maximum(mean_stat, 1e-4)
            leaves.append(np.asarray(mean_stat, np.float32))
        g_vars = {
            **g_vars,
            "batch_stats": jax.tree_util.tree_unflatten(treedef, leaves),
        }

    if args.bn_mode == "batch":
        fwd = jax.jit(
            lambda v, a, b: gbase.apply(
                v, a, b, True, mutable=["batch_stats"]
            )[0][0]
        )
    else:
        fwd = jax.jit(lambda v, a, b: gbase.apply(v, a, b, False)[0])

    os.makedirs(args.out, exist_ok=True)
    lines = [
        f"stage-1 quality gallery — checkpoint {ckpt_path} (step {ckpt_step})",
        f"size {size}, recalibrate {args.recalibrate}, holdout "
        f"{args.holdout}, policy {'fp32' if args.fp32 else 'bf16'}, "
        f"norm {args.norm}, bn_mode {args.bn_mode}, "
        f"eval_batch {args.eval_batch}",
        "layout: source | driving | prediction",
        "",
    ]

    def triptych(name, xs, xd, pred):
        row = np.concatenate(
            [xs.astype(np.float32), xd.astype(np.float32), pred], axis=1
        )
        save_image(row, os.path.join(args.out, name))

    # Build the request list interleaved ACROSS clips so each eval batch
    # carries diverse content (what the generator's BN layers trained on).
    vids = list(clips)
    per_clip_reqs = [[] for _ in vids]
    for ci, vid in enumerate(vids):
        frames = clips[vid]
        n_train = max(1, len(frames) - args.holdout)
        for k in range(args.per_clip):
            j = (1 + k * 3) % n_train
            per_clip_reqs[ci].append(
                ("train", f"train_{ci}_{k}.png", frames[0], frames[j])
            )
        for k in range(min(args.per_clip, args.holdout)):
            j = len(frames) - args.holdout + k
            if j <= 0:
                continue
            per_clip_reqs[ci].append(
                ("heldout", f"heldout_{ci}_{k}.png", frames[0], frames[j])
            )
        other = clips[vids[(ci + 1) % len(vids)]]
        per_clip_reqs[ci].append(
            ("cross", f"cross_{ci}.png", frames[0], other[1 % len(other)])
        )
    requests = []
    k = 0
    while any(len(r) > k for r in per_clip_reqs):
        for r in per_clip_reqs:
            if len(r) > k:
                requests.append(r[k])
        k += 1

    scores = {"train": [], "heldout": []}
    eb = max(1, args.eval_batch)
    for s0 in range(0, len(requests), eb):
        chunk = requests[s0:s0 + eb]
        # Pad the tail chunk to the jitted batch shape.
        padded = chunk + [chunk[-1]] * (eb - len(chunk))
        xs = np.stack([c[2] for c in padded]).astype(np.float32)
        xd = np.stack([c[3] for c in padded]).astype(np.float32)
        preds = np.clip(
            np.asarray(fwd(g_vars, xs, xd), dtype=np.float32), 0.0, 1.0
        )
        for (kind, name, s, d2), pred in zip(chunk, preds):
            if kind in scores:
                scores[kind].append(psnr(pred, d2))
            triptych(name, s, d2, pred)
        print(f"{min(s0 + eb, len(requests))}/{len(requests)} predictions "
              f"({time.time() - t0:.0f}s)", flush=True)

    for split in ("train", "heldout"):
        if scores[split]:
            lines.append(
                f"self-reenactment PSNR ({split}): "
                f"{np.mean(scores[split]):.2f} dB over "
                f"{len(scores[split])} pairs "
                f"(constant-image floor is ~10-12 dB)"
            )
    lines.append("cross-reenactment rows are visual-only (no ground truth).")
    with open(os.path.join(args.out, "RESULTS.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()
