"""End-to-end eval table (VERDICT r2 'Next round' item 3).

Closes the loop the reference runs manually (reference metrics.py:61-102):
train stage-1 (scripts/overfit.py --export ...) -> dump self-reenactment
and cross-reenactment frames -> evaluate_metrics -> one committed table.

    python benchmarks/eval_table.py --gbase-ckpt checkpoints/overfit256
        [--size 256] [--pairs 8] [--out /tmp/eval_frames]

File naming matches the reference trainer's dumps (train.py:206-215,
284-285): pred_frame_<k>.png for self-reenactment (target = the driving
frame), cross_reenactment_images_<k>.png for the cross pass (compared
against the driving frame: pixel metrics are indicative only there, AKD is
the meaningful column). Landmark/embedding providers are auto-installed
from a converted-weight bundle when one exists (eval/metrics.py); without
one, AKD uses the face-box proxy and the caveat is printed with the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbase-ckpt", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--out", default="/tmp/eval_frames")
    ap.add_argument("--video-dir", default="/root/reference/junk")
    ap.add_argument("--json-file", default="/root/reference/data/overfit.json")
    ap.add_argument("--pretrained", default="./pretrained")
    ap.add_argument("--bn-mode", choices=["running", "batch"],
                    default="running",
                    help="BatchNorm stats for the forwards (see "
                         "stage1_gallery.py --bn-mode; 'batch' for "
                         "small-batch-trained checkpoints)")
    ap.add_argument("--norm", choices=["batch", "group"], default="batch",
                    help="must match the checkpoint's ResBlock2D norm "
                         "flavor (scripts/overfit.py --norm)")
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 forwards (CPU hosts; bf16 full-arch "
                         "forwards crash the remote compile service "
                         "at 128-256px)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from megaportraits_tpu.core.checkpoint import CheckpointManager
    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
    from megaportraits_tpu.data.dataset import EMODataset
    from megaportraits_tpu.eval.metrics import evaluate_metrics

    t0 = time.time()
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = args.size
    cfg.model.norm = args.norm
    policy = FP32_POLICY if args.fp32 else DEFAULT_POLICY
    gbase = cfg.make_gbase(policy=policy)
    dummy = jnp.zeros((1, args.size, args.size, 3), policy.compute_dtype)
    g_vars = jax.jit(gbase.init)(jax.random.PRNGKey(0), dummy, dummy)
    restored = None
    for path in (os.path.join(args.gbase_ckpt, "export"), args.gbase_ckpt):
        try:
            restored = CheckpointManager(path).restore({"g_variables": g_vars})
        except Exception:
            restored = None
        if restored is not None:
            break
    if restored is None:
        raise SystemExit(f"no restorable export under {args.gbase_ckpt}")
    g_vars = restored["g_variables"]
    print(f"restored trained Gbase from {args.gbase_ckpt} "
          f"({time.time() - t0:.0f}s)")

    os.makedirs("/tmp/megaportraits_cache", exist_ok=True)
    # Enumerate ALL clips in video_dir (overfit.json lists only one —
    # a star source from the same clip would make cross == self): an empty
    # clips dict makes EMODataset fall back to the video_dir listing.
    import tempfile

    tmp_json = os.path.join(tempfile.gettempdir(), "eval_clips.json")
    with open(tmp_json, "w") as f:
        json.dump({"clips": {}}, f)
    ds = EMODataset(
        width=args.size, height=args.size, n_sample_frames=args.pairs + 2,
        sample_rate=10, video_dir=args.video_dir, json_file=tmp_json,
        cache_dir="/tmp/megaportraits_cache",
    )
    assert len(ds.video_ids) >= 2, "need >=2 clips for cross-reenactment"
    frames = ds.load_and_process_video(ds.video_ids[0])["source_frames"]
    frames_star = ds.load_and_process_video(ds.video_ids[1])["source_frames"]

    # Streaming split path (encode_source once, drive per frame): the fused
    # bf16 full-forward graph at 128-256px reliably crashes the remote
    # compile service (benchmarks/RESULTS.md round 2); the split graphs
    # compile, and this is the production serving path anyway.
    from megaportraits_tpu.models.gbase import Gbase as _G

    if args.bn_mode == "batch":
        # Per-input batch statistics (see stage1_gallery.py --bn-mode):
        # small-batch-trained checkpoints are served this way.
        encode = jax.jit(lambda v, x: gbase.apply(
            v, x, True, method=_G.encode_source,
            mutable=["batch_stats"])[0])
        drive = jax.jit(lambda v, s, xd: gbase.apply(
            v, s, xd, True, method=_G.drive, mutable=["batch_stats"])[0])
    else:
        encode = jax.jit(
            lambda v, x: gbase.apply(v, x, method=_G.encode_source)
        )
        drive = jax.jit(
            lambda v, s, xd: gbase.apply(v, s, xd, method=_G.drive)
        )

    def fwd_factory(v, xs):
        state = encode(v, xs)
        return lambda xd: drive(v, state, xd)

    pred_dir = os.path.join(args.out, "pred")
    tgt_dir = os.path.join(args.out, "target")
    cross_dir = os.path.join(args.out, "cross")
    cross_tgt_dir = os.path.join(args.out, "cross_target")
    for d in (pred_dir, tgt_dir, cross_dir, cross_tgt_dir):
        os.makedirs(d, exist_ok=True)

    def save(img01, path):
        Image.fromarray(
            (np.clip(np.asarray(img01, np.float32), 0, 1) * 255).astype(
                np.uint8)
        ).save(path)

    src = jnp.asarray(frames[0])[None].astype(policy.compute_dtype)
    src_star = jnp.asarray(frames_star[0])[None].astype(policy.compute_dtype)
    fwd_self = fwd_factory(g_vars, src)
    fwd_cross = fwd_factory(g_vars, src_star)
    for k in range(args.pairs):
        drv_np = frames[(k + 1) % len(frames)]
        drv = jnp.asarray(drv_np)[None].astype(policy.compute_dtype)
        pred = np.asarray(fwd_self(drv), np.float32)[0]
        cross = np.asarray(fwd_cross(drv), np.float32)[0]
        save(pred, os.path.join(pred_dir, f"pred_frame_{k}.png"))
        save(drv_np, os.path.join(tgt_dir, f"pred_frame_{k}.png"))
        save(cross,
             os.path.join(cross_dir, f"cross_reenactment_images_{k}.png"))
        save(drv_np,
             os.path.join(cross_tgt_dir, f"cross_reenactment_images_{k}.png"))
    print(f"dumped {args.pairs} self + {args.pairs} cross frames "
          f"({time.time() - t0:.0f}s)")

    # Self-reenactment: pixel metrics are meaningful (target IS the driving
    # frame). Cross-reenactment vs the driving frame: only the motion
    # metrics (AKD) are meaningful — identity differs by construction.
    table = evaluate_metrics(pred_dir, tgt_dir,
                             pretrained_path=args.pretrained)
    cross_table = evaluate_metrics(cross_dir, cross_tgt_dir,
                                   pretrained_path=args.pretrained)

    # Identity/memorization check (VERDICT r4 item 5): for every dumped
    # prediction, which training clip is it nearest to (per-clip min-L1)?
    # A cross output must stay nearest to its SOURCE-identity clip; a
    # wrong-clip nearest is memorization/identity leakage that the pixel
    # metrics above cannot see. Provider-free (pure pixel L1).
    from megaportraits_tpu.eval.metrics import (
        load_image, memorization_index,
    )

    all_clips = {
        vid: ds.load_and_process_video(vid)["source_frames"]
        for vid in ds.video_ids
    }

    def identity_report(dump_dir, expected_vid):
        rows, match = [], 0
        for fn in sorted(os.listdir(dump_dir)):
            mi = memorization_index(load_image(os.path.join(dump_dir, fn)),
                                    all_clips)
            ok = mi["nearest_clip"] == expected_vid
            match += ok
            rows.append({"file": fn, "nearest_clip": mi["nearest_clip"],
                         "nearest_l1": round(mi["nearest_l1"], 4),
                         "margin_l1": round(mi["margin_l1"], 4),
                         "identity_ok": bool(ok)})
        n = max(len(rows), 1)
        return {"expected_clip": expected_vid,
                "identity_match_rate": round(match / n, 3), "rows": rows}

    self_id = identity_report(pred_dir, ds.video_ids[0])
    cross_id = identity_report(cross_dir, ds.video_ids[1])
    table["identity_match_rate"] = self_id["identity_match_rate"]
    cross_table["identity_match_rate"] = cross_id["identity_match_rate"]

    bundle_present = table.get("AED_formula") == "identity_embedding"
    print("self-reenactment:", json.dumps(table, indent=2))
    print("cross-reenactment (motion metrics only are meaningful):",
          json.dumps(cross_table, indent=2))
    print("identity/memorization (nearest training clip per prediction):")
    print("  self:", json.dumps(self_id, indent=2))
    print("  cross:", json.dumps(cross_id, indent=2))
    if not bundle_present:
        print("caveat: no converted-weight bundle installed — AKD/AED use "
              "the face-box landmark proxy and LPIPS is unavailable "
              "(drop real .pth files into scripts/convert_weights.py to "
              "upgrade the columns)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
