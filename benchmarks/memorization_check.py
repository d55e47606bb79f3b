"""Memorization/identity-leak check over COMMITTED gallery triptychs.

VERDICT r4 item 5: round 3's `step3000/cross_1.png` emitted a memorized
frame of the WRONG clip and no committed number flagged it. This harness
demonstrates the new `memorization_index` metric (eval/metrics.py) on the
committed evidence itself — no checkpoint or TPU needed:

  1. split each gallery triptych (source | driving | prediction) into
     panels;
  2. establish the EXPECTED identity of each row from its source panel
     (source panels are real training frames, so their nearest training
     clip is ground truth by construction);
  3. run memorization_index on the prediction panel and report whether it
     stays nearest to the source-identity clip.

A cross-reenactment prediction whose nearest clip differs from its
source's is identity leakage. On the round-3 `step3000` gallery this must
flag the leak; a healthy export must score identity_match_rate 1.0.

    python benchmarks/memorization_check.py \
        [--gallery benchmarks/stage1_quality/step3000] [--size 256]

Reference intent: IdentitySimilarityLoss / CSIM
(/root/reference/model.py:2221-2261, train.py:57-60) — this is the
weights-free proxy for the same failure mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def split_triptych(img: np.ndarray) -> tuple:
    """source | driving | prediction, equal widths (stage1_gallery.py)."""
    w = img.shape[1] // 3
    return img[:, :w], img[:, w:2 * w], img[:, 2 * w:3 * w]


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery", default="benchmarks/stage1_quality/step3000")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--video-dir", default="/root/reference/junk")
    ap.add_argument("--json", dest="out_json", default=None,
                    help="write the full report to this path")
    args = ap.parse_args()

    from megaportraits_tpu.data.dataset import EMODataset
    from megaportraits_tpu.eval.metrics import load_image, memorization_index

    # Enumerate ALL clips (empty clips dict -> video_dir listing fallback).
    import tempfile

    tmp_json = os.path.join(tempfile.gettempdir(), "memcheck_clips.json")
    with open(tmp_json, "w") as f:
        json.dump({"clips": {}}, f)
    os.makedirs("/tmp/megaportraits_cache", exist_ok=True)
    ds = EMODataset(
        width=args.size, height=args.size, n_sample_frames=10,
        sample_rate=10, video_dir=args.video_dir, json_file=tmp_json,
        cache_dir="/tmp/megaportraits_cache",
    )
    clips = {
        vid: np.asarray(ds.load_and_process_video(vid)["source_frames"],
                        np.float32)
        for vid in ds.video_ids
    }
    print(f"clips: {sorted(clips)}")

    rows = []
    pngs = sorted(
        fn for fn in os.listdir(args.gallery) if fn.endswith(".png")
    )
    if not pngs:
        raise SystemExit(f"no PNGs under {args.gallery}")
    for fn in pngs:
        img = load_image(os.path.join(args.gallery, fn))
        src, _drv, pred = split_triptych(img)
        if src.shape[0] != args.size:  # resize panels to clip resolution
            from PIL import Image

            def rs(a):
                return np.asarray(
                    Image.fromarray((a * 255).astype(np.uint8)).resize(
                        (args.size, args.size)),
                    np.float32) / 255.0

            src, pred = rs(src), rs(pred)
        expected = memorization_index(src, clips)["nearest_clip"]
        mi = memorization_index(pred, clips)
        rows.append({
            "file": fn,
            "expected_clip": expected,
            "pred_nearest_clip": mi["nearest_clip"],
            "pred_nearest_l1": round(mi["nearest_l1"], 4),
            "pred_margin_l1": round(mi["margin_l1"], 4),
            "identity_ok": bool(mi["nearest_clip"] == expected),
        })

    def rate(subset):
        sel = [r for r in rows if subset(r["file"])]
        return (round(sum(r["identity_ok"] for r in sel) / len(sel), 3)
                if sel else None)

    report = {
        "gallery": args.gallery,
        "identity_match_rate_all": rate(lambda f: True),
        "identity_match_rate_cross": rate(lambda f: f.startswith("cross")),
        "identity_match_rate_self": rate(lambda f: not f.startswith("cross")),
        "rows": rows,
    }
    print(json.dumps(report, indent=2))
    leaks = [r for r in rows if not r["identity_ok"]]
    if leaks:
        print(f"IDENTITY LEAKAGE flagged in {len(leaks)}/{len(rows)} rows: "
              + ", ".join(f"{r['file']}->{r['pred_nearest_clip']}"
                          for r in leaks))
    else:
        print("no identity leakage flagged")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
