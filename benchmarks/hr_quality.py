"""Real super-resolution evidence for the HR stage (VERDICT r2 item 4).

The junk clips are 512^2 native, so a 256-base -> 512-HR run has REAL
high-res ground truth (the reference's train_hr assumed a 1024 dataset it
never had, train_highres.py:297-364). This harness:

  1. decodes frames at native 512 and anti-alias-downsamples to 256,
  2. runs the frozen (overfit-trained) Gbase at 256,
  3. trains Genh on bilinear-2x pre-upscaled base outputs against the
     NATIVE 512 driving frames (supervised + cycle + VGG terms,
     train/train_hr.py),
  4. reports held-out PSNR/SSIM of Genh output vs the bilinear-upsample
     baseline — the enhancer must beat plain interpolation to be real SR.

    python benchmarks/hr_quality.py --gbase-ckpt checkpoints/overfit256
        [--steps 200] [--out benchmarks/hr_quality]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--base-size", type=int, default=256)
    ap.add_argument("--upscale", type=int, default=2)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="benchmarks/hr_quality")
    ap.add_argument("--video-dir", default="/root/reference/junk")
    ap.add_argument("--json-file", default="/root/reference/data/overfit.json")
    ap.add_argument("--heldout", type=int, default=4)
    ap.add_argument(
        "--export-genh", default="",
        help="Orbax export dir for the trained Genh "
             "({'genh_variables': ...}; feeds validate_student --genh-ckpt)",
    )
    ap.add_argument("--norm", choices=["batch", "group"], default="batch",
                    help="ResBlock2D norm flavor for BOTH the restored "
                         "Gbase and the Genh trained here — must match "
                         "the checkpoint (scripts/overfit.py --norm)")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from megaportraits_tpu.core.checkpoint import CheckpointManager
    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
    from megaportraits_tpu.data.dataset import EMODataset
    from megaportraits_tpu.eval.metrics import calculate_psnr, calculate_ssim
    from megaportraits_tpu.ops.resize import linear_resize
    from megaportraits_tpu.train.train_hr import (
        init_hr_state, make_hr_train_step,
    )

    t0 = time.time()
    size, up = args.base_size, args.upscale
    hr_size = size * up
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.model.norm = args.norm
    cfg.training.steps_per_epoch = args.steps
    cfg.training.hr_epochs = 1
    cfg.training.lr = args.lr
    policy = DEFAULT_POLICY

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
            break
    if restored is None:
        raise SystemExit(f"no restorable export under {args.gbase_ckpt}")
    g_vars = restored["g_variables"]
    print(f"restored trained Gbase ({time.time() - t0:.0f}s)", flush=True)

    # Frames decoded at NATIVE HR resolution.
    os.makedirs("/tmp/megaportraits_cache", exist_ok=True)
    ds = EMODataset(
        width=hr_size, height=hr_size, n_sample_frames=16, sample_rate=10,
        video_dir=args.video_dir, json_file=args.json_file,
        cache_dir="/tmp/megaportraits_cache",
    )
    hr_frames = ds.load_and_process_video(ds.video_ids[0])["source_frames"]
    n_train = len(hr_frames) - args.heldout
    assert n_train >= 2, "need more decoded frames"

    def down(frames):
        return np.stack([
            cv2.resize(f, (size, size), interpolation=cv2.INTER_AREA)
            for f in frames
        ])

    lr_frames = down(hr_frames)
    print(f"decoded {len(hr_frames)} native-{hr_size} frames "
          f"({time.time() - t0:.0f}s)", flush=True)

    genh, ploss, p_vars, state = init_hr_state(
        cfg, jax.random.PRNGKey(1), policy, image_size=size, upscale=up
    )
    step = make_hr_train_step(genh, gbase, g_vars, ploss, p_vars, cfg,
                              upscale=up, donate=False)

    rng = np.random.default_rng(0)
    for it in range(args.steps):
        idx_s = rng.integers(n_train, size=args.batch)
        idx_d = (idx_s + 1 + rng.integers(n_train - 1,
                                          size=args.batch)) % n_train
        batch = {
            "source": lr_frames[idx_s],
            "driving": lr_frames[idx_d],
            "target_hr": hr_frames[idx_d],
        }
        state, metrics = step(state, batch)
        if it % 25 == 0 or it == args.steps - 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"hr step {it}: {m} ({time.time() - t0:.0f}s)", flush=True)

    # Held-out eval: Genh(upsampled base output) vs bilinear baseline,
    # both against the NATIVE HR frame.
    base_fwd = jax.jit(lambda v, xs, xd: gbase.apply(v, xs, xd)[0])
    genh_vars = {"params": state.params}
    if state.batch_stats is not None:
        genh_vars["batch_stats"] = state.batch_stats
    enh_fwd = jax.jit(
        lambda v, x: (genh.apply(v, x).astype(jnp.float32) + 1.0) * 0.5
    )

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for j in range(args.heldout):
        i = n_train + j
        src = jnp.asarray(lr_frames[0])[None].astype(policy.compute_dtype)
        drv = jnp.asarray(lr_frames[i])[None].astype(policy.compute_dtype)
        native = hr_frames[i]
        base = base_fwd(g_vars, src, drv)
        base_up = linear_resize(base.astype(jnp.float32),
                                (hr_size, hr_size), axes=(1, 2),
                                align_corners=False)
        enh = np.asarray(enh_fwd(
            genh_vars, base_up.astype(policy.compute_dtype)), np.float32)[0]
        base_up = np.asarray(base_up, np.float32)[0]
        rows.append({
            "frame": i,
            "psnr_bilinear": calculate_psnr(base_up, native),
            "psnr_genh": calculate_psnr(enh, native),
            "ssim_bilinear": calculate_ssim(base_up, native),
            "ssim_genh": calculate_ssim(enh, native),
        })
        side = np.concatenate([native, base_up, enh], axis=1)
        Image.fromarray(
            (np.clip(side, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(args.out, f"heldout_{j}_native_bilinear_genh.png"))

    with open(os.path.join(args.out, "RESULTS.txt"), "w") as f:
        f.write(f"steps={args.steps} base={size} hr={hr_size} "
                f"norm={args.norm} gbase_ckpt={args.gbase_ckpt} "
                f"(native-res supervision)\n")
        for r in rows:
            line = (f"frame {r['frame']}: PSNR bilinear {r['psnr_bilinear']:.2f}"
                    f" -> genh {r['psnr_genh']:.2f} | SSIM "
                    f"{r['ssim_bilinear']:.4f} -> {r['ssim_genh']:.4f}")
            print(line)
            f.write(line + "\n")
        mean_gain = float(np.mean([r["psnr_genh"] - r["psnr_bilinear"]
                                   for r in rows]))
        f.write(f"mean PSNR gain over bilinear: {mean_gain:+.2f} dB\n")
        print(f"mean PSNR gain over bilinear: {mean_gain:+.2f} dB")
    print(f"wrote {args.out}/RESULTS.txt")

    if args.export_genh:
        genh_variables = {"params": state.params}
        if state.batch_stats is not None:
            genh_variables["batch_stats"] = state.batch_stats
        mgr = CheckpointManager(args.export_genh)
        mgr.save(args.steps, {"genh_variables": genh_variables}, wait=True)
        mgr.close()
        print(f"exported trained Genh to {args.export_genh}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
