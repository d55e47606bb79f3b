#!/usr/bin/env python
"""Student 1024^2 redesign quality validation (VERDICT r1 weak #8).

Distills the Student against the frozen GHR teacher on the overfit frames
and reports LPIPS(student, teacher) + pixel MSE over held-out driving
frames, with side-by-side PNG dumps — the quality evidence to sit next to
the 56 fps serving claim (benchmarks/RESULTS.md 'Student 1024x1024').

    python scripts/validate_student.py [--size 256] [--steps 300]
        [--out benchmarks/student_quality]

Teacher weights are random-init unless --gbase-ckpt points to a trained
export; the distillation target is the teacher's OUTPUT DISTRIBUTION either
way, so LPIPS(student, teacher) still measures how faithfully the student's
/8+/4-SPADE decoder can imitate the full teacher pipeline — the question
the redesign raised.
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--num-avatars", type=int, default=2)
    ap.add_argument("--out", default="benchmarks/student_quality")
    ap.add_argument("--video-dir", default="/root/reference/junk")
    ap.add_argument("--json-file",
                    default="/root/reference/data/overfit.json")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument(
        "--gbase-ckpt", default="",
        help="Orbax export of a TRAINED Gbase ({'g_variables': ...}); "
             "grafted into the teacher so the distillation target is a "
             "real reenactment distribution, not random-init noise "
             "(VERDICT r2 weak #2)",
    )
    ap.add_argument("--norm", choices=["batch", "group"], default="batch",
                    help="teacher Gbase/Genh ResBlock2D norm flavor — "
                         "must match the grafted checkpoints "
                         "(scripts/overfit.py --norm)")
    ap.add_argument("--teacher-bn-mode", choices=["batch", "running"],
                    default="batch",
                    help="teacher forward convention; 'running' (serving "
                         "convention) is right for norm=group teachers, "
                         "whose generator has no train/eval gap")
    ap.add_argument(
        "--genh-ckpt", default="",
        help="Orbax export of a TRAINED Genh ({'genh_variables': ...}, "
             "from benchmarks/hr_quality.py --export-genh). Without it "
             "the teacher is Gbase-only: a RANDOM Genh collapses the "
             "target to near-constant and 'perfect' scores are vacuous",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
    from megaportraits_tpu.models.genh import GHR
    from megaportraits_tpu.losses.perceptual import LPIPS
    from megaportraits_tpu.core.dtypes import FP32_POLICY
    from megaportraits_tpu.train.state import make_optimizer, TrainState
    from megaportraits_tpu.train.train_student import (
        init_student_state, make_student_train_step, make_teacher_forward,
    )

    cfg = Config()
    cfg.model.norm = args.norm
    cfg.data.train_width = cfg.data.train_height = args.size
    cfg.training.steps_per_epoch = args.steps
    cfg.training.student_epochs = 1
    cfg.training.num_avatars = args.num_avatars
    cfg.training.lr = args.lr

    rng = jax.random.PRNGKey(0)
    policy = DEFAULT_POLICY

    # Data: avatar a <- video a's frames (driving role).
    frames = _load_frames(args)
    print(f"loaded {sum(len(f) for f in frames)} frames over "
          f"{len(frames)} avatars")

    # fp32 teacher: the bf16 full-forward graph reliably crashes the
    # remote compile service at 128-256px (7/7 attempts; the fp32 graph
    # compiles) — and fp32 targets are the higher-fidelity distillation
    # reference anyway. The student itself stays bf16.
    teacher = GHR(policy=FP32_POLICY, arch=cfg.make_arch())
    dummy = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    t_vars = jax.jit(teacher.init)(rng, dummy, dummy)
    if args.gbase_ckpt:
        t_vars = _graft_gbase(t_vars, args.gbase_ckpt, args.size)
    if args.genh_ckpt:
        t_vars = _graft_genh(t_vars, args.genh_ckpt)
    include_enh = bool(args.genh_ckpt) or not args.gbase_ckpt
    if not include_enh:
        print("teacher: Gbase-only (no trained Genh provided — a random "
              "Genh would collapse the target distribution)")

    student, state = init_student_state(cfg, rng, policy, args.size)
    step = make_student_train_step(student, teacher, t_vars, cfg,
                                   donate=False)
    # batch-BN teacher: a small-batch-trained Gbase served with running
    # stats outputs a washed near-constant (BN train/eval gap — the other
    # cause of round 3's gray targets, besides the random Genh).
    teacher_fwd = make_teacher_forward(teacher, t_vars,
                                       include_enh=include_enh,
                                       bn_mode=args.teacher_bn_mode)

    rngn = np.random.default_rng(0)
    t0 = time.time()
    loss_curve = []
    for it in range(args.steps):
        batch = _sample_batch(frames, args.batch, rngn)
        batch["target01"] = teacher_fwd(batch["source"], batch["driving"])
        state, metrics = step(state, batch)
        if it % 50 == 0 or it == args.steps - 1:
            loss = float(metrics["loss_student"])
            loss_curve.append((it, loss))
            print(f"step {it}: distill MSE {loss:.5f} "
                  f"({(time.time() - t0):.0f}s)")

    # Held-out eval: LAST frame of each avatar (never sampled: sampler
    # draws from [0, n-1)).
    lp = LPIPS(policy=FP32_POLICY)
    lp_vars = jax.jit(lp.init)(rng, dummy.astype(jnp.float32),
                               dummy.astype(jnp.float32))
    lp_apply = jax.jit(lambda a, b: lp.apply(lp_vars, a, b))

    os.makedirs(args.out, exist_ok=True)
    rows = []
    s_vars = {"params": state.params}
    if state.batch_stats is not None:
        s_vars["batch_stats"] = state.batch_stats
    student_fwd = jax.jit(
        lambda v, xd, idx: student.apply(v, xd, idx).astype(jnp.float32)
    )
    for a, fs in enumerate(frames):
        xd = jnp.asarray(fs[-1])[None]
        xs = jnp.asarray(fs[0])[None]
        tgt01 = np.asarray(teacher_fwd(xs, xd))
        pred = np.asarray(student_fwd(s_vars, xd,
                                      jnp.asarray([a], jnp.int32)))
        mse = float(np.mean((pred - tgt01) ** 2))
        lpips_val = float(lp_apply(
            jnp.asarray(pred) * 2 - 1, jnp.asarray(tgt01) * 2 - 1)[0])
        rows.append((a, mse, lpips_val))
        _save_png(np.concatenate([tgt01[0], pred[0]], axis=1),
                  os.path.join(args.out, f"avatar{a}_teacher_vs_student.png"))
        print(f"avatar {a}: held-out MSE {mse:.5f}  LPIPS {lpips_val:.4f}")

    with open(os.path.join(args.out, "RESULTS.txt"), "w") as f:
        f.write(f"steps={args.steps} size={args.size} "
                f"avatars={args.num_avatars}\n")
        f.write(f"gbase_ckpt={args.gbase_ckpt or 'RANDOM-INIT'} "
                f"genh_ckpt={args.genh_ckpt or 'none'} "
                f"teacher={'GHR' if include_enh else 'Gbase-only'} "
                f"norm={args.norm} "
                f"teacher_bn_mode={args.teacher_bn_mode}\n")
        f.write("loss curve: " + ", ".join(
            f"{i}:{v:.5f}" for i, v in loss_curve) + "\n")
        for a, mse, lpips_val in rows:
            f.write(f"avatar {a}: heldout MSE {mse:.5f} "
                    f"LPIPS {lpips_val:.4f}\n")
    print(f"wrote {args.out}/RESULTS.txt")
    return 0


def _graft_gbase(t_vars, ckpt_path, size):
    """Restore a trained Gbase export ({'g_variables': ...}) into the GHR
    teacher's 'gbase' subtree (params + batch_stats)."""
    from megaportraits_tpu.core.checkpoint import CheckpointManager

    template = {"params": t_vars["params"]["gbase"]}
    if "batch_stats" in t_vars and "gbase" in t_vars["batch_stats"]:
        template["batch_stats"] = t_vars["batch_stats"]["gbase"]
    restored = None
    for path in (os.path.join(ckpt_path, "export"), ckpt_path):
        try:
            restored = CheckpointManager(path).restore(
                {"g_variables": template})
        except Exception as e:
            print(f"note: no restorable export at {path}: {e}")
            restored = None
        if restored is not None:
            break
    if restored is None:
        raise SystemExit(f"--gbase-ckpt: nothing restorable at {ckpt_path}")
    g = restored["g_variables"]
    t_vars = dict(t_vars)
    t_vars["params"] = dict(t_vars["params"])
    t_vars["params"]["gbase"] = g["params"]
    if "batch_stats" in g and "batch_stats" in t_vars:
        t_vars["batch_stats"] = dict(t_vars["batch_stats"])
        t_vars["batch_stats"]["gbase"] = g["batch_stats"]
    print(f"teacher: grafted trained Gbase from {ckpt_path}")
    return t_vars


def _graft_genh(t_vars, ckpt_path):
    """Restore a trained Genh export into the teacher's 'genh' subtree."""
    from megaportraits_tpu.core.checkpoint import CheckpointManager

    template = {"params": t_vars["params"]["genh"]}
    if "batch_stats" in t_vars and "genh" in t_vars["batch_stats"]:
        template["batch_stats"] = t_vars["batch_stats"]["genh"]
    restored = None
    for path in (os.path.join(ckpt_path, "export"), ckpt_path):
        try:
            restored = CheckpointManager(path).restore(
                {"genh_variables": template})
        except Exception as e:
            print(f"note: no restorable genh export at {path}: {e}")
            restored = None
        if restored is not None:
            break
    if restored is None:
        raise SystemExit(f"--genh-ckpt: nothing restorable at {ckpt_path}")
    g = restored["genh_variables"]
    t_vars = dict(t_vars)
    t_vars["params"] = dict(t_vars["params"])
    t_vars["params"]["genh"] = g["params"]
    if "batch_stats" in g and "batch_stats" in t_vars:
        t_vars["batch_stats"] = dict(t_vars["batch_stats"])
        t_vars["batch_stats"]["genh"] = g["batch_stats"]
    print(f"teacher: grafted trained Genh from {ckpt_path}")
    return t_vars


def _load_frames(args):
    import glob as _glob
    import json as _json
    import tempfile

    from megaportraits_tpu.data.dataset import EMODataset

    # One avatar per video: enumerate ALL clips in video_dir (overfit.json
    # lists only one) so multi-avatar SPADE conditioning is exercised.
    ids = sorted(os.path.splitext(os.path.basename(p))[0]
                 for p in _glob.glob(os.path.join(args.video_dir, "*.mp4")))
    meta = {"clips": {i: {} for i in ids}}
    tmp_json = os.path.join(tempfile.gettempdir(), "student_clips.json")
    with open(tmp_json, "w") as f:
        _json.dump(meta, f)
    os.makedirs("/tmp/megaportraits_cache", exist_ok=True)
    ds = EMODataset(
        width=args.size, height=args.size, n_sample_frames=8,
        sample_rate=25, video_dir=args.video_dir, json_file=tmp_json,
        cache_dir="/tmp/megaportraits_cache",
    )
    frames = []
    for a in range(min(args.num_avatars, len(ds))):
        frames.append(ds.load_and_process_video(
            ds.video_ids[a])["source_frames"])
    return frames


def _sample_batch(frames, batch, rngn):
    xs, xd, idx = [], [], []
    for _ in range(batch):
        a = int(rngn.integers(len(frames)))
        fs = frames[a]
        xs.append(fs[int(rngn.integers(len(fs) - 1))])
        xd.append(fs[int(rngn.integers(len(fs) - 1))])
        idx.append(a)
    return {
        "source": np.stack(xs), "driving": np.stack(xd),
        "avatar_index": np.asarray(idx, np.int32),
    }


def _save_png(img01, path):
    from PIL import Image

    Image.fromarray(
        (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    ).save(path)


if __name__ == "__main__":
    raise SystemExit(main())
