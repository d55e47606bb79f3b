#!/usr/bin/env python
"""One-command pretrained-weight pipeline.

    python scripts/convert_weights.py --weights-dir /path/to/pths \\
        --out pretrained/ [--golden-size 64] [--no-golden]

Scans ``--weights-dir`` for torch checkpoints, identifies each backbone by
its state_dict KEY SIGNATURE (filenames don't matter), converts every one
into our linen param trees, runs a per-backbone golden-activation check
(functional torch replay vs our JAX port, utils/torch_golden.py), and saves
a single Orbax bundle at ``--out`` that training/inference load via
utils/pretrained.load_bundle.

Which files to drop into --weights-dir (reference contract, SURVEY.md §2.5):

  backbone     | how the reference gets it              | what to save
  -------------|----------------------------------------|----------------------------------
  vgg19        | torchvision.models.vgg19(pretrained)   | torch.save(m.features.state_dict(), 'vgg19.pth')
  vgg16        | torchvision.models.vgg16(pretrained)   | torch.save(m.features.state_dict(), 'vgg16.pth')
               |   (the LPIPS-vgg trunk)                |
  lpips heads  | lpips.LPIPS(net='vgg')                 | torch.save(m.state_dict(), 'lpips_vgg.pth')
  vggface      | facenet_pytorch.InceptionResnetV1(     | torch.save(m.state_dict(), 'vggface2.pth')
               |   pretrained='vggface2')               |
  sixdrepnet   | 6DRepNet_300W_LP_AFLW2000.pth          | as downloaded (mysixdrepnet.py:792)
  fan          | face_alignment 2DFAN-4 (68 landmarks;  | as downloaded ('2DFAN4-….pth.tar');
               |   replaces the reference's dlib/       |   enables real AKD/AED + gaze
               |   MediaPipe landmark stack)            |   landmarks (data/landmarks.py)
  resnet18     | torchvision.models.resnet18(pretrained)| torch.save(m.state_dict(), 'resnet18.pth')
  resnet50     | torchvision.models.resnet50(pretrained)| torch.save(m.state_dict(), 'resnet50.pth')

Any subset works — missing backbones are reported and skipped. Full
state_dicts (e.g. the whole vgg19 with classifier) are accepted; only the
needed keys are read.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def identify(sd: dict) -> str:
    """Identify a backbone by state_dict key signature."""
    keys = set(sd.keys())

    def has(k):
        return k in keys

    if has("linear_reg.weight") and has("layer0.rbr_reparam.weight"):
        return "sixdrepnet"
    if has("m0.b1_4.bn1.weight"):
        return "fan"
    if has("lins.0.model.1.weight") or has("lin0.model.1.weight"):
        return "lpips"
    if has("conv2d_1a.conv.weight") and has("last_linear.weight"):
        return "vggface"
    if has("features.34.weight"):  # vgg19 features has convs up to idx 34
        return "vgg19"
    if has("features.28.weight") and not has("features.34.weight"):
        return "vgg16"
    if has("34.weight"):
        return "vgg19_features_only"
    if has("28.weight") and not has("34.weight"):
        return "vgg16_features_only"
    if has("layer1.0.conv1.weight"):
        if has("layer1.0.conv3.weight"):
            return "resnet50"
        return "resnet18"
    return "unknown"


def _convert_and_check(kind: str, sd: dict, golden_size: int, golden: bool):
    """Returns (bundle_key, payload, max_abs_err | None)."""
    import jax
    import jax.numpy as jnp

    from megaportraits_tpu.core.dtypes import FP32_POLICY
    from megaportraits_tpu.utils import torch_convert as tc
    from megaportraits_tpu.utils import torch_golden as tg

    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(0)
    x = rng.uniform(-1, 1, (1, golden_size, golden_size, 3)).astype(np.float32)
    x_nchw = np.transpose(x, (0, 3, 1, 2))

    if kind in ("vgg19", "vgg16", "vgg19_features_only", "vgg16_features_only"):
        cfg = "vgg19" if kind.startswith("vgg19") else "vgg16"
        params = tc.convert_vgg_features(sd, cfg)
        err = None
        if golden:
            from megaportraits_tpu.losses.perceptual import (
                VGG, VGG19_REFERENCE_TAPS, LPIPS_TAPS,
            )

            taps = VGG19_REFERENCE_TAPS if cfg == "vgg19" else LPIPS_TAPS
            net = VGG(cfg=cfg, taps=taps, policy=FP32_POLICY)
            init = jax.jit(net.init)(key, jnp.asarray(x))["params"]
            merged = tc.merge_params(init, params)
            ours = net.apply({"params": merged}, jnp.asarray(x))
            prefix = "features." if any(
                k.startswith("features.") for k in sd
            ) else ""
            refs = tg.golden_vgg_taps(sd, x_nchw, cfg, taps, prefix=prefix)
            err = max(
                float(np.abs(np.asarray(a) - b).max())
                for a, b in zip(ours, refs)
            )
        return cfg, params, err

    if kind == "lpips":
        params = tc.convert_lpips_linear_heads(sd)
        # Golden for the full LPIPS needs the vgg16 trunk too — checked in
        # the bundle-level pass (see main) once both are converted.
        return "lpips_heads", params, None

    if kind == "vggface":
        from megaportraits_tpu.losses.vggface import (
            InceptionResnetV1, convert_inception_resnet,
        )

        params = convert_inception_resnet(sd)
        err = None
        if golden:
            size = max(golden_size, 96)  # stem needs >=~80 px
            xx = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
            net = InceptionResnetV1(policy=FP32_POLICY)
            init = jax.jit(net.init, static_argnums=2)(key, jnp.asarray(xx), True)["params"]
            merged = tc.merge_params(init, params)
            emb, taps = net.apply({"params": merged}, jnp.asarray(xx), True)
            ref_emb, ref_taps = tg.golden_inception_taps(
                sd, np.transpose(xx, (0, 3, 1, 2))
            )
            err = float(np.abs(np.asarray(emb) - ref_emb).max())
            for a, b in zip(taps, ref_taps):
                err = max(err, float(np.abs(np.asarray(a) - b).max()))
        return "vggface", params, err

    if kind == "sixdrepnet":
        from megaportraits_tpu.models.repvgg import (
            SixDRepNet, rotation_6d_to_matrix,
        )

        params = tc.convert_sixdrepnet(sd)
        err = None
        if golden:
            net = SixDRepNet(policy=FP32_POLICY)
            init = jax.jit(net.init, static_argnums=2)(key, jnp.asarray(x), False)["params"]
            merged = tc.merge_params(init, params)
            rot, _ = net.apply({"params": merged}, jnp.asarray(x), False)
            six = tg.golden_sixdrepnet_6d(sd, x_nchw)
            ref_rot = rotation_6d_to_matrix(jnp.asarray(six))
            err = float(np.abs(np.asarray(rot) - np.asarray(ref_rot)).max())
        return "sixdrepnet", params, err

    if kind == "fan":
        from megaportraits_tpu.models.fan import FAN, convert_fan

        params, num_modules = convert_fan(sd)
        err = None
        if golden:
            size = max(golden_size, 64)
            xx = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
            net = FAN(num_modules=num_modules, policy=FP32_POLICY)
            init = jax.jit(net.init)(key, jnp.asarray(xx))["params"]
            merged = tc.merge_params(init, params)
            hm = net.apply({"params": merged}, jnp.asarray(xx))
            ref = tg.golden_fan(sd, np.transpose(xx, (0, 3, 1, 2)))
            # Relative: heatmap magnitudes scale with the (possibly
            # unnormalized) checkpoint; rounding noise scales with them.
            err = float(np.abs(np.asarray(hm) - ref).max()
                        / max(1.0, np.abs(ref).max()))
        return "fan", params, err

    if kind in ("resnet18", "resnet50"):
        bottleneck = kind == "resnet50"
        layers = (3, 4, 6, 3) if bottleneck else (2, 2, 2, 2)
        params, stats = tc.convert_torchvision_resnet(
            sd, layers=layers, bottleneck=bottleneck
        )
        err = None
        if golden:
            from megaportraits_tpu.models.resnet import (
                BasicBlock, Bottleneck, _ResNetTrunk,
            )

            block = Bottleneck if bottleneck else BasicBlock
            trunk = _ResNetTrunk(block, layers, policy=FP32_POLICY)
            variables = jax.jit(trunk.init, static_argnums=2)(key, jnp.asarray(x), False)
            merged_p = tc.merge_params(variables["params"], params["trunk"])
            merged_s = tc.merge_params(
                variables["batch_stats"], stats["trunk"]
            )
            feats = trunk.apply(
                {"params": merged_p, "batch_stats": merged_s},
                jnp.asarray(x), False,
            )
            pooled = np.asarray(feats).mean(axis=(1, 2))
            ref = tg.golden_resnet(sd, x_nchw, layers=layers,
                                   bottleneck=bottleneck, fc=False)
            err = float(np.abs(pooled - ref).max())
        return kind, {"params": params, "batch_stats": stats}, err

    raise ValueError(f"cannot convert backbone kind {kind!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--weights-dir", required=True)
    ap.add_argument("--out", default="pretrained")
    ap.add_argument("--golden-size", type=int, default=64)
    ap.add_argument("--no-golden", action="store_true")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max golden activation error tolerated")
    args = ap.parse_args(argv)

    # Golden checks compare against torch float32: force full-precision
    # matmuls/convs (TPU default precision is bf16-grade and fails the tol).
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    from megaportraits_tpu.utils.torch_convert import load_state_dict

    files = sorted(
        glob.glob(os.path.join(args.weights_dir, "*.pth"))
        + glob.glob(os.path.join(args.weights_dir, "*.pt"))
    )
    if not files:
        print(f"no .pth/.pt files in {args.weights_dir}", file=sys.stderr)
        return 1

    bundle: dict = {}
    report: dict = {}
    raw_sds: dict = {}
    ok = True
    for path in files:
        try:
            sd = load_state_dict(path)
        except Exception as e:  # unreadable file: report, keep going
            print(f"SKIP {os.path.basename(path)}: {e}")
            continue
        kind = identify(sd)
        if kind == "unknown":
            print(f"SKIP {os.path.basename(path)}: unrecognized state_dict")
            continue
        bkey, payload, err = _convert_and_check(
            kind, sd, args.golden_size, not args.no_golden
        )
        bundle[bkey] = payload
        raw_sds[bkey] = sd
        status = "converted"
        if err is not None:
            status = f"golden max|err|={err:.2e}"
            if err > args.tol:
                status += f"  FAIL (tol {args.tol})"
                ok = False
        print(f"{os.path.basename(path):30s} -> {bkey:12s} {status}")
        report[bkey] = {"file": os.path.basename(path), "golden_err": err}

    # Bundle-level golden: full LPIPS needs heads + vgg16 trunk together.
    if not args.no_golden and "lpips_heads" in bundle and "vgg16" in bundle:
        import jax
        import jax.numpy as jnp

        from megaportraits_tpu.core.dtypes import FP32_POLICY
        from megaportraits_tpu.losses.perceptual import LPIPS
        from megaportraits_tpu.utils import torch_convert as tc
        from megaportraits_tpu.utils import torch_golden as tg

        rng = np.random.default_rng(11)
        s = args.golden_size
        x = rng.uniform(-1, 1, (1, s, s, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (1, s, s, 3)).astype(np.float32)
        net = LPIPS(policy=FP32_POLICY)
        init = net.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(y))["params"]
        merged = tc.merge_params(
            init, {"vgg16": bundle["vgg16"], **bundle["lpips_heads"]}
        )
        ours = np.asarray(
            net.apply({"params": merged}, jnp.asarray(x), jnp.asarray(y))
        )
        vgg16_sd = raw_sds["vgg16"]
        prefix_sd = vgg16_sd if any(
            k.startswith("features.") for k in vgg16_sd
        ) else {f"features.{k}": v for k, v in vgg16_sd.items()}
        ref = tg.golden_lpips(
            raw_sds["lpips_heads"], prefix_sd,
            np.transpose(x, (0, 3, 1, 2)), np.transpose(y, (0, 3, 1, 2)),
        )
        err = float(np.abs(ours - ref).max())
        status = f"golden max|err|={err:.2e}"
        if err > args.tol:
            status += f"  FAIL (tol {args.tol})"
            ok = False
        print(f"{'(vgg16 + lpips heads)':30s} -> {'lpips':12s} {status}")
        report["lpips_full"] = {"golden_err": err}

    if not bundle:
        print("nothing converted", file=sys.stderr)
        return 1

    from megaportraits_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(args.out, max_to_keep=1)
    mgr.save(0, bundle, wait=True)
    mgr.close()
    with open(os.path.join(args.out, "CONVERT_REPORT.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"saved bundle ({sorted(bundle)}) to {args.out}")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
