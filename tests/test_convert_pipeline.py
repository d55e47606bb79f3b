"""End-to-end weight-conversion pipeline test (VERDICT r1 item #3).

Generates torch state_dict FIXTURES with the exact key naming of each
pretrained dependency (torchvision vgg19/vgg16/resnet18, lpips heads,
facenet InceptionResnetV1, deploy-mode SixDRepNet RepVGG-B1g2), runs
``scripts/convert_weights.py`` end-to-end (identify -> convert -> golden
activation check -> Orbax bundle), and grafts the bundle into live
PerceptualLoss / Gbase variables.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import convert_weights  # noqa: E402

RNG = np.random.default_rng(123)


def _rand_sd(spec: dict) -> dict:
    sd = {}
    for key, shape in spec.items():
        if key.endswith("running_var"):
            arr = RNG.uniform(0.5, 1.5, shape)
        elif key.endswith("running_mean"):
            arr = RNG.uniform(-0.3, 0.3, shape)
        elif key.endswith(".weight") and len(shape) == 1:
            # BN scale: near 1 — wild random scales amplify activations
            # geometrically through deep stacks (FAN: ~50 ConvBlocks) and
            # swamp golden fp32 tolerances with pure rounding noise.
            arr = RNG.uniform(0.8, 1.2, shape)
        elif key.endswith(".bias") and len(shape) == 1:
            arr = RNG.normal(0, 0.1, shape)
        else:
            fan = max(int(np.prod(shape[1:])), 1)
            arr = RNG.normal(0, (2.0 / fan) ** 0.5, shape)
        sd[key] = torch.from_numpy(arr.astype(np.float32))
    return sd


def _vgg_features_sd(cfg_name: str) -> dict:
    cfgs = {
        "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512, "M"],
        "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                  512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
    }
    spec = {}
    in_ch, layer = 3, 0
    for v in cfgs[cfg_name]:
        if v == "M":
            layer += 1
            continue
        spec[f"features.{layer}.weight"] = (v, in_ch, 3, 3)
        spec[f"features.{layer}.bias"] = (v,)
        in_ch = v
        layer += 2
    return _rand_sd(spec)


def _lpips_sd() -> dict:
    chans = (64, 128, 256, 512, 512)
    return _rand_sd(
        {f"lins.{i}.model.1.weight": (1, c, 1, 1) for i, c in enumerate(chans)}
    )


def _resnet18_sd() -> dict:
    spec = {"conv1.weight": (64, 3, 7, 7)}
    for stat in ("weight", "bias", "running_mean", "running_var"):
        spec[f"bn1.{stat}"] = (64,)
    widths = (64, 128, 256, 512)
    for s, w in enumerate(widths):
        inp = 64 if s == 0 else widths[s - 1]
        for b in range(2):
            p = f"layer{s + 1}.{b}"
            cin = inp if b == 0 else w
            spec[f"{p}.conv1.weight"] = (w, cin, 3, 3)
            spec[f"{p}.conv2.weight"] = (w, w, 3, 3)
            for bn in ("bn1", "bn2"):
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    spec[f"{p}.{bn}.{stat}"] = (w,)
            if b == 0 and (s > 0):
                spec[f"{p}.downsample.0.weight"] = (w, cin, 1, 1)
                for stat in ("weight", "bias", "running_mean",
                             "running_var"):
                    spec[f"{p}.downsample.1.{stat}"] = (w,)
    spec["fc.weight"] = (1000, 512)
    spec["fc.bias"] = (1000,)
    return _rand_sd(spec)


def _sixdrepnet_sd() -> dict:
    """Deploy-mode RepVGG-B1g2 (mysixdrepnet.py layout: layer0,
    layer{1..4}.{i}.rbr_reparam, linear_reg)."""
    from megaportraits_tpu.models.repvgg import (
        REPVGG_CONFIGS, _OPTIONAL_GROUPWISE_LAYERS,
    )

    cfg = REPVGG_CONFIGS["RepVGG-B1g2"]
    widths = cfg["widths"]
    spec = {}
    in_planes = min(64, int(64 * widths[0]))
    spec["layer0.rbr_reparam.weight"] = (in_planes, 3, 3, 3)
    spec["layer0.rbr_reparam.bias"] = (in_planes,)
    stage_planes = [int(64 * widths[0]), int(128 * widths[1]),
                    int(256 * widths[2]), int(512 * widths[3])]
    layer_idx = 1
    cin = in_planes
    for stage, (planes, n) in enumerate(zip(stage_planes, cfg["blocks"])):
        for i in range(n):
            g = cfg["g"] if layer_idx in _OPTIONAL_GROUPWISE_LAYERS else 1
            spec[f"layer{stage + 1}.{i}.rbr_reparam.weight"] = (
                planes, cin // g, 3, 3
            )
            spec[f"layer{stage + 1}.{i}.rbr_reparam.bias"] = (planes,)
            cin = planes
            layer_idx += 1
    spec["linear_reg.weight"] = (6, stage_planes[-1])
    spec["linear_reg.bias"] = (6,)
    return _rand_sd(spec)


def _facenet_sd() -> dict:
    from megaportraits_tpu.utils.torch_golden import inception_state_dict_spec

    return _rand_sd(inception_state_dict_spec())


def _fan_sd(num_modules: int = 2) -> dict:
    """face_alignment 2DFAN-style state_dict (num_modules hourglass stacks;
    the real 2DFAN4 has 4 — 2 keeps CI cheap, the layout is identical)."""
    spec = {}

    def bn(prefix, c):
        for stat in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{prefix}.{stat}"] = (c,)

    def convblock(prefix, cin, cout):
        bn(f"{prefix}.bn1", cin)
        spec[f"{prefix}.conv1.weight"] = (cout // 2, cin, 3, 3)
        bn(f"{prefix}.bn2", cout // 2)
        spec[f"{prefix}.conv2.weight"] = (cout // 4, cout // 2, 3, 3)
        bn(f"{prefix}.bn3", cout // 4)
        spec[f"{prefix}.conv3.weight"] = (cout // 4, cout // 4, 3, 3)
        if cin != cout:
            bn(f"{prefix}.downsample.0", cin)
            spec[f"{prefix}.downsample.2.weight"] = (cout, cin, 1, 1)

    spec["conv1.weight"] = (64, 3, 7, 7)
    spec["conv1.bias"] = (64,)
    bn("bn1", 64)
    convblock("conv2", 64, 128)
    convblock("conv3", 128, 128)
    convblock("conv4", 128, 256)
    for i in range(num_modules):
        for lvl in (4, 3, 2, 1):
            convblock(f"m{i}.b1_{lvl}", 256, 256)
            convblock(f"m{i}.b2_{lvl}", 256, 256)
            convblock(f"m{i}.b3_{lvl}", 256, 256)
        convblock(f"m{i}.b2_plus_1", 256, 256)
        convblock(f"top_m_{i}", 256, 256)
        spec[f"conv_last{i}.weight"] = (256, 256, 1, 1)
        spec[f"conv_last{i}.bias"] = (256,)
        bn(f"bn_end{i}", 256)
        spec[f"l{i}.weight"] = (68, 256, 1, 1)
        spec[f"l{i}.bias"] = (68,)
        if i < num_modules - 1:
            spec[f"bl{i}.weight"] = (256, 256, 1, 1)
            spec[f"bl{i}.bias"] = (256,)
            spec[f"al{i}.weight"] = (256, 68, 1, 1)
            spec[f"al{i}.bias"] = (256,)
    return _rand_sd(spec)


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("weights")
    torch.save(_vgg_features_sd("vgg19"), d / "some_vgg19_file.pth")
    torch.save(_vgg_features_sd("vgg16"), d / "trunk16.pth")
    torch.save(_lpips_sd(), d / "lpips_vgg.pth")
    torch.save(_resnet18_sd(), d / "rn18.pth")
    torch.save(_sixdrepnet_sd(), d / "6DRepNet_300W_LP_AFLW2000.pth")
    torch.save(_facenet_sd(), d / "vggface2.pth")
    torch.save(_fan_sd(), d / "2DFAN4-landmarks.pth")
    return str(d)


def test_identify_by_signature(weights_dir):
    from megaportraits_tpu.utils.torch_convert import load_state_dict

    kinds = {
        "some_vgg19_file.pth": "vgg19",
        "trunk16.pth": "vgg16",
        "lpips_vgg.pth": "lpips",
        "rn18.pth": "resnet18",
        "6DRepNet_300W_LP_AFLW2000.pth": "sixdrepnet",
        "vggface2.pth": "vggface",
        "2DFAN4-landmarks.pth": "fan",
    }
    for fname, kind in kinds.items():
        sd = load_state_dict(os.path.join(weights_dir, fname))
        assert convert_weights.identify(sd) == kind, fname


@pytest.mark.slow
def test_pipeline_end_to_end(weights_dir, tmp_path):
    """The one command: converts all six fixtures, every golden check must
    pass, and the Orbax bundle must graft into live model variables."""
    out = str(tmp_path / "bundle")
    rc = convert_weights.main([
        "--weights-dir", weights_dir, "--out", out, "--golden-size", "32",
    ])
    assert rc == 0  # rc=2 would mean a golden check failed

    from megaportraits_tpu.utils.pretrained import (
        load_bundle, apply_to_gbase, apply_to_perceptual,
    )

    bundle = load_bundle(out)
    assert set(bundle) >= {"vgg19", "vgg16", "lpips_heads", "vggface",
                           "sixdrepnet", "resnet18", "fan"}

    import jax
    import jax.numpy as jnp

    from megaportraits_tpu.core.dtypes import FP32_POLICY
    from megaportraits_tpu.losses.perceptual import PerceptualLoss
    from megaportraits_tpu.models.gbase import Gbase

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ploss = PerceptualLoss(policy=FP32_POLICY, use_vggface=False)
    p_vars = ploss.init(jax.random.PRNGKey(0), x, x)
    p_vars2, n_p = apply_to_perceptual(p_vars, bundle)
    assert n_p == 63  # vgg19 (16 convs x2) + vgg16 (13 x2) + 5 lpips heads

    model = Gbase(policy=FP32_POLICY)
    g_vars = model.init(jax.random.PRNGKey(0), x, x)
    g_vars2, n_g = apply_to_gbase(g_vars, bundle)
    assert n_g > 50  # sixdrepnet + 2 resnet18 trunks

    # Grafted weights actually flow: loss value changes.
    before = float(ploss.apply(p_vars, x, x + 0.1))
    after = float(ploss.apply(p_vars2, x, x + 0.1))
    assert before != after
