"""PyTorch state_dict -> JAX params converters.

SURVEY.md section 2.5: the pipeline's loss/pose backbones are pretrained
torch checkpoints (VGG19/VGG16, LPIPS linear heads, SixDRepNet/RepVGG,
resnet18/50). This module converts their state_dicts into our linen param
trees. torch (CPU) is baked into the image; checkpoint *files* must be
provided by the user (no network egress here).

Conventions:
  conv:   torch [O, I, kh, kw]   -> HWIO  [kh, kw, I, O]
  conv3d: torch [O, I, kd, kh, kw] -> DHWIO
  linear: torch [O, I]           -> [I, O]
  BN:     weight/bias/running_mean/running_var -> scale/bias + batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def conv_kernel(w) -> np.ndarray:
    w = _t(w)
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"unexpected conv weight rank {w.ndim}")


def linear_kernel(w) -> np.ndarray:
    return np.transpose(_t(w), (1, 0))


def load_state_dict(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", ""): v for k, v in sd.items()}


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    params = {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_vgg_features(sd: Dict[str, Any], cfg: str = "vgg19") -> dict:
    """torchvision vgg{16,19}.features state_dict -> losses.perceptual.VGG
    params ({conv{s}_{i}: {kernel, bias}})."""
    convs_per_stage = {"vgg16": (2, 2, 3, 3, 3), "vgg19": (2, 2, 4, 4, 4)}[cfg]
    params = {}
    layer = 0
    for stage, n_convs in enumerate(convs_per_stage):
        for i in range(n_convs):
            w = sd[f"features.{layer}.weight"] if f"features.{layer}.weight" \
                in sd else sd[f"{layer}.weight"]
            b = sd.get(f"features.{layer}.bias", sd.get(f"{layer}.bias"))
            params[f"conv{stage + 1}_{i + 1}"] = {
                "Conv_0": {"kernel": conv_kernel(w), "bias": _t(b)}
            }
            layer += 2  # conv + relu
        layer += 1  # maxpool
    return params


def convert_lpips_linear_heads(sd: Dict[str, Any]) -> dict:
    """lpips.LPIPS(net='vgg') lin layers -> losses.perceptual.LPIPS heads."""
    params = {}
    for i in range(5):
        key = f"lins.{i}.model.1.weight"
        if key not in sd:
            key = f"lin{i}.model.1.weight"
        params[f"lin{i}"] = {"Conv_0": {"kernel": conv_kernel(sd[key])}}
    return params


def _conv_entry(w, b=None) -> dict:
    entry = {"kernel": conv_kernel(w)}
    if b is not None:
        entry["bias"] = _t(b)
    return {"Conv_0": entry}


def convert_torchvision_resnet(
    sd: Dict[str, Any], layers=(2, 2, 2, 2), bottleneck: bool = False,
    num_stages: int = 4, fc: bool = True,
) -> Tuple[dict, dict]:
    """torchvision resnet state_dict -> (_ResNetTrunk params, batch_stats).

    Returns trees keyed to models.resnet naming: trunk/{conv1,bn1,
    layer{s}_block{i}/{conv1,bn1,conv2,bn2,conv3,bn3,downsample_*}} (+ fc).
    """
    params: dict = {"trunk": {}}
    stats: dict = {"trunk": {}}
    params["trunk"]["conv1"] = _conv_entry(sd["conv1.weight"])
    bn_p, bn_s = _bn(sd, "bn1")
    params["trunk"]["bn1"] = {"BatchNorm_0": bn_p}
    stats["trunk"]["bn1"] = {"BatchNorm_0": bn_s}

    n_convs = 3 if bottleneck else 2
    for stage in range(num_stages):
        for block in range(layers[stage]):
            name = f"layer{stage + 1}_block{block}"
            tp = f"layer{stage + 1}.{block}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = _conv_entry(sd[f"{tp}.conv{ci}.weight"])
                p, s = _bn(sd, f"{tp}.bn{ci}")
                bp[f"bn{ci}"] = {"BatchNorm_0": p}
                bs[f"bn{ci}"] = {"BatchNorm_0": s}
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv_entry(
                    sd[f"{tp}.downsample.0.weight"]
                )
                p, s = _bn(sd, f"{tp}.downsample.1")
                bp["downsample_bn"] = {"BatchNorm_0": p}
                bs["downsample_bn"] = {"BatchNorm_0": s}
            params["trunk"][name] = bp
            stats["trunk"][name] = bs
    if fc and "fc.weight" in sd:
        params["fc"] = {
            "Dense_0": {
                "kernel": linear_kernel(sd["fc.weight"]),
                "bias": _t(sd["fc.bias"]),
            }
        }
    return params, stats


def convert_sixdrepnet(sd: Dict[str, Any]) -> dict:
    """6DRepNet (deploy-mode RepVGG-B1g2) state_dict -> models.repvgg.SixDRepNet.

    Torch layout: layer0.rbr_reparam.{weight,bias}, layer{1..4}.{i}.
    rbr_reparam.*, linear_reg.{weight,bias} (mysixdrepnet.py:30-55).
    """
    params: dict = {"trunk": {}}

    def block(src: str, dst: str):
        params["trunk"][dst] = {
            "rbr_reparam": _conv_entry(
                sd[f"{src}.rbr_reparam.weight"], sd[f"{src}.rbr_reparam.bias"]
            )
        }

    block("layer0", "stage0")
    blocks = (4, 6, 16, 1)
    for stage, n in enumerate(blocks):
        for i in range(n):
            block(f"layer{stage + 1}.{i}", f"stage{stage + 1}_block{i}")
    params["linear_reg"] = {
        "Dense_0": {
            "kernel": linear_kernel(sd["linear_reg.weight"]),
            "bias": _t(sd["linear_reg.bias"]),
        }
    }
    return params


def merge_params(target: dict, source: dict, path: str = "") -> dict:
    """Recursively overwrite `target` leaves with `source` (strict=False
    semantics: missing keys in source keep target values)."""
    out = dict(target)
    for key, value in source.items():
        if key not in target:
            raise KeyError(f"unknown param path {path}/{key}")
        if isinstance(value, dict) and isinstance(target[key], dict):
            out[key] = merge_params(target[key], value, f"{path}/{key}")
        else:
            tgt = np.asarray(target[key])
            src = np.asarray(value)
            if tgt.shape != src.shape:
                raise ValueError(
                    f"shape mismatch at {path}/{key}: {tgt.shape} vs {src.shape}"
                )
            out[key] = src.astype(tgt.dtype)
    return out
