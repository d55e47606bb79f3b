"""Functional torch replays of the pretrained loss/pose backbones.

Golden-activation oracles for the weight-conversion pipeline
(scripts/convert_weights.py): each function replays a torch ``state_dict``
with ``torch.nn.functional`` ops only — no torchvision/facenet_pytorch/lpips
packages needed — and returns numpy activations to compare against our JAX
ports. A conversion bug (wrong transpose, missed BN stat, bad tap index)
shows up as activation divergence even when every tensor shape matches.

Reference behavioral contract: SURVEY.md §2.5 — torchvision VGG19/VGG16
(reference model.py:1935), facenet InceptionResnetV1 'vggface2'
(model.py:1940), LPIPS-vgg linear heads (model.py:1947), SixDRepNet deploy
RepVGG-B1g2 (mysixdrepnet.py:792), torchvision resnet18/50.

All inputs are NCHW float32 torch tensors or numpy arrays; outputs numpy.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _tt(x):
    import torch

    if isinstance(x, np.ndarray):
        return torch.from_numpy(x)
    return x


def _to_np(x) -> np.ndarray:
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# VGG features (torchvision vgg16/vgg19 'features' layout)
# ---------------------------------------------------------------------------

VGG_CONVS_PER_STAGE = {"vgg16": (2, 2, 3, 3, 3), "vgg19": (2, 2, 4, 4, 4)}


def vgg_tap_layer_indices(cfg: str, taps: Sequence[Tuple[int, int]]) -> list:
    """(stage, conv-in-stage) taps -> flat torchvision features indices of
    the ReLU following each tapped conv."""
    out = []
    for stage_t, conv_t in taps:
        layer = 0
        for stage, n_convs in enumerate(VGG_CONVS_PER_STAGE[cfg]):
            for i in range(n_convs):
                if (stage, i) == (stage_t, conv_t):
                    out.append(layer + 1)  # the ReLU after this conv
                layer += 2
            layer += 1  # maxpool
    return out


def golden_vgg_taps(
    sd: Dict, x_nchw, cfg: str, taps: Sequence[Tuple[int, int]],
    prefix: str = "features.",
) -> List[np.ndarray]:
    """Replay a torchvision vgg features state_dict, returning post-ReLU
    activations at `taps` as NHWC numpy arrays."""
    import torch
    import torch.nn.functional as F

    x = _tt(x_nchw)
    want = set(taps)
    outs: Dict[Tuple[int, int], np.ndarray] = {}
    layer = 0
    with torch.no_grad():
        for stage, n_convs in enumerate(VGG_CONVS_PER_STAGE[cfg]):
            for i in range(n_convs):
                w = _tt(sd[f"{prefix}{layer}.weight"])
                b = _tt(sd[f"{prefix}{layer}.bias"])
                x = F.relu(F.conv2d(x, w, b, padding=1))
                if (stage, i) in want:
                    outs[(stage, i)] = _to_np(x.permute(0, 2, 3, 1))
                layer += 2
            if len(outs) == len(want):
                break
            x = F.max_pool2d(x, 2, 2)
            layer += 1
    return [outs[t] for t in taps]


# ---------------------------------------------------------------------------
# LPIPS (vgg16 trunk taps + unit-normalize + 1x1 linear heads)
# ---------------------------------------------------------------------------

LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)
LPIPS_TAPS = ((0, 1), (1, 1), (2, 2), (3, 2), (4, 2))


def golden_lpips(
    lpips_sd: Dict, vgg16_sd: Dict, x_nchw, y_nchw
) -> np.ndarray:
    """Full LPIPS(net='vgg') replay: scaling layer, vgg16 taps, channel
    unit-norm, squared diff, 1x1 heads, spatial mean, tap sum. Inputs are
    expected pre-normalized the way the caller feeds our LPIPS port."""
    import torch

    shift = LPIPS_SHIFT.reshape(1, 3, 1, 1)
    scale = LPIPS_SCALE.reshape(1, 3, 1, 1)
    xs = (np.asarray(x_nchw) - shift) / scale
    ys = (np.asarray(y_nchw) - shift) / scale
    fx = golden_vgg_taps(vgg16_sd, xs.astype(np.float32), "vgg16", LPIPS_TAPS)
    fy = golden_vgg_taps(vgg16_sd, ys.astype(np.float32), "vgg16", LPIPS_TAPS)
    total = None
    with torch.no_grad():
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / np.sqrt((a ** 2).sum(-1, keepdims=True) + 1e-10)
            b = b / np.sqrt((b ** 2).sum(-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2  # NHWC
            key = f"lins.{i}.model.1.weight"
            if key not in lpips_sd:
                key = f"lin{i}.model.1.weight"
            w = np.asarray(_tt(lpips_sd[key]))  # [1, C, 1, 1]
            head = (diff * w[0, :, 0, 0]).sum(-1)  # 1x1 conv, no bias
            val = head.mean(axis=(1, 2))
            total = val if total is None else total + val
    return np.asarray(total)


# ---------------------------------------------------------------------------
# torchvision ResNet (18/50)
# ---------------------------------------------------------------------------


def _bn_f(sd: Dict, prefix: str, x, eps: float = 1e-5):
    import torch

    w = _tt(sd[f"{prefix}.weight"]).float()
    b = _tt(sd[f"{prefix}.bias"]).float()
    m = _tt(sd[f"{prefix}.running_mean"]).float()
    v = _tt(sd[f"{prefix}.running_var"]).float()
    shape = (1, -1, 1, 1) if x.dim() == 4 else (1, -1)
    return (x - m.view(shape)) * torch.rsqrt(v.view(shape) + eps) \
        * w.view(shape) + b.view(shape)


def golden_resnet(
    sd: Dict, x_nchw, layers=(2, 2, 2, 2), bottleneck: bool = False,
    fc: bool = True,
) -> np.ndarray:
    """Replay a torchvision resnet state_dict; returns fc logits (or pooled
    features when fc=False / absent) as numpy."""
    import torch
    import torch.nn.functional as F

    x = _tt(x_nchw)
    n_convs = 3 if bottleneck else 2
    with torch.no_grad():
        x = F.conv2d(x, _tt(sd["conv1.weight"]), None, stride=2, padding=3)
        x = F.relu(_bn_f(sd, "bn1", x))
        x = F.max_pool2d(x, 3, 2, 1)
        for stage in range(len(layers)):
            for block in range(layers[stage]):
                p = f"layer{stage + 1}.{block}"
                idt = x
                if f"{p}.downsample.0.weight" in sd:
                    stride = 2 if stage > 0 else 1
                    idt = F.conv2d(x, _tt(sd[f"{p}.downsample.0.weight"]),
                                   None, stride=stride)
                    idt = _bn_f(sd, f"{p}.downsample.1", idt)
                h = x
                for ci in range(1, n_convs + 1):
                    w = _tt(sd[f"{p}.conv{ci}.weight"])
                    k = w.shape[-1]
                    # torchvision: stride on conv1 (basic) / conv2
                    # (bottleneck) of each stage's first block.
                    stride = 1
                    if stage > 0 and block == 0:
                        if (not bottleneck and ci == 1) or \
                                (bottleneck and ci == 2):
                            stride = 2
                    h = F.conv2d(h, w, None, stride=stride,
                                 padding=(k - 1) // 2)
                    h = _bn_f(sd, f"{p}.bn{ci}", h)
                    if ci < n_convs:
                        h = F.relu(h)
                x = F.relu(h + idt)
        x = x.mean(dim=(2, 3))
        if fc and "fc.weight" in sd:
            x = F.linear(x, _tt(sd["fc.weight"]), _tt(sd["fc.bias"]))
    return _to_np(x)


# ---------------------------------------------------------------------------
# SixDRepNet (deploy-mode RepVGG-B1g2 trunk + GAP + linear 6)
# ---------------------------------------------------------------------------


def golden_sixdrepnet_6d(sd: Dict, x_nchw) -> np.ndarray:
    """Replay the deploy RepVGG trunk + linear_reg; returns the raw 6D
    rotation representation [B, 6] (pre ortho6d math, which is covered by
    its own parity tests)."""
    import torch
    import torch.nn.functional as F

    x = _tt(x_nchw)

    def block(prefix: str, h, stride: int):
        w = _tt(sd[f"{prefix}.rbr_reparam.weight"])
        b = _tt(sd[f"{prefix}.rbr_reparam.bias"])
        groups = h.shape[1] // w.shape[1]
        return F.relu(F.conv2d(h, w, b, stride=stride, padding=1,
                               groups=groups))

    with torch.no_grad():
        x = block("layer0", x, 2)
        blocks = (4, 6, 16, 1)
        for stage, n in enumerate(blocks):
            for i in range(n):
                x = block(f"layer{stage + 1}.{i}", x, 2 if i == 0 else 1)
        pooled = x.mean(dim=(2, 3))
        six = F.linear(pooled, _tt(sd["linear_reg.weight"]),
                       _tt(sd["linear_reg.bias"]))
    return _to_np(six)


# ---------------------------------------------------------------------------
# FAN (face_alignment 2DFAN naming)
# ---------------------------------------------------------------------------


def golden_fan(sd: Dict, x_nchw) -> np.ndarray:
    """Replay a face_alignment 2DFAN state_dict; returns the last stack's
    heatmaps as NHWC numpy [B, 64, 64, 68]."""
    import torch
    import torch.nn.functional as F

    def bn(prefix, h):
        return _bn_f(sd, prefix, h)

    def convblock(prefix, h):
        h1 = F.conv2d(F.relu(bn(f"{prefix}.bn1", h)),
                      _tt(sd[f"{prefix}.conv1.weight"]), None, padding=1)
        h2 = F.conv2d(F.relu(bn(f"{prefix}.bn2", h1)),
                      _tt(sd[f"{prefix}.conv2.weight"]), None, padding=1)
        h3 = F.conv2d(F.relu(bn(f"{prefix}.bn3", h2)),
                      _tt(sd[f"{prefix}.conv3.weight"]), None, padding=1)
        out = torch.cat([h1, h2, h3], dim=1)
        if f"{prefix}.downsample.0.weight" in sd:
            res = F.conv2d(F.relu(bn(f"{prefix}.downsample.0", h)),
                           _tt(sd[f"{prefix}.downsample.2.weight"]))
        else:
            res = h
        return out + res

    def hourglass(mod, level, inp):
        up1 = convblock(f"{mod}.b1_{level}", inp)
        low = F.avg_pool2d(inp, 2, 2)
        low = convblock(f"{mod}.b2_{level}", low)
        if level > 1:
            low = hourglass(mod, level - 1, low)
        else:
            low = convblock(f"{mod}.b2_plus_{level}", low)
        low = convblock(f"{mod}.b3_{level}", low)
        return up1 + F.interpolate(low, scale_factor=2, mode="nearest")

    x = _tt(x_nchw)
    with torch.no_grad():
        x = F.conv2d(x, _tt(sd["conv1.weight"]), _tt(sd["conv1.bias"]),
                     stride=2, padding=3)
        x = F.relu(bn("bn1", x))
        x = convblock("conv2", x)
        x = F.avg_pool2d(x, 2, 2)
        x = convblock("conv3", x)
        x = convblock("conv4", x)
        previous = x
        out = None
        i = 0
        while f"m{i}.b1_4.bn1.weight" in sd:
            hg = hourglass(f"m{i}", 4, previous)
            ll = convblock(f"top_m_{i}", hg)
            ll = F.conv2d(ll, _tt(sd[f"conv_last{i}.weight"]),
                          _tt(sd[f"conv_last{i}.bias"]))
            ll = F.relu(bn(f"bn_end{i}", ll))
            out = F.conv2d(ll, _tt(sd[f"l{i}.weight"]),
                           _tt(sd[f"l{i}.bias"]))
            if f"bl{i}.weight" in sd:
                ll2 = F.conv2d(ll, _tt(sd[f"bl{i}.weight"]),
                               _tt(sd[f"bl{i}.bias"]))
                out2 = F.conv2d(out, _tt(sd[f"al{i}.weight"]),
                                _tt(sd[f"al{i}.bias"]))
                previous = previous + ll2 + out2
            i += 1
    return _to_np(out.permute(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# InceptionResnetV1 (facenet_pytorch naming)
# ---------------------------------------------------------------------------

# (name, in_ch, out_ch, kernel, stride, padding) for every BasicConv2d.
_STEM = [
    ("conv2d_1a", 3, 32, 3, 2, 0),
    ("conv2d_2a", 32, 32, 3, 1, 0),
    ("conv2d_2b", 32, 64, 3, 1, 1),
    ("conv2d_3b", 64, 80, 1, 1, 0),
    ("conv2d_4a", 80, 192, 3, 1, 0),
    ("conv2d_4b", 192, 256, 3, 2, 0),
]

_BLOCK35 = [  # in 256
    ("branch0", 256, 32, 1, 1, 0),
    ("branch1.0", 256, 32, 1, 1, 0), ("branch1.1", 32, 32, 3, 1, 1),
    ("branch2.0", 256, 32, 1, 1, 0), ("branch2.1", 32, 32, 3, 1, 1),
    ("branch2.2", 32, 32, 3, 1, 1),
]
_MIXED6A = [
    ("branch0", 256, 384, 3, 2, 0),
    ("branch1.0", 256, 192, 1, 1, 0), ("branch1.1", 192, 192, 3, 1, 1),
    ("branch1.2", 192, 256, 3, 2, 0),
]
_BLOCK17 = [  # in 896
    ("branch0", 896, 128, 1, 1, 0),
    ("branch1.0", 896, 128, 1, 1, 0),
    ("branch1.1", 128, 128, (1, 7), 1, (0, 3)),
    ("branch1.2", 128, 128, (7, 1), 1, (3, 0)),
]
_MIXED7A = [
    ("branch0.0", 896, 256, 1, 1, 0), ("branch0.1", 256, 384, 3, 2, 0),
    ("branch1.0", 896, 256, 1, 1, 0), ("branch1.1", 256, 256, 3, 2, 0),
    ("branch2.0", 896, 256, 1, 1, 0), ("branch2.1", 256, 256, 3, 1, 1),
    ("branch2.2", 256, 256, 3, 2, 0),
]
_BLOCK8 = [  # in 1792
    ("branch0", 1792, 192, 1, 1, 0),
    ("branch1.0", 1792, 192, 1, 1, 0),
    ("branch1.1", 192, 192, (1, 3), 1, (0, 1)),
    ("branch1.2", 192, 192, (3, 1), 1, (1, 0)),
]


def inception_state_dict_spec() -> Dict[str, tuple]:
    """Key -> shape spec of a facenet_pytorch InceptionResnetV1 state_dict
    (trunk + last_linear/last_bn). Used to generate CI fixtures."""
    spec: Dict[str, tuple] = {}

    def basic(prefix: str, cin: int, cout: int, k):
        kh, kw = (k, k) if isinstance(k, int) else k
        spec[f"{prefix}.conv.weight"] = (cout, cin, kh, kw)
        for stat in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{prefix}.bn.{stat}"] = (cout,)

    for name, cin, cout, k, _, _ in _STEM:
        basic(name, cin, cout, k)
    for i in range(5):
        for name, cin, cout, k, _, _ in _BLOCK35:
            basic(f"repeat_1.{i}.{name}", cin, cout, k)
        spec[f"repeat_1.{i}.conv2d.weight"] = (256, 96, 1, 1)
        spec[f"repeat_1.{i}.conv2d.bias"] = (256,)
    for name, cin, cout, k, _, _ in _MIXED6A:
        basic(f"mixed_6a.{name}", cin, cout, k)
    for i in range(10):
        for name, cin, cout, k, _, _ in _BLOCK17:
            basic(f"repeat_2.{i}.{name}", cin, cout, k)
        spec[f"repeat_2.{i}.conv2d.weight"] = (896, 256, 1, 1)
        spec[f"repeat_2.{i}.conv2d.bias"] = (896,)
    for name, cin, cout, k, _, _ in _MIXED7A:
        basic(f"mixed_7a.{name}", cin, cout, k)
    for i in range(5):
        for name, cin, cout, k, _, _ in _BLOCK8:
            basic(f"repeat_3.{i}.{name}", cin, cout, k)
        spec[f"repeat_3.{i}.conv2d.weight"] = (1792, 384, 1, 1)
        spec[f"repeat_3.{i}.conv2d.bias"] = (1792,)
    for name, cin, cout, k, _, _ in _BLOCK8:
        basic(f"block8.{name}", cin, cout, k)
    spec["block8.conv2d.weight"] = (1792, 384, 1, 1)
    spec["block8.conv2d.bias"] = (1792,)
    spec["last_linear.weight"] = (512, 1792)
    for stat in ("weight", "bias", "running_mean", "running_var"):
        spec[f"last_bn.{stat}"] = (512,)
    return spec


def golden_inception_taps(sd: Dict, x_nchw) -> Tuple[np.ndarray, list]:
    """Replay facenet InceptionResnetV1; returns (embedding [B,512],
    NHWC taps at children [4,5,6,7] as used by the vggface loss term)."""
    import torch
    import torch.nn.functional as F

    def basic(prefix: str, h, stride: int, padding):
        w = _tt(sd[f"{prefix}.conv.weight"])
        h = F.conv2d(h, w, None, stride=stride, padding=padding)
        h = _bn_f(sd, f"{prefix}.bn", h, eps=1e-3)
        return F.relu(h)

    def residual_block(prefix: str, h, convs, out_ch, scale, relu=True):
        branches = {}
        for name, _, _, _, stride, padding in convs:
            src = h if "." not in name or name.endswith(".0") else \
                branches[name.rsplit(".", 1)[0] + "." +
                         str(int(name.rsplit(".", 1)[1]) - 1)]
            branches[name] = basic(f"{prefix}.{name}", src, stride, padding)
        tips = []
        seen = set()
        for name, *_ in convs:
            root = name.split(".")[0]
            if root not in seen:
                seen.add(root)
                last = max(
                    (n for n, *_ in convs if n.split(".")[0] == root),
                    key=lambda n: n,
                )
                tips.append(branches[last])
        up = torch.cat(tips, dim=1)
        up = F.conv2d(up, _tt(sd[f"{prefix}.conv2d.weight"]),
                      _tt(sd[f"{prefix}.conv2d.bias"]))
        out = h + scale * up
        return F.relu(out) if relu else out

    def mixed(prefix: str, h, convs, pool=True):
        branches = {}
        for name, _, _, _, stride, padding in convs:
            src = h if "." not in name or name.endswith(".0") else \
                branches[name.rsplit(".", 1)[0] + "." +
                         str(int(name.rsplit(".", 1)[1]) - 1)]
            branches[name] = basic(f"{prefix}.{name}", src, stride, padding)
        tips = []
        seen = set()
        for name, *_ in convs:
            root = name.split(".")[0]
            if root not in seen:
                seen.add(root)
                last = max(
                    (n for n, *_ in convs if n.split(".")[0] == root),
                    key=lambda n: n,
                )
                tips.append(branches[last])
        if pool:
            tips.append(F.max_pool2d(h, 3, 2))
        return torch.cat(tips, dim=1)

    x = _tt(x_nchw)
    taps = []
    with torch.no_grad():
        for i, (name, _, _, _, stride, padding) in enumerate(_STEM):
            x = basic(name, x, stride, padding)
            if i == 2:
                x = F.max_pool2d(x, 3, 2)
            if name in ("conv2d_3b", "conv2d_4a", "conv2d_4b"):
                taps.append(_to_np(x.permute(0, 2, 3, 1)))
        for i in range(5):
            x = residual_block(f"repeat_1.{i}", x, _BLOCK35, 256, 0.17)
        taps.append(_to_np(x.permute(0, 2, 3, 1)))
        x = mixed("mixed_6a", x, _MIXED6A)
        for i in range(10):
            x = residual_block(f"repeat_2.{i}", x, _BLOCK17, 896, 0.10)
        x = mixed("mixed_7a", x, _MIXED7A)
        for i in range(5):
            x = residual_block(f"repeat_3.{i}", x, _BLOCK8, 1792, 0.20)
        x = residual_block("block8", x, _BLOCK8, 1792, 1.0, relu=False)
        x = x.mean(dim=(2, 3))
        x = F.linear(x, _tt(sd["last_linear.weight"]))
        x = _bn_f(sd, "last_bn", x, eps=1e-3)
        emb = x / x.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    return _to_np(emb), taps
