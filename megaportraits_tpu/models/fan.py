"""FAN (Face Alignment Network, 2DFAN-4) — 68-point facial landmarks.

The reference's eval/gaze stack needs real 68-point landmarks: dlib for
AKD/AED (reference metrics.py:13-34), MediaPipe FaceMesh for the gaze
losses (model.py:1756-1880). Neither library exists in this environment,
so the framework ships its OWN landmark network: the standard stacked-
hourglass FAN of Bulat & Tzimiropoulos (ICCV'17), in the exact layout of
the widely-distributed ``face_alignment`` 2DFAN-4 checkpoint so users drop
in that .pth via scripts/convert_weights.py (same story as SixDRepNet,
mysixdrepnet.py:792).

Inference-only (frozen): BN uses stored statistics as affine constants.
Input: [B, 256, 256, 3] RGB in [0,1]. Output: [B, 64, 64, 68] heatmaps
(last stack); decode with `heatmaps_to_landmarks`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import TorchConv

HEATMAP_SIZE = 64
NUM_LANDMARKS = 68


class _FrozenBN(nn.Module):
    """Inference-mode BatchNorm with stored stats as parameters."""

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), p.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), p.param_dtype)
        mean = self.param("mean", nn.initializers.zeros, (c,), p.param_dtype)
        var = self.param("var", nn.initializers.ones, (c,), p.param_dtype)
        xf = x.astype(jnp.float32)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return xf.astype(x.dtype)


class ConvBlock(nn.Module):
    """FAN ConvBlock: three bn-relu-conv stages at out/2, out/4, out/4
    channels, concatenated; 1x1 shortcut when channels change."""

    in_planes: int
    out_planes: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        o = self.out_planes
        h1 = nn.relu(_FrozenBN(self.in_planes, p, name="bn1")(x))
        h1 = TorchConv(o // 2, (3, 3), padding=1, use_bias=False, policy=p,
                       name="conv1")(h1)
        h2 = nn.relu(_FrozenBN(o // 2, p, name="bn2")(h1))
        h2 = TorchConv(o // 4, (3, 3), padding=1, use_bias=False, policy=p,
                       name="conv2")(h2)
        h3 = nn.relu(_FrozenBN(o // 4, p, name="bn3")(h2))
        h3 = TorchConv(o // 4, (3, 3), padding=1, use_bias=False, policy=p,
                       name="conv3")(h3)
        out = jnp.concatenate([h1, h2, h3], axis=-1)
        if self.in_planes != o:
            res = nn.relu(_FrozenBN(self.in_planes, p, name="down_bn")(x))
            res = TorchConv(o, (1, 1), use_bias=False, policy=p,
                            name="down_conv")(res)
        else:
            res = x
        return out + res


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def _upsample2_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class HourGlass(nn.Module):
    """Recursive hourglass of depth 4 over 256 features (FAN naming:
    b1_/b2_/b2_plus_/b3_ per level, levels 4..1)."""

    depth: int = 4
    features: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        f, p = self.features, self.policy

        def level(n, inp):
            up1 = ConvBlock(f, f, p, name=f"b1_{n}")(inp)
            low = _avg_pool2(inp)
            low = ConvBlock(f, f, p, name=f"b2_{n}")(low)
            if n > 1:
                low = level(n - 1, low)
            else:
                low = ConvBlock(f, f, p, name=f"b2_plus_{n}")(low)
            low = ConvBlock(f, f, p, name=f"b3_{n}")(low)
            return up1 + _upsample2_nearest(low)

        return level(self.depth, x)


class FAN(nn.Module):
    """2DFAN-N: stem to 64x64x256, then `num_modules` stacked hourglasses
    with intermediate supervision; returns the LAST stack's heatmaps
    [B, 64, 64, 68]."""

    num_modules: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        x = p.cast_to_compute(x)
        x = TorchConv(64, (7, 7), strides=2, padding=3, policy=p,
                      name="conv1")(x)
        x = nn.relu(_FrozenBN(64, p, name="bn1")(x))
        x = ConvBlock(64, 128, p, name="conv2")(x)
        x = _avg_pool2(x)
        x = ConvBlock(128, 128, p, name="conv3")(x)
        x = ConvBlock(128, 256, p, name="conv4")(x)

        previous = x
        out = None
        for i in range(self.num_modules):
            hg = HourGlass(4, 256, p, name=f"m{i}")(previous)
            ll = ConvBlock(256, 256, p, name=f"top_m_{i}")(hg)
            ll = TorchConv(256, (1, 1), policy=p, name=f"conv_last{i}")(ll)
            ll = nn.relu(_FrozenBN(256, p, name=f"bn_end{i}")(ll))
            out = TorchConv(NUM_LANDMARKS, (1, 1), policy=p,
                            name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                ll2 = TorchConv(256, (1, 1), policy=p, name=f"bl{i}")(ll)
                out2 = TorchConv(256, (1, 1), policy=p, name=f"al{i}")(out)
                previous = previous + ll2 + out2
        return out.astype(jnp.float32)


def heatmaps_to_landmarks(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 68] -> [B, 68, 2] (x, y) in heatmap pixel coords with the
    standard FAN quarter-pixel refinement toward the stronger neighbor."""
    b, h, w, c = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, c)
    idx = jnp.argmax(flat, axis=1)  # [B, 68]
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    # Neighbor differences at the peak for sub-pixel refinement.
    def gather_at(dy, dx):
        yy = jnp.clip(idx // w + dy, 0, h - 1)
        xx = jnp.clip(idx % w + dx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[:, None, :],
                                   axis=1)[:, 0, :]

    dx = gather_at(0, 1) - gather_at(0, -1)
    dy = gather_at(1, 0) - gather_at(-1, 0)
    xs = xs + 0.25 * jnp.sign(dx)
    ys = ys + 0.25 * jnp.sign(dy)
    return jnp.stack([xs, ys], axis=-1)  # [B, 68, 2]


def convert_fan(sd) -> Tuple[dict, int]:
    """face_alignment 2DFAN state_dict -> FAN params. Returns
    (params, num_modules)."""
    from megaportraits_tpu.utils.torch_convert import _t, conv_kernel

    def bn(prefix):
        return {
            "scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"]),
            "mean": _t(sd[f"{prefix}.running_mean"]),
            "var": _t(sd[f"{prefix}.running_var"]),
        }

    def conv(prefix, bias=True):
        entry = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
        if bias and f"{prefix}.bias" in sd:
            entry["bias"] = _t(sd[f"{prefix}.bias"])
        return {"Conv_0": entry}

    def convblock(prefix):
        out = {
            "bn1": bn(f"{prefix}.bn1"), "conv1": conv(f"{prefix}.conv1"),
            "bn2": bn(f"{prefix}.bn2"), "conv2": conv(f"{prefix}.conv2"),
            "bn3": bn(f"{prefix}.bn3"), "conv3": conv(f"{prefix}.conv3"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            out["down_bn"] = bn(f"{prefix}.downsample.0")
            out["down_conv"] = conv(f"{prefix}.downsample.2")
        return out

    params = {
        "conv1": conv("conv1"),
        "bn1": bn("bn1"),
        "conv2": convblock("conv2"),
        "conv3": convblock("conv3"),
        "conv4": convblock("conv4"),
    }
    num_modules = 0
    while f"m{num_modules}.b1_4.bn1.weight" in sd:
        num_modules += 1
    for i in range(num_modules):
        hg = {}
        for lvl in range(4, 0, -1):
            hg[f"b1_{lvl}"] = convblock(f"m{i}.b1_{lvl}")
            hg[f"b2_{lvl}"] = convblock(f"m{i}.b2_{lvl}")
            hg[f"b3_{lvl}"] = convblock(f"m{i}.b3_{lvl}")
        hg["b2_plus_1"] = convblock(f"m{i}.b2_plus_1")
        params[f"m{i}"] = hg
        params[f"top_m_{i}"] = convblock(f"top_m_{i}")
        params[f"conv_last{i}"] = conv(f"conv_last{i}")
        params[f"bn_end{i}"] = bn(f"bn_end{i}")
        params[f"l{i}"] = conv(f"l{i}")
        if i < num_modules - 1:
            params[f"bl{i}"] = conv(f"bl{i}")
            params[f"al{i}"] = conv(f"al{i}")
    return params, num_modules
