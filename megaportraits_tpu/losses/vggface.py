"""InceptionResnetV1 ('vggface2') — the reference's face-identity backbone.

The reference uses facenet_pytorch's InceptionResnetV1 both as the
'vggface' term of PerceptualLoss (feature L1 at children [4,5,6,7] =
conv2d_3b / conv2d_4a / conv2d_4b / repeat_1 — model.py:1940-1941, 1997-2011)
and as the embedding net of IdentitySimilarityLoss (model.py:2224).

Full NHWC linen port; weights convert from a facenet_pytorch state_dict via
utils/torch_convert-style mapping (convert_inception_resnet below).
BatchNorm uses facenet's eps=1e-3. Runs in inference mode (the reference
keeps it eval+frozen).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import TorchConv, TorchDense


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        x = TorchConv(
            self.out_channels, self.kernel_size, strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            use_bias=False, policy=self.policy, name="conv",
        )(x)
        # Frozen inference BN (facenet eps=1e-3): scale/bias/mean/var params.
        c = self.out_channels
        p = self.policy
        scale = self.param("bn_scale", nn.initializers.ones, (c,), p.param_dtype)
        bias = self.param("bn_bias", nn.initializers.zeros, (c,), p.param_dtype)
        mean = self.param("bn_mean", nn.initializers.zeros, (c,), p.param_dtype)
        var = self.param("bn_var", nn.initializers.ones, (c,), p.param_dtype)
        xf = x.astype(jnp.float32)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(xf.astype(x.dtype))


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID",
    )


class Block35(nn.Module):
    scale: float = 0.17
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        b0 = BasicConv2d(32, (1, 1), policy=p, name="branch0")(x)
        b1 = BasicConv2d(32, (1, 1), policy=p, name="branch1_0")(x)
        b1 = BasicConv2d(32, (3, 3), padding=(1, 1), policy=p,
                         name="branch1_1")(b1)
        b2 = BasicConv2d(32, (1, 1), policy=p, name="branch2_0")(x)
        b2 = BasicConv2d(32, (3, 3), padding=(1, 1), policy=p,
                         name="branch2_1")(b2)
        b2 = BasicConv2d(32, (3, 3), padding=(1, 1), policy=p,
                         name="branch2_2")(b2)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = TorchConv(256, (1, 1), policy=p, name="conv2d")(up)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    scale: float = 0.10
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        b0 = BasicConv2d(128, (1, 1), policy=p, name="branch0")(x)
        b1 = BasicConv2d(128, (1, 1), policy=p, name="branch1_0")(x)
        b1 = BasicConv2d(128, (1, 7), padding=(0, 3), policy=p,
                         name="branch1_1")(b1)
        b1 = BasicConv2d(128, (7, 1), padding=(3, 0), policy=p,
                         name="branch1_2")(b1)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = TorchConv(896, (1, 1), policy=p, name="conv2d")(up)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        b0 = BasicConv2d(192, (1, 1), policy=p, name="branch0")(x)
        b1 = BasicConv2d(192, (1, 1), policy=p, name="branch1_0")(x)
        b1 = BasicConv2d(192, (1, 3), padding=(0, 1), policy=p,
                         name="branch1_1")(b1)
        b1 = BasicConv2d(192, (3, 1), padding=(1, 0), policy=p,
                         name="branch1_2")(b1)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = TorchConv(1792, (1, 1), policy=p, name="conv2d")(up)
        out = x + self.scale * up
        return out if self.no_relu else nn.relu(out)


class Mixed6a(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        b0 = BasicConv2d(384, (3, 3), stride=2, policy=p, name="branch0")(x)
        b1 = BasicConv2d(192, (1, 1), policy=p, name="branch1_0")(x)
        b1 = BasicConv2d(192, (3, 3), padding=(1, 1), policy=p,
                         name="branch1_1")(b1)
        b1 = BasicConv2d(256, (3, 3), stride=2, policy=p, name="branch1_2")(b1)
        b2 = _max_pool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed7a(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        b0 = BasicConv2d(256, (1, 1), policy=p, name="branch0_0")(x)
        b0 = BasicConv2d(384, (3, 3), stride=2, policy=p, name="branch0_1")(b0)
        b1 = BasicConv2d(256, (1, 1), policy=p, name="branch1_0")(x)
        b1 = BasicConv2d(256, (3, 3), stride=2, policy=p, name="branch1_1")(b1)
        b2 = BasicConv2d(256, (1, 1), policy=p, name="branch2_0")(x)
        b2 = BasicConv2d(256, (3, 3), padding=(1, 1), policy=p,
                         name="branch2_1")(b2)
        b2 = BasicConv2d(256, (3, 3), stride=2, policy=p, name="branch2_2")(b2)
        b3 = _max_pool(x)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    """facenet-compatible trunk. `features=True` also returns the
    children-[4,5,6,7] taps used by PerceptualLoss's vggface term."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_taps: bool = False
    ):
        p = self.policy
        taps: List[jnp.ndarray] = []
        x = BasicConv2d(32, (3, 3), stride=2, policy=p, name="conv2d_1a")(x)
        x = BasicConv2d(32, (3, 3), policy=p, name="conv2d_2a")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), policy=p,
                        name="conv2d_2b")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), policy=p, name="conv2d_3b")(x)
        taps.append(x)  # child 4
        x = BasicConv2d(192, (3, 3), policy=p, name="conv2d_4a")(x)
        taps.append(x)  # child 5
        x = BasicConv2d(256, (3, 3), stride=2, policy=p, name="conv2d_4b")(x)
        taps.append(x)  # child 6
        for i in range(5):
            x = Block35(policy=p, name=f"repeat_1_{i}")(x)
        taps.append(x)  # child 7 (repeat_1)
        x = Mixed6a(policy=p, name="mixed_6a")(x)
        for i in range(10):
            x = Block17(policy=p, name=f"repeat_2_{i}")(x)
        x = Mixed7a(policy=p, name="mixed_7a")(x)
        for i in range(5):
            x = Block8(policy=p, name=f"repeat_3_{i}")(x)
        # facenet's final Block8 is Block8(noReLU=True) with DEFAULT
        # scale=1.0 (only the repeat_3 blocks use scale=0.2).
        x = Block8(scale=1.0, no_relu=True, policy=p, name="block8")(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool 1x1
        x = TorchDense(512, use_bias=False, policy=p, name="last_linear")(x)
        # last_bn (1d), frozen inference form.
        scale = self.param("last_bn_scale", nn.initializers.ones, (512,),
                           p.param_dtype)
        bias = self.param("last_bn_bias", nn.initializers.zeros, (512,),
                          p.param_dtype)
        mean = self.param("last_bn_mean", nn.initializers.zeros, (512,),
                          p.param_dtype)
        var = self.param("last_bn_var", nn.initializers.ones, (512,),
                         p.param_dtype)
        xf = x.astype(jnp.float32)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        emb = xf / jnp.maximum(
            jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-12
        )
        if return_taps:
            return emb, taps
        return emb


def convert_inception_resnet(sd) -> dict:
    """facenet_pytorch InceptionResnetV1 state_dict -> our param tree."""
    from megaportraits_tpu.utils.torch_convert import (
        _t, conv_kernel, linear_kernel,
    )

    def basic(prefix: str) -> dict:
        return {
            "conv": {"Conv_0": {"kernel": conv_kernel(sd[f"{prefix}.conv.weight"])}},
            "bn_scale": _t(sd[f"{prefix}.bn.weight"]),
            "bn_bias": _t(sd[f"{prefix}.bn.bias"]),
            "bn_mean": _t(sd[f"{prefix}.bn.running_mean"]),
            "bn_var": _t(sd[f"{prefix}.bn.running_var"]),
        }

    params: dict = {}
    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                 "conv2d_4a", "conv2d_4b"):
        params[name] = basic(name)

    def block(prefix: str, names: List[Tuple[str, str]]) -> dict:
        out = {}
        for ours, theirs in names:
            if ours == "conv2d":
                out["conv2d"] = {"Conv_0": {
                    "kernel": conv_kernel(sd[f"{prefix}.conv2d.weight"]),
                    "bias": _t(sd[f"{prefix}.conv2d.bias"]),
                }}
            else:
                out[ours] = basic(f"{prefix}.{theirs}")
        return out

    b35 = [("branch0", "branch0"), ("branch1_0", "branch1.0"),
           ("branch1_1", "branch1.1"), ("branch2_0", "branch2.0"),
           ("branch2_1", "branch2.1"), ("branch2_2", "branch2.2"),
           ("conv2d", "conv2d")]
    for i in range(5):
        params[f"repeat_1_{i}"] = block(f"repeat_1.{i}", b35)
    params["mixed_6a"] = block("mixed_6a", [
        ("branch0", "branch0"), ("branch1_0", "branch1.0"),
        ("branch1_1", "branch1.1"), ("branch1_2", "branch1.2"),
    ])
    b17 = [("branch0", "branch0"), ("branch1_0", "branch1.0"),
           ("branch1_1", "branch1.1"), ("branch1_2", "branch1.2"),
           ("conv2d", "conv2d")]
    for i in range(10):
        params[f"repeat_2_{i}"] = block(f"repeat_2.{i}", b17)
    params["mixed_7a"] = block("mixed_7a", [
        ("branch0_0", "branch0.0"), ("branch0_1", "branch0.1"),
        ("branch1_0", "branch1.0"), ("branch1_1", "branch1.1"),
        ("branch2_0", "branch2.0"), ("branch2_1", "branch2.1"),
        ("branch2_2", "branch2.2"),
    ])
    b8 = [("branch0", "branch0"), ("branch1_0", "branch1.0"),
          ("branch1_1", "branch1.1"), ("branch1_2", "branch1.2"),
          ("conv2d", "conv2d")]
    for i in range(5):
        params[f"repeat_3_{i}"] = block(f"repeat_3.{i}", b8)
    params["block8"] = block("block8", b8)
    params["last_linear"] = {"Dense_0": {
        "kernel": linear_kernel(sd["last_linear.weight"])
    }}
    params["last_bn_scale"] = _t(sd["last_bn.weight"])
    params["last_bn_bias"] = _t(sd["last_bn.bias"])
    params["last_bn_mean"] = _t(sd["last_bn.running_mean"])
    params["last_bn_var"] = _t(sd["last_bn.running_var"])
    return params
