"""torchvision-layout ResNets (NHWC, linen) used as pipeline backbones.

The reference pulls torchvision resnet18/resnet50 for three roles:
  * CustomResNet50 — resnet50 minus layer4, adaptive-avg-pool to 2x2, 1x1
    conv 1024->512; Eapp's global appearance descriptor (model.py:136-173).
  * head_pose_net — resnet18 with fc->6, translation = out[:, 3:]
    (model.py:874-875,898).
  * expression_net — resnet18 trunk, global pool, tiled to 2x2, flattened,
    Linear(2048->512) (model.py:878-886,902-905).

Parameter layout intentionally mirrors torchvision module names
(conv1/bn1/layerN/blockM/...) so a torch state_dict converts 1:1
(utils/torch_convert.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import TorchConv, TorchDense


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MaxPool2d(kernel_size=3, stride=2, padding=1) over NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def adaptive_avg_pool_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch nn.AdaptiveAvgPool2d over NHWC (static shapes, tiny out bins)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, oh, ow, C]


class _BN(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.policy.param_dtype,
        )(x).astype(x.dtype)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = TorchConv(self.planes, (3, 3), strides=self.stride, padding=1,
                        use_bias=False, policy=self.policy, name="conv1")(x)
        out = _BN(self.policy, name="bn1")(out, train)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), padding=1, use_bias=False,
                        policy=self.policy, name="conv2")(out)
        out = _BN(self.policy, name="bn2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = TorchConv(self.planes, (1, 1), strides=self.stride,
                                 use_bias=False, policy=self.policy,
                                 name="downsample_conv")(x)
            identity = _BN(self.policy, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        identity = x
        out = TorchConv(self.planes, (1, 1), use_bias=False, policy=self.policy,
                        name="conv1")(x)
        out = _BN(self.policy, name="bn1")(out, train)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), strides=self.stride, padding=1,
                        use_bias=False, policy=self.policy, name="conv2")(out)
        out = _BN(self.policy, name="bn2")(out, train)
        out = nn.relu(out)
        out = TorchConv(out_ch, (1, 1), use_bias=False, policy=self.policy,
                        name="conv3")(out)
        out = _BN(self.policy, name="bn3")(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = TorchConv(out_ch, (1, 1), strides=self.stride,
                                 use_bias=False, policy=self.policy,
                                 name="downsample_conv")(x)
            identity = _BN(self.policy, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class _ResNetTrunk(nn.Module):
    """conv1/bn1/relu/maxpool + layer1..layerN with torchvision widths."""

    block: type
    layers: Sequence[int]
    num_stages: int = 4
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.arch
        x = TorchConv(a.ch(64), (7, 7), strides=2, padding=3, use_bias=False,
                      policy=self.policy, name="conv1")(x)
        x = _BN(self.policy, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        planes = [a.ch(64), a.ch(128), a.ch(256), a.ch(512)]
        for stage in range(self.num_stages):
            stride = 1 if stage == 0 else 2
            for i in range(self.layers[stage]):
                x = self.block(
                    planes=planes[stage],
                    stride=stride if i == 0 else 1,
                    policy=self.policy,
                    name=f"layer{stage + 1}_block{i}",
                )(x, train)
        return x


class ResNet18(nn.Module):
    """torchvision resnet18; `num_classes=0` returns pooled trunk features."""

    num_classes: int = 1000
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ResNetTrunk(BasicBlock, self.arch.resnet18_layers,
                         policy=self.policy, arch=self.arch,
                         name="trunk")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.num_classes:
            x = TorchDense(self.num_classes, policy=self.policy, name="fc")(x)
        return x


class ResNet50(nn.Module):
    num_classes: int = 1000
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ResNetTrunk(Bottleneck, self.arch.resnet50_layers,
                         policy=self.policy, arch=self.arch,
                         name="trunk")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes:
            x = TorchDense(self.num_classes, policy=self.policy, name="fc")(x)
        return x


class CustomResNet50(nn.Module):
    """Reference CustomResNet50 (model.py:136-173).

    resnet50 stem + layer1..layer3 (1024 ch), adaptive-avg-pool to 2x2,
    1x1 conv 1024 -> 512. Output [B, 2, 2, 512].
    """

    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.arch
        x = _ResNetTrunk(Bottleneck, a.resnet50_layers[:3], num_stages=3,
                         policy=self.policy, arch=a, name="trunk")(x, train)
        x = adaptive_avg_pool_2d(x, (2, 2))
        x = TorchConv(a.ch(512), (1, 1), policy=self.policy,
                      name="conv_reduce")(x)
        return x
