"""CIFAR-style ResNet family (reference resnet.py — 3x3 stem, no maxpool,
used by the repo's resnet18 import with zip-downloaded CIFAR weights,
resnet.py:290-340). Distinct from the torchvision ImageNet layout in
models/resnet.py.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.resnet import BasicBlock, Bottleneck, _BN
from megaportraits_tpu.nn.layers import TorchConv, TorchDense


class CifarResNet(nn.Module):
    """3x3-stem ResNet for 32x32-class inputs (reference resnet.py)."""

    block: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 10
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        x = TorchConv(64, (3, 3), padding=1, use_bias=False, policy=p,
                      name="conv1")(x)
        x = _BN(p, name="bn1")(x, train)
        x = nn.relu(x)
        planes = [64, 128, 256, 512]
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(self.layers[stage]):
                x = self.block(
                    planes=planes[stage],
                    stride=stride if i == 0 else 1,
                    policy=p,
                    name=f"layer{stage + 1}_block{i}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes:
            x = TorchDense(self.num_classes, policy=p, name="fc")(x)
        return x


def cifar_resnet18(num_classes: int = 10, policy: Policy = DEFAULT_POLICY):
    return CifarResNet(BasicBlock, (2, 2, 2, 2), num_classes, policy)


def cifar_resnet34(num_classes: int = 10, policy: Policy = DEFAULT_POLICY):
    return CifarResNet(BasicBlock, (3, 4, 6, 3), num_classes, policy)


def cifar_resnet50(num_classes: int = 10, policy: Policy = DEFAULT_POLICY):
    return CifarResNet(Bottleneck, (3, 4, 6, 3), num_classes, policy)
