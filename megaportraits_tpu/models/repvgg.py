"""RepVGG family + SixDRepNet head-pose estimator (NHWC, linen).

Re-derivation of the reference pose stack (mysixdrepnet.py:1085-1343 RepVGG,
:30-69 MySixDRepNet, :240-315 6D-rotation math). The detector used by Emtn is
the frozen RepVGG-B1g2 backbone in *deploy* mode (reparameterized single
3x3 conv per block) with a 6-dim linear head mapped through the
Gram-Schmidt ortho6d construction to a rotation matrix, then to Euler
degrees.

Deploy mode is the TPU-friendly default: one conv + ReLU per block, perfect
for XLA fusion. Train mode (3 branches + BN) is also provided for parity
with the trainable MySixDRepNet, plus `reparameterize()` to fold trained
branches into deploy form.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import TorchConv, TorchDense


# ---------------------------------------------------------------------------
# 6D rotation math (mysixdrepnet.py:240-315)
# ---------------------------------------------------------------------------


def _normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mag = jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), eps)
    return v / mag


def rotation_6d_to_matrix(poses: jnp.ndarray) -> jnp.ndarray:
    """[B,6] ortho6d -> [B,3,3] rotation (Gram-Schmidt, Zhou et al.)."""
    x_raw, y_raw = poses[:, 0:3], poses[:, 3:6]
    x = _normalize(x_raw)
    z = _normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns x, y, z


def euler_angles_from_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """[B,3,3] -> [B,3] Euler radians, x-y-z sequence w/ gimbal handling."""
    sy = jnp.sqrt(r[:, 0, 0] ** 2 + r[:, 1, 0] ** 2)
    singular = (sy < 1e-6).astype(r.dtype)
    x = jnp.arctan2(r[:, 2, 1], r[:, 2, 2])
    y = jnp.arctan2(-r[:, 2, 0], sy)
    z = jnp.arctan2(r[:, 1, 0], r[:, 0, 0])
    xs = jnp.arctan2(-r[:, 1, 2], r[:, 1, 1])
    zs = jnp.zeros_like(z)
    out = jnp.stack(
        [x * (1 - singular) + xs * singular, y, z * (1 - singular) + zs * singular],
        axis=1,
    )
    return out


# ---------------------------------------------------------------------------
# RepVGG
# ---------------------------------------------------------------------------

_OPTIONAL_GROUPWISE_LAYERS = (2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26)

REPVGG_CONFIGS: Dict[str, dict] = {
    # name -> (num_blocks, width_multiplier, groups_map)
    "RepVGG-A0": dict(blocks=(2, 4, 14, 1), widths=(0.75, 0.75, 0.75, 2.5), g=None),
    "RepVGG-A1": dict(blocks=(2, 4, 14, 1), widths=(1, 1, 1, 2.5), g=None),
    "RepVGG-A2": dict(blocks=(2, 4, 14, 1), widths=(1.5, 1.5, 1.5, 2.75), g=None),
    "RepVGG-B0": dict(blocks=(4, 6, 16, 1), widths=(1, 1, 1, 2.5), g=None),
    "RepVGG-B1": dict(blocks=(4, 6, 16, 1), widths=(2, 2, 2, 4), g=None),
    "RepVGG-B1g2": dict(blocks=(4, 6, 16, 1), widths=(2, 2, 2, 4), g=2),
    "RepVGG-B1g4": dict(blocks=(4, 6, 16, 1), widths=(2, 2, 2, 4), g=4),
    "RepVGG-B2": dict(blocks=(4, 6, 16, 1), widths=(2.5, 2.5, 2.5, 5), g=None),
}


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


class RepVGGBlock(nn.Module):
    """One RepVGG block (mysixdrepnet.py:1085-1213), deploy or train mode."""

    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = TorchConv(self.out_channels, (3, 3), strides=self.stride,
                          padding=1, feature_group_count=self.groups,
                          policy=self.policy, name="rbr_reparam")(x)
            return nn.relu(y)
        dense = TorchConv(self.out_channels, (3, 3), strides=self.stride,
                          padding=1, feature_group_count=self.groups,
                          use_bias=False, policy=self.policy,
                          name="rbr_dense_conv")(x)
        dense = _BN(self.policy, name="rbr_dense_bn")(dense, train)
        one = TorchConv(self.out_channels, (1, 1), strides=self.stride,
                        feature_group_count=self.groups, use_bias=False,
                        policy=self.policy, name="rbr_1x1_conv")(x)
        one = _BN(self.policy, name="rbr_1x1_bn")(one, train)
        out = dense + one
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            out = out + _BN(self.policy, name="rbr_identity")(x, train)
        return nn.relu(out)


class RepVGG(nn.Module):
    """RepVGG trunk: stage0 + 4 stages, returns [B, H/32, W/32, C4]."""

    name_or_cfg: str = "RepVGG-B1g2"
    deploy: bool = True
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.arch
        cfg = REPVGG_CONFIGS[self.name_or_cfg]
        widths = cfg["widths"]
        blocks = a.repvgg_blocks or cfg["blocks"]
        in_planes = a.ch(min(64, int(64 * widths[0])))
        gmap = (
            {l: cfg["g"] for l in _OPTIONAL_GROUPWISE_LAYERS} if cfg["g"] else {}
        )
        x = RepVGGBlock(in_planes, stride=2, deploy=self.deploy,
                        policy=self.policy, name="stage0")(x, train)
        layer_idx = 1
        stage_planes = [a.ch(int(64 * widths[0])), a.ch(int(128 * widths[1])),
                        a.ch(int(256 * widths[2])), a.ch(int(512 * widths[3]))]
        for stage, (planes, n) in enumerate(zip(stage_planes, blocks)):
            for i in range(n):
                stride = 2 if i == 0 else 1
                groups = gmap.get(layer_idx, 1)
                x = RepVGGBlock(planes, stride=stride, groups=groups,
                                deploy=self.deploy, policy=self.policy,
                                name=f"stage{stage + 1}_block{i}")(x, train)
                layer_idx += 1
        return x


class SixDRepNet2(nn.Module):
    """ResNet-backbone 6D-rotation estimator (mysixdrepnet.py:72-136):
    resnet18-style trunk -> linear 6 -> ortho6d rotation matrix."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        from megaportraits_tpu.models.resnet import BasicBlock, _ResNetTrunk

        feats = _ResNetTrunk(BasicBlock, (2, 2, 2, 2), policy=self.policy,
                             name="trunk")(x, train)
        pooled = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        six = TorchDense(6, policy=self.policy, name="linear_reg")(pooled)
        return rotation_6d_to_matrix(six.astype(jnp.float32))


def geodesic_loss(m1: jnp.ndarray, m2: jnp.ndarray,
                  eps: float = 1e-7) -> jnp.ndarray:
    """Rotation-matrix geodesic angle loss (mysixdrepnet.py:17-28).

    m1, m2: [B, 3, 3]; returns mean geodesic angle in radians.
    """
    m = jnp.matmul(m1.astype(jnp.float32),
                   jnp.transpose(m2.astype(jnp.float32), (0, 2, 1)))
    cos = (m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2] - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.mean(jnp.arccos(cos))


class SixDRepNet(nn.Module):
    """MySixDRepNet (mysixdrepnet.py:30-69): RepVGG trunk -> GAP -> linear 6
    -> ortho6d rotation matrix.

    `__call__` returns (rotation_matrix [B,3,3], euler_degrees [B,3]) — the
    reference detector's `.predict` returns euler * 180/pi
    (mysixdrepnet.py:829); its 'translations' output is an empty slice of the
    6-dim head (mysixdrepnet.py:66-67) so we drop it.
    """

    backbone: str = "RepVGG-B1g2"
    deploy: bool = True
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = RepVGG(self.backbone, deploy=self.deploy, policy=self.policy,
                       arch=self.arch, name="trunk")(x, train)
        pooled = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        six = TorchDense(6, policy=self.policy, name="linear_reg")(pooled)
        rot = rotation_6d_to_matrix(six.astype(jnp.float32))
        euler_deg = euler_angles_from_matrix(rot) * (180.0 / jnp.pi)
        return rot, euler_deg
