"""Residual / SPADE building blocks (channels-last, policy-typed).

Faithful re-derivations of the reference block zoo (model.py:88-130,
344-408, 500-528, 600-640, 1464-1533, 1544-1566) with the reference's
latent defects fixed and documented:

  * SPADE.conv_shared takes the *feature* channel count, not 3
    (reference model.py:1510 hardcodes 3 input channels, which cannot run),
    and the gamma/beta offset uses a proper attribute (model.py:1529 reads
    the unset ``self.norm_nc``).
  * ResBlock variants gain a 1x1 shortcut whenever in/out channels differ
    (the reference's plain ``x + out`` crashes for e.g. ResBlock(192, 96)
    in the Student encoder, model.py:1623).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import (
    AdaptiveGroupNorm,
    AffineGroupNorm,
    GroupNorm32,
    InstanceNorm,
    TorchConv,
    WSConv,
)
from megaportraits_tpu.ops.resize import linear_resize, upsample_nearest


def _relu(x):
    return nn.relu(x)


class ResBlockCustom(nn.Module):
    """Reference ResBlock_Custom (model.py:88-130), 2D or 3D by `dims`.

    residual = conv3(x); main = conv3(relu(GN32(conv3_ws(relu(GN32(x))))));
    both 'same' padded; out = main + residual.
    """

    dims: int  # 2 or 3
    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (3,) * self.dims
        out2 = TorchConv(self.out_channels, k, padding=1, policy=self.policy,
                         name="conv_res")(x)
        out1 = GroupNorm32()(x)
        out1 = _relu(out1)
        out1 = WSConv(self.out_channels, k, padding=1, policy=self.policy,
                      name="conv_ws")(out1)
        out1 = GroupNorm32()(out1)
        out1 = _relu(out1)
        out1 = TorchConv(self.out_channels, k, padding=1, policy=self.policy,
                         name="conv")(out1)
        return out1 + out2


class ResBlock2DAdaptive(nn.Module):
    """Reference ResBlock2D_Adaptive (model.py:344-367)."""

    out_channels: int
    upsample: bool = False
    scale_factors: Tuple[int, int] = (1, 1)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        out = TorchConv(self.out_channels, (3, 3), padding=1, policy=self.policy,
                        name="conv1")(x)
        out = AdaptiveGroupNorm(policy=self.policy, name="norm1")(out)
        out = _relu(out)
        out = TorchConv(self.out_channels, (3, 3), padding=1, policy=self.policy,
                        name="conv2")(out)
        out = AdaptiveGroupNorm(policy=self.policy, name="norm2")(out)
        if x.shape[-1] != self.out_channels:
            residual = TorchConv(self.out_channels, (1, 1), policy=self.policy,
                                 name="residual_conv")(residual)
        out = _relu(out + residual)
        if self.upsample:
            sizes = [s * f for s, f in zip(out.shape[1:3], self.scale_factors)]
            out = linear_resize(out, sizes, axes=(1, 2), align_corners=False)
        return out


class ResBlock3DAdaptive(nn.Module):
    """Reference ResBlock3D_Adaptive (model.py:369-408). NDHWC."""

    out_channels: int
    upsample: bool = False
    scale_factors: Tuple[int, int, int] = (1, 1, 1)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        out = TorchConv(self.out_channels, (3, 3, 3), padding=1,
                        policy=self.policy, name="conv1")(x)
        out = AdaptiveGroupNorm(policy=self.policy, name="norm1")(out)
        out = _relu(out)
        out = TorchConv(self.out_channels, (3, 3, 3), padding=1,
                        policy=self.policy, name="conv2")(out)
        out = AdaptiveGroupNorm(policy=self.policy, name="norm2")(out)
        if x.shape[-1] != self.out_channels:
            residual = TorchConv(self.out_channels, (1, 1, 1),
                                 policy=self.policy, name="residual_conv")(residual)
        out = _relu(out + residual)
        if self.upsample:
            sizes = [s * f for s, f in zip(out.shape[1:4], self.scale_factors)]
            out = linear_resize(out, sizes, axes=(1, 2, 3), align_corners=False)
        return out


class ResBlock3D(nn.Module):
    """Reference ResBlock3D (model.py:500-528): GN(affine)+ReLU, 1x1 shortcut."""

    out_channels: int
    upsample: bool = False
    scale_factors: Tuple[int, int, int] = (1, 1, 1)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.out_channels:
            identity = TorchConv(self.out_channels, (1, 1, 1),
                                 policy=self.policy, name="shortcut")(x)
        else:
            identity = x
        out = TorchConv(self.out_channels, (3, 3, 3), padding=1,
                        policy=self.policy, name="conv1")(x)
        out = AffineGroupNorm(policy=self.policy, name="gn1")(out)
        out = _relu(out)
        out = TorchConv(self.out_channels, (3, 3, 3), padding=1,
                        policy=self.policy, name="conv2")(out)
        out = AffineGroupNorm(policy=self.policy, name="gn2")(out)
        out = _relu(out + identity)
        if self.upsample:
            sizes = [s * f for s, f in zip(out.shape[1:4], self.scale_factors)]
            out = linear_resize(out, sizes, axes=(1, 2, 3), align_corners=False)
        return out


class _BatchNorm(nn.Module):
    """torch-default BatchNorm2d (momentum 0.1, eps 1e-5), float32 stats.

    Pass axis_name for cross-replica (sync) batch norm under shard_map/jit
    with a data-parallel mesh axis.
    """

    policy: Policy = DEFAULT_POLICY
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.policy.param_dtype,
            axis_name=self.axis_name,
        )(x).astype(x.dtype)


class ResBlock2D(nn.Module):
    """Reference ResBlock2D w/ BatchNorm (model.py:600-640).

    conv3-BN-ReLU-conv3-BN (+ downsampled or 1x1 shortcut) -> ReLU.
    """

    out_channels: int
    downsample: bool = False
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        out = TorchConv(self.out_channels, (3, 3), padding=1,
                        policy=self.policy, name="conv1")(x)
        out = _BatchNorm(self.policy, self.bn_axis_name, name="bn1")(out, train)
        out = _relu(out)
        out = TorchConv(self.out_channels, (3, 3), padding=1,
                        policy=self.policy, name="conv2")(out)
        out = _BatchNorm(self.policy, self.bn_axis_name, name="bn2")(out, train)

        identity = x
        if self.downsample:
            identity = TorchConv(self.out_channels, (1, 1), strides=2,
                                 policy=self.policy, name="downsample_conv")(identity)
            identity = _BatchNorm(self.policy, self.bn_axis_name,
                                  name="downsample_bn")(identity, train)
        elif in_channels != self.out_channels:
            identity = TorchConv(self.out_channels, (1, 1),
                                 policy=self.policy, name="shortcut_conv")(identity)
            identity = _BatchNorm(self.policy, self.bn_axis_name,
                                  name="shortcut_bn")(identity, train)
        return _relu(out + identity)


class ResBlockBN(nn.Module):
    """Reference Student/ResNet18 ResBlock (model.py:1544-1566).

    relu(BN(conv)) twice, + shortcut (1x1 s2 + BN when downsampling, 1x1 + BN
    when channels change — the reference omits the latter and crashes), ReLU.
    """

    out_channels: int
    downsample: bool = False
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stride = 2 if self.downsample else 1
        if self.downsample or x.shape[-1] != self.out_channels:
            shortcut = TorchConv(self.out_channels, (1, 1), strides=stride,
                                 policy=self.policy, name="shortcut_conv")(x)
            shortcut = _BatchNorm(self.policy, self.bn_axis_name,
                                  name="shortcut_bn")(shortcut, train)
        else:
            shortcut = x
        out = TorchConv(self.out_channels, (3, 3), strides=stride, padding=1,
                        policy=self.policy, name="conv1")(x)
        out = _BatchNorm(self.policy, self.bn_axis_name, name="bn1")(out, train)
        out = _relu(out)
        out = TorchConv(self.out_channels, (3, 3), padding=1,
                        policy=self.policy, name="conv2")(out)
        out = _BatchNorm(self.policy, self.bn_axis_name, name="bn2")(out, train)
        out = _relu(out)
        return _relu(out + shortcut)


class SPADE(nn.Module):
    """Spatially-adaptive norm with per-avatar embeddings (model.py:1503-1533).

    InstanceNorm -> shared conv (C -> 128) -> gamma/beta convs, with learned
    per-avatar embedding tables added to the shared features and to
    gamma/beta. Defect fixes vs reference documented in the module docstring.
    """

    num_avatars: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, avatar_index: jnp.ndarray) -> jnp.ndarray:
        norm_nc = x.shape[-1]
        emb_kwargs = dict(
            embedding_init=nn.initializers.normal(stddev=1.0),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        avatar_shared = nn.Embed(self.num_avatars, 128, name="avatar_shared_emb",
                                 **emb_kwargs)(avatar_index)
        avatar_gamma = nn.Embed(self.num_avatars, norm_nc, name="avatar_gamma_emb",
                                **emb_kwargs)(avatar_index)
        avatar_beta = nn.Embed(self.num_avatars, norm_nc, name="avatar_beta_emb",
                               **emb_kwargs)(avatar_index)

        normed = InstanceNorm()(x)
        shared = TorchConv(128, (3, 3), padding=1, policy=self.policy,
                           name="conv_shared")(normed)
        shared = _relu(shared)
        shared = shared + avatar_shared[:, None, None, :]
        gamma = TorchConv(norm_nc, (3, 3), padding=1, policy=self.policy,
                          name="conv_gamma")(shared)
        beta = TorchConv(norm_nc, (3, 3), padding=1, policy=self.policy,
                         name="conv_beta")(shared)
        gamma = gamma + avatar_gamma[:, None, None, :]
        beta = beta + avatar_beta[:, None, None, :]
        return normed * (1.0 + gamma) + beta


class SPADEResBlock(nn.Module):
    """Reference SPADEResBlock (model.py:1464-1500)."""

    out_channels: int
    num_avatars: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, avatar_index: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        middle = min(in_channels, self.out_channels)
        learned_shortcut = in_channels != self.out_channels

        def actvn(t):
            return nn.leaky_relu(t, negative_slope=0.2)

        if learned_shortcut:
            x_s = SPADE(self.num_avatars, policy=self.policy, name="norm_s")(
                x, avatar_index
            )
            x_s = TorchConv(self.out_channels, (1, 1), use_bias=False,
                            policy=self.policy, name="conv_s")(x_s)
        else:
            x_s = x

        dx = SPADE(self.num_avatars, policy=self.policy, name="norm_0")(
            x, avatar_index
        )
        dx = TorchConv(middle, (3, 3), padding=1, policy=self.policy,
                       name="conv_0")(actvn(dx))
        dx = SPADE(self.num_avatars, policy=self.policy, name="norm_1")(
            dx, avatar_index
        )
        dx = TorchConv(self.out_channels, (3, 3), padding=1, policy=self.policy,
                       name="conv_1")(actvn(dx))
        return x_s + dx
