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

import jax
import jax.numpy as jnp
import numpy as np
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

    Hand-rolled (vs flax nn.BatchNorm) so fused inference paths can read
    scale/bias/mean/var directly and fold them into conv epilogues
    (ops/pallas/conv2d.fused_conv3x3). Parameter tree:
      params:      {scale, bias}
      batch_stats: {mean, var}
    Pass axis_name for cross-replica (sync) batch norm under a data-parallel
    mesh axis.
    """

    policy: Policy = DEFAULT_POLICY
    axis_name: Optional[str] = None
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.policy.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if self.axis_name is not None:
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)

    @staticmethod
    def folded_scale_shift(bn_params, bn_stats, eps: float = 1e-5):
        """(scale, shift) such that BN(x) == x * scale + shift (eval mode)."""
        inv = jax.lax.rsqrt(bn_stats["var"].astype(jnp.float32) + eps)
        scale = bn_params["scale"].astype(jnp.float32) * inv
        shift = (bn_params["bias"].astype(jnp.float32)
                 - bn_stats["mean"].astype(jnp.float32) * scale)
        return scale, shift


class ResBlock2D(nn.Module):
    """Reference ResBlock2D w/ BatchNorm (model.py:600-640).

    conv3-BN-ReLU-conv3-BN (+ downsampled or 1x1 shortcut) -> ReLU.

    Owns its conv/BN parameters directly so that, at inference on eligible
    shapes, both conv3x3+BN(+ReLU)(+residual) halves can run as single fused
    Pallas kernels (ops/pallas/conv2d.fused_conv3x3 — measured 1.85x over
    the XLA conv standalone and 1.34x per block in a scan microbench, but
    currently ~5% SLOWER inside the full drive graph where the pallas_call
    boundaries block XLA's surrounding fusion/overlap — see
    benchmarks/RESULTS.md). Off by default pending whole-chain kernelization.
    """

    out_channels: int
    downsample: bool = False
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    # 'batch' = reference BatchNorm parity (model.py:600-640).
    # 'group' = AffineGroupNorm(32): train == eval forward (no running
    # stats, no train/eval gap, no batch-composition sensitivity) — the
    # TPU-first norm decision (SURVEY.md §7 Hard parts #5, core/arch.py).
    norm: str = "batch"

    def _conv_params(self, name, kh, kw, cin, cout):
        from megaportraits_tpu.nn.layers import (
            torch_bias_uniform, torch_kaiming_uniform,
        )

        kernel = self.param(f"{name}_kernel", torch_kaiming_uniform(),
                            (kh, kw, cin, cout), self.policy.param_dtype)
        bias = self.param(f"{name}_bias", torch_bias_uniform(kh * kw * cin),
                          (cout,), self.policy.param_dtype)
        return kernel, bias

    def _bn_params(self, name, c):
        scale = self.param(f"{name}_scale", nn.initializers.ones, (c,),
                           self.policy.param_dtype)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,),
                          self.policy.param_dtype)
        mean = self.variable("batch_stats", f"{name}_mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", f"{name}_var",
                            lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean, var

    def _bn_apply(self, x, scale, bias, mean_v, var_v, train):
        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if self.bn_axis_name is not None:
                mean = jax.lax.pmean(mean, self.bn_axis_name)
                var = jax.lax.pmean(var, self.bn_axis_name)
            if not self.is_initializing():
                mean_v.value = 0.9 * mean_v.value + 0.1 * mean
                var_v.value = 0.9 * var_v.value + 0.1 * var
        else:
            mean, var = mean_v.value, var_v.value
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(x.dtype)

    @staticmethod
    def _fold(conv_bias, bn_scale, bn_bias, mean, var):
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + 1e-5)
        scale = bn_scale.astype(jnp.float32) * inv
        shift = (bn_bias.astype(jnp.float32)
                 + (conv_bias.astype(jnp.float32)
                    - mean.astype(jnp.float32)) * scale)
        return scale, shift

    def _eligible(self, x) -> bool:
        b, h, w, c = x.shape
        f = self.out_channels
        if not self.use_pallas or self.downsample or self.norm != "batch":
            return False
        # whole padded input + output + weights must sit in VMEM comfortably
        bytes_in = h * w * max(c, f) * 2
        return (
            c % 128 == 0 and f % 128 == 0
            and h % 8 == 0 and w % 8 == 0
            and bytes_in <= 5 * 1024 * 1024
            and c == f  # residual fuses only when shapes match
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 chain_params: bool = False):
        """Forward pass; with chain_params=True, instead returns this
        block's (k1, k2, scale1, shift1, scale2, shift2) with BN folded,
        for whole-chain kernelization (ops/pallas/g2d_chain_v2). Only
        valid for same-channel, non-downsample blocks (the G2d trunk)."""
        in_channels = x.shape[-1]
        f = self.out_channels
        if self.norm == "group":
            assert not chain_params, "chain kernel needs folded BN stats"
            return self._forward_gn(x, train)
        k1, b1 = self._conv_params("conv1", 3, 3, in_channels, f)
        bn1 = self._bn_params("bn1", f)
        k2, b2 = self._conv_params("conv2", 3, 3, f, f)
        bn2 = self._bn_params("bn2", f)
        if chain_params:
            assert in_channels == f and not self.downsample
            s1, t1 = self._fold(b1, bn1[0], bn1[1],
                                bn1[2].value, bn1[3].value)
            s2, t2 = self._fold(b2, bn2[0], bn2[1],
                                bn2[2].value, bn2[3].value)
            return k1, k2, s1, t1, s2, t2

        identity = x
        if self.downsample:
            ks, bs = self._conv_params("downsample_conv", 1, 1, in_channels, f)
            bns = self._bn_params("downsample_bn", f)
            identity = self._conv(x, ks, bs, stride=2)
            identity = self._bn_apply(identity, bns[0], bns[1], bns[2],
                                      bns[3], train)
        elif in_channels != f:
            ks, bs = self._conv_params("shortcut_conv", 1, 1, in_channels, f)
            bns = self._bn_params("shortcut_bn", f)
            identity = self._conv(x, ks, bs, stride=1)
            identity = self._bn_apply(identity, bns[0], bns[1], bns[2],
                                      bns[3], train)

        if not train and not self.is_initializing() and self._eligible(x):
            from megaportraits_tpu.ops.pallas.conv2d import fused_conv3x3

            cdt = self.policy.compute_dtype
            s1, t1 = self._fold(b1, bn1[0], bn1[1], bn1[2].value, bn1[3].value)
            s2, t2 = self._fold(b2, bn2[0], bn2[1], bn2[2].value, bn2[3].value)
            run1 = lambda img: fused_conv3x3(  # noqa: E731
                img, k1.astype(cdt), s1, t1, residual=None, relu=True)
            run2 = lambda img, res: fused_conv3x3(  # noqa: E731
                img, k2.astype(cdt), s2, t2, residual=res, relu=True)
            if x.shape[0] == 1:  # streaming path: skip vmap batching overhead
                h1 = run1(x[0].astype(cdt))
                return run2(h1, identity[0].astype(cdt))[None]
            h1 = jax.vmap(run1)(x.astype(cdt))
            return jax.vmap(run2)(h1, identity.astype(cdt))

        out = self._conv(x, k1, b1)
        out = self._bn_apply(out, bn1[0], bn1[1], bn1[2], bn1[3], train)
        out = _relu(out)
        out = self._conv(out, k2, b2)
        out = self._bn_apply(out, bn2[0], bn2[1], bn2[2], bn2[3], train)
        return _relu(out + identity)

    def _forward_gn(self, x, train):
        """GroupNorm variant: same conv topology and param names, norms
        swapped for AffineGroupNorm(32) — `train` is irrelevant (GN has no
        batch statistics), accepted for call-site compatibility."""
        del train
        in_channels = x.shape[-1]
        f = self.out_channels
        k1, b1 = self._conv_params("conv1", 3, 3, in_channels, f)
        k2, b2 = self._conv_params("conv2", 3, 3, f, f)
        identity = x
        if self.downsample:
            ks, bs = self._conv_params("downsample_conv", 1, 1,
                                       in_channels, f)
            identity = self._conv(x, ks, bs, stride=2)
            identity = AffineGroupNorm(policy=self.policy,
                                       name="downsample_gn")(identity)
        elif in_channels != f:
            ks, bs = self._conv_params("shortcut_conv", 1, 1, in_channels, f)
            identity = self._conv(x, ks, bs, stride=1)
            identity = AffineGroupNorm(policy=self.policy,
                                       name="shortcut_gn")(identity)
        out = self._conv(x, k1, b1)
        out = AffineGroupNorm(policy=self.policy, name="gn1")(out)
        out = _relu(out)
        out = self._conv(out, k2, b2)
        out = AffineGroupNorm(policy=self.policy, name="gn2")(out)
        return _relu(out + identity)

    def _conv(self, x, kernel, bias, stride: int = 1):
        cdt = self.policy.compute_dtype
        pad = (kernel.shape[0] - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(cdt), kernel.astype(cdt),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(cdt)


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
