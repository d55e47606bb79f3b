"""Leaf layers: convs (incl. weight-standardized), norms, torch-parity init.

Everything is channels-last: NHWC for 2D, NDHWC for 3D — the native TPU
layout, so XLA tiles convolutions straight onto the MXU without transposes.
Weight-standardized convs mirror Conv2d_WS / Conv3D_WS
(reference model.py:54-86): per-output-filter mean subtraction and division
by the *unbiased* std (+1e-5), recomputed from the parameters every call.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY


# ---------------------------------------------------------------------------
# torch-parity initializers
# ---------------------------------------------------------------------------


def torch_kaiming_uniform() -> Callable:
    """torch Conv/Linear default weight init: kaiming_uniform(a=sqrt(5)).

    Equivalent to uniform(+-1/sqrt(fan_in)); expressed as variance scaling
    with scale 1/3 (bound = sqrt(3 * scale / fan_in) = 1/sqrt(fan_in)).
    """
    return nn.initializers.variance_scaling(
        scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
    )


def torch_bias_uniform(fan_in: int) -> Callable:
    """torch Conv/Linear default bias init: uniform(+-1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv_fan_in(kernel_size: Sequence[int], in_features: int) -> int:
    return int(np.prod(kernel_size)) * in_features


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


class TorchConv(nn.Module):
    """nn.Conv with torch default init and the mixed-precision policy.

    `padding` accepts an int (torch symmetric padding) or flax-style spec.
    Works for 2D (NHWC) and 3D (NDHWC) based on len(kernel_size).
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, str, Sequence[Tuple[int, int]]] = 0
    use_bias: bool = True
    feature_group_count: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nd = len(self.kernel_size)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * nd
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides,) * nd
        in_features = x.shape[-1] // self.feature_group_count
        fan_in = _conv_fan_in(self.kernel_size, in_features)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=strides,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)


class WSConv(nn.Module):
    """Weight-standardized conv (reference Conv2d_WS / Conv3D_WS).

    The kernel is standardized per output filter: subtract the mean over all
    input taps, divide by the unbiased std (+1e-5). Standardization runs in
    float32 on the parameters (tiny) and the standardized kernel is cast to
    the compute dtype for the conv itself.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Sequence[Tuple[int, int]]] = 0
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nd = len(self.kernel_size)
        in_features = x.shape[-1]
        kernel_shape = (*self.kernel_size, in_features, self.features)
        fan_in = _conv_fan_in(self.kernel_size, in_features)
        kernel = self.param(
            "kernel", torch_kaiming_uniform(), kernel_shape, self.policy.param_dtype
        )
        bias = (
            self.param(
                "bias", torch_bias_uniform(fan_in), (self.features,),
                self.policy.param_dtype,
            )
            if self.use_bias
            else None
        )

        k = kernel.astype(jnp.float32)
        reduce_axes = tuple(range(nd + 1))  # all but the output-feature axis
        mean = jnp.mean(k, axis=reduce_axes, keepdims=True)
        k = k - mean
        # Unbiased std over the flattened per-filter elements (torch .std()).
        n = float(np.prod(kernel_shape[:-1]))
        var = jnp.sum(k * k, axis=reduce_axes, keepdims=True) / max(n - 1.0, 1.0)
        k = k / (jnp.sqrt(var) + 1e-5)

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * nd
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides,) * nd
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel_shape,
            ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC"),
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.policy.compute_dtype),
            k.astype(self.policy.compute_dtype),
            window_strides=strides,
            padding=pad,
            dimension_numbers=dn,
        )
        if bias is not None:
            y = y + bias.astype(self.policy.compute_dtype)
        return y


class TorchDense(nn.Module):
    """Linear with torch default init + policy dtypes."""

    features: int
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)


# ---------------------------------------------------------------------------
# Normalization (always reduces in float32)
# ---------------------------------------------------------------------------


def _group_norm(x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last input of any spatial rank, float32 math."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by {num_groups}"
    shape = xf.shape
    grouped = xf.reshape(*shape[:-1], num_groups, c // num_groups)
    # Reduce over all spatial axes + within-group channels, per (batch, group).
    axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    mean = jnp.mean(grouped, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(grouped - mean), axis=axes, keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    return normed.reshape(shape).astype(orig_dtype)


class GroupNorm32(nn.Module):
    """F.group_norm(num_groups=32) — no learned affine (model.py:116,119)."""

    num_groups: int = 32
    eps: float = 1e-5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _group_norm(x, self.num_groups, self.eps)


class AffineGroupNorm(nn.Module):
    """nn.GroupNorm(groups, channels) with learned per-channel scale/bias."""

    num_groups: int = 32
    eps: float = 1e-5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        normed = _group_norm(x, self.num_groups, self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.policy.param_dtype)
        return normed * scale.astype(normed.dtype) + bias.astype(normed.dtype)


class AdaptiveGroupNorm(nn.Module):
    """Reference AdaptiveGroupNorm (model.py:304-316).

    GroupNorm(32, C) *with* its own affine, then an extra learned
    per-channel scale/bias on top (the reference's 5-D weight/bias params).
    """

    num_groups: int = 32
    eps: float = 1e-5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        normed = AffineGroupNorm(
            num_groups=self.num_groups, eps=self.eps, policy=self.policy,
            name="group_norm",
        )(x)
        weight = self.param(
            "weight", nn.initializers.ones, (c,), self.policy.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.policy.param_dtype
        )
        return normed * weight.astype(normed.dtype) + bias.astype(normed.dtype)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d default: affine=False, no running stats."""

    eps: float = 1e-5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, xf.ndim - 1))  # spatial axes
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(orig_dtype)
