"""Parity tests for the Pallas fused conv3x3 (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from megaportraits_tpu.core.dtypes import FP32_POLICY
from megaportraits_tpu.nn.blocks import ResBlock2D

KEY = jax.random.PRNGKey(0)


def test_fused_conv3x3_matches_xla_conv():
    from megaportraits_tpu.ops.pallas.conv2d import fused_conv3x3

    h = w = 16
    c = f = 128
    x = jax.random.normal(KEY, (h, w, c), jnp.float32)
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, f),
                             jnp.float32) * 0.05
    scale = jax.random.uniform(jax.random.PRNGKey(2), (f,), jnp.float32,
                               0.5, 1.5)
    shift = jax.random.normal(jax.random.PRNGKey(3), (f,)) * 0.1
    res = jax.random.normal(jax.random.PRNGKey(4), (h, w, f), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = fused_conv3x3(x, kern, scale, shift, residual=res, relu=True)

    ref = jax.lax.conv_general_dilated(
        x[None], kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    ref = jnp.maximum(ref * scale + shift + res, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_resblock2d_fused_path_matches_plain():
    x = jax.random.normal(KEY, (1, 16, 16, 128), jnp.float32)
    fused = ResBlock2D(128, policy=FP32_POLICY, use_pallas=True)
    plain = ResBlock2D(128, policy=FP32_POLICY, use_pallas=False)
    variables = fused.init(KEY, x)
    # Non-trivial BN stats.
    stats = {
        k: (jax.random.uniform(jax.random.PRNGKey(i), v.shape, jnp.float32,
                               0.5, 1.5)
            if "var" in k else
            jax.random.normal(jax.random.PRNGKey(i + 50), v.shape) * 0.2)
        for i, (k, v) in enumerate(variables["batch_stats"].items())
    }
    variables = {"params": variables["params"], "batch_stats": stats}

    with pltpu.force_tpu_interpret_mode():
        out_f = fused.apply(variables, x)
    out_p = plain.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-3, rtol=2e-3)


def _xla_chain_ref(x, w, scales, shifts, n):
    hcur = x
    for b in range(n):
        c1 = jax.lax.conv_general_dilated(
            hcur[None], w[b, 0], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        m = jnp.maximum(c1 * scales[b, 0] + shifts[b, 0], 0.0)
        c2 = jax.lax.conv_general_dilated(
            m[None], w[b, 1], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        hcur = jnp.maximum(c2 * scales[b, 1] + shifts[b, 1] + hcur, 0.0)
    return hcur


def _chain_inputs(h, x_size, c, n):
    x = jax.random.normal(KEY, (h, x_size, c), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, 2, 3, 3, c, c),
                          jnp.float32) * 0.05
    scales = jax.random.uniform(jax.random.PRNGKey(2), (n, 2, c),
                                jnp.float32, 0.8, 1.2)
    shifts = jax.random.normal(jax.random.PRNGKey(3), (n, 2, c)) * 0.05
    return x, w, scales, shifts


def test_fused_resblock_chain_v2_matches_xla_chain():
    """v2 (line-buffer + streamed weights, the under-8MB design) parity."""
    from megaportraits_tpu.ops.pallas.g2d_chain_v2 import (
        fused_resblock_chain_v2,
    )

    h = x_size = 16
    c, n = 128, 3
    x, w, scales, shifts = _chain_inputs(h, x_size, c, n)
    got = fused_resblock_chain_v2(x, w, scales, shifts, y_tile=4,
                                  interpret=True)
    ref = _xla_chain_ref(x, w, scales, shifts, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_g2d_chain_kernel_matches_plain():
    """G2d(use_chain_kernel=True) must reproduce the plain trunk exactly
    (BN folding + in-place kernel, interpret mode)."""
    from megaportraits_tpu.models.g2d import G2d

    x = jax.random.normal(KEY, (1, 8, 8, 96), jnp.float32)
    plain = G2d(policy=FP32_POLICY)
    v = jax.jit(plain.init)(jax.random.PRNGKey(1), x)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.abs(
            jax.random.normal(jax.random.PRNGKey(2), a.shape)) * 0.5 + 0.5,
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": stats}
    ref = plain.apply(v, x)
    chain = G2d(policy=FP32_POLICY, use_chain_kernel=True)
    with pltpu.force_tpu_interpret_mode():
        got = chain.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fused_resblock_chain_matches_xla_chain():
    """Whole-chain kernel (experimental) parity at small shapes, interpret."""
    from megaportraits_tpu.ops.pallas.g2d_chain import fused_resblock_chain

    h = x_size = 16
    c, n = 128, 3
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (h, x_size, c), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, 2, 3, 3, c, c),
                          jnp.float32) * 0.05
    scales = jax.random.uniform(jax.random.PRNGKey(2), (n, 2, c),
                                jnp.float32, 0.8, 1.2)
    shifts = jax.random.normal(jax.random.PRNGKey(3), (n, 2, c)) * 0.05

    with pltpu.force_tpu_interpret_mode():
        got = fused_resblock_chain(x, w, scales, shifts)

    hcur = x
    for b in range(n):
        c1 = jax.lax.conv_general_dilated(
            hcur[None], w[b, 0], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        m = jnp.maximum(c1 * scales[b, 0] + shifts[b, 0], 0.0)
        c2 = jax.lax.conv_general_dilated(
            m[None], w[b, 1], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        hcur = jnp.maximum(c2 * scales[b, 1] + shifts[b, 1] + hcur, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(hcur),
                               atol=2e-3, rtol=2e-3)
