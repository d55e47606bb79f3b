"""Streaming reenactment session (infer/streaming.py) — the production
serving path (encode source once, drive per frame)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.arch import TINY
from megaportraits_tpu.core.dtypes import FP32_POLICY
from megaportraits_tpu.models.gbase import Gbase

SIZE = 32


@pytest.fixture(scope="module")
def tiny_gbase():
    model = Gbase(policy=FP32_POLICY, arch=TINY)
    x = jnp.linspace(0, 1, SIZE * SIZE * 3, dtype=jnp.float32).reshape(
        1, SIZE, SIZE, 3
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    return model, variables, x


def test_streaming_matches_full_forward(tiny_gbase):
    """encode_source + drive must equal the fused eval forward."""
    from megaportraits_tpu.infer.streaming import ReenactmentSession

    model, variables, x = tiny_gbase
    xd = jnp.flip(x, axis=2)
    session = ReenactmentSession(variables, model=model)
    session.set_source(x)
    out_stream = np.asarray(session(xd))
    out_full = np.asarray(
        jax.jit(lambda v, a, b: model.apply(v, a, b)[0])(variables, x, xd)
    )
    np.testing.assert_allclose(out_stream, out_full, atol=1e-5)


def test_streaming_batch_bn_mode(tiny_gbase):
    """bn_mode='batch' (per-input batch statistics — the convention
    small-batch-trained checkpoints need) runs and differs from
    running-stats output while keeping the [0,1] contract."""
    from megaportraits_tpu.infer.streaming import ReenactmentSession

    model, variables, x = tiny_gbase
    xd = jnp.flip(x, axis=2)
    run = ReenactmentSession(variables, model=model, bn_mode="running")
    bat = ReenactmentSession(variables, model=model, bn_mode="batch")
    run.set_source(x)
    bat.set_source(x)
    out_r = np.asarray(run(xd))
    out_b = np.asarray(bat(xd))
    assert out_b.shape == (1, SIZE, SIZE, 3)
    assert out_b.min() >= 0.0 and out_b.max() <= 1.0
    # Fresh-init running stats (mean 0 / var 1) differ from the input's
    # batch statistics, so the two modes must not be identical.
    assert not np.allclose(out_r, out_b)
