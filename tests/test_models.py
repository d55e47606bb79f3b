"""Shape / finiteness tests for the model zoo (SURVEY.md section 4 seeds).

Mirrors the reference's inline runtime assertions: canonical volume
(96,16,64,64) at 512 res (model.py:1157), FlowField 3-channel output
(model.py:469), PatchGAN (1,H/16,W/16) patch map (train.py:130).
Run at 128x128 to keep CPU time sane; the architecture is resolution-
agnostic (vs depth stays 16, spatial scales with input/8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import FP32_POLICY
from megaportraits_tpu.models import (
    Discriminator,
    Emtn,
    FlowField,
    G2d,
    G3d,
    Gbase,
    Genh,
    Student,
    WarpGenerator,
)

RES = 64
KEY = jax.random.PRNGKey(0)


def _img(b=1, res=RES):
    return jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (b, res, res, 3)).astype(np.float32)
    )


def test_flowfield_shape():
    model = FlowField(policy=FP32_POLICY)
    z = jnp.zeros((2, 512))
    vars_ = model.init(KEY, z)
    out = model.apply(vars_, z)
    assert out.shape == (2, 16, 16, 16, 3)
    # relu -> tanh: output must be in [0, 1) (reference quirk, model.py:462-465)
    assert float(out.min()) >= 0.0
    assert np.isfinite(np.asarray(out)).all()


def test_warp_generator_shape():
    model = WarpGenerator(invert=True, policy=FP32_POLICY)
    r = jnp.zeros((2, 3))
    t = jnp.zeros((2, 3))
    z = jnp.zeros((2, 512))
    e = jnp.zeros((2, 512))
    vars_ = model.init(KEY, r, t, z, e)
    w = model.apply(vars_, r, t, z, e)
    assert w.shape == (2, 64, 64, 64, 3)


def test_g3d_shape():
    model = G3d(policy=FP32_POLICY)
    x = jnp.zeros((1, 16, 16, 16, 96))
    vars_ = model.init(KEY, x)
    out = model.apply(vars_, x)
    assert out.shape == (1, 16, 16, 16, 96)


def test_g2d_shape():
    model = G2d(policy=FP32_POLICY)
    x = jnp.zeros((1, RES // 8, RES // 8, 96))
    vars_ = model.init(KEY, x)
    out = model.apply(vars_, x)
    assert out.shape == (1, RES, RES, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid


def test_emtn_shapes():
    model = Emtn(policy=FP32_POLICY)
    x = _img()
    vars_ = model.init(KEY, x)
    r, t, z = model.apply(vars_, x)
    assert r.shape == (1, 3)
    assert t.shape == (1, 3)
    assert z.shape == (1, 512)
    assert np.isfinite(np.asarray(r)).all()


def test_gbase_end_to_end():
    model = Gbase(policy=FP32_POLICY)
    xs, xd = _img(), _img()
    vars_ = model.init(KEY, xs, xd)
    xhat, pyr = model.apply(vars_, xs, xd)
    assert xhat.shape == (1, RES, RES, 3)
    assert set(pyr.keys()) == {"0.5", "0.25"}
    assert pyr["0.5"].shape == (1, RES // 2, RES // 2, 3)
    assert pyr["0.25"].shape == (1, RES // 4, RES // 4, 3)
    assert np.isfinite(np.asarray(xhat)).all()
    assert float(xhat.min()) >= 0.0 and float(xhat.max()) <= 1.0


def test_genh_shape():
    model = Genh(policy=FP32_POLICY)
    x = _img()
    vars_ = model.init(KEY, x)
    out = model.apply(vars_, x)
    assert out.shape == (1, RES, RES, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0  # tanh


def test_student_shape():
    model = Student(num_avatars=4, policy=FP32_POLICY)
    x = _img()
    idx = jnp.zeros((1,), dtype=jnp.int32)
    vars_ = model.init(KEY, x, idx)
    out = model.apply(vars_, x, idx)
    assert out.shape == (1, RES, RES, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_patch_shape():
    model = Discriminator(policy=FP32_POLICY)
    a, b = _img(), _img()
    vars_ = model.init(KEY, a, b)
    out = model.apply(vars_, a, b)
    # (1, H/16, W/16) patch map, channels-last.
    assert out.shape == (1, RES // 16, RES // 16, 1)


def test_streaming_drive_matches_full_forward():
    """encode_source + drive must reproduce the full Gbase forward exactly
    (the streaming serving path, infer/streaming.py)."""
    model = Gbase(policy=FP32_POLICY)
    xs, xd = _img(), _img(res=RES)
    vars_ = model.init(KEY, xs, xs)
    full, _ = model.apply(vars_, xs, xd)
    state = model.apply(vars_, xs, method=Gbase.encode_source)
    streamed = model.apply(vars_, state, xd, method=Gbase.drive)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               atol=1e-5)
