"""Tests for multi-backbone perceptual, vggface trunk, gaze, geodesic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import FP32_POLICY

RNG = np.random.default_rng(11)
KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("backbone", ["vgg16", "alexnet", "resnet50"])
def test_rome_perceptual_backbones(backbone):
    from megaportraits_tpu.losses.perceptual_multi import RomePerceptualLoss

    model = RomePerceptualLoss(backbone=backbone, policy=FP32_POLICY)
    x = jnp.asarray(RNG.random((1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(RNG.random((1, 64, 64, 3)).astype(np.float32))
    vars_ = model.init(KEY, x, y)
    loss = model.apply(vars_, x, y)
    assert np.isfinite(float(loss)) and float(loss) > 0
    same = model.apply(vars_, x, x)
    np.testing.assert_allclose(float(same), 0.0, atol=1e-5)


def test_vggface_trunk_embedding_and_taps():
    from megaportraits_tpu.losses.vggface import InceptionResnetV1

    model = InceptionResnetV1(policy=FP32_POLICY)
    x = jnp.asarray(RNG.random((1, 160, 160, 3)).astype(np.float32))
    vars_ = model.init(KEY, x)
    emb, taps = model.apply(vars_, x, return_taps=True)
    assert emb.shape == (1, 512)
    np.testing.assert_allclose(float(jnp.linalg.norm(emb[0])), 1.0, atol=1e-4)
    assert len(taps) == 4  # children [4,5,6,7] taps


def test_geodesic_loss():
    from megaportraits_tpu.models.repvgg import geodesic_loss
    from megaportraits_tpu.ops.affine_grid import rotation_matrix_from_euler_deg

    r1 = rotation_matrix_from_euler_deg(jnp.asarray([[10.0, 20.0, 5.0]]))
    r2 = rotation_matrix_from_euler_deg(jnp.asarray([[10.0, 20.0, 5.0]]))
    assert float(geodesic_loss(r1, r2)) < 1e-3
    r3 = rotation_matrix_from_euler_deg(jnp.asarray([[100.0, -40.0, 80.0]]))
    assert float(geodesic_loss(r1, r3)) > 0.5


def test_gaze_blink_loss_runs():
    from megaportraits_tpu.losses.gaze import GazeBlinkLoss

    model = GazeBlinkLoss(policy=FP32_POLICY)
    le = jnp.asarray(RNG.random((2, 32, 32, 3)).astype(np.float32))
    re = jnp.asarray(RNG.random((2, 32, 32, 3)).astype(np.float32))
    kp = jnp.asarray(RNG.random((2, 136)).astype(np.float32))
    tg = jnp.asarray(RNG.random((2, 2)).astype(np.float32))
    tb = jnp.asarray(RNG.random((2, 1)).astype(np.float32))
    vars_ = model.init(KEY, le, re, kp, tg, tb)
    loss, gaze, blink = model.apply(vars_, le, re, kp, tg, tb)
    assert np.isfinite(float(loss))
    assert gaze.shape == (2, 2)
    assert blink.shape == (2, 1)


def test_mp_gaze_loss_and_masks():
    from megaportraits_tpu.losses.gaze import eye_masks_from_landmarks, mp_gaze_loss

    mask = eye_masks_from_landmarks([(2, 2), (10, 2), (10, 8), (2, 8)], 16, 16)
    assert mask.shape == (16, 16, 1)
    assert mask.sum() > 0
    pg = jnp.asarray(RNG.random((1, 16, 16, 2)).astype(np.float32))
    tg = jnp.asarray(RNG.random((1, 16, 16, 2)).astype(np.float32))
    m = jnp.asarray(mask)[None]
    loss = mp_gaze_loss(pg, tg, m, m)
    assert np.isfinite(float(loss))
