"""Loss-function tests, including golden parity vs torch re-derivations."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import FP32_POLICY
from megaportraits_tpu.losses import (
    LPIPS,
    PerceptualLoss,
    cosine_loss,
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    hinge_real_fake_loss,
)

RNG = np.random.default_rng(1)


def test_discriminator_loss_matches_reference():
    real = RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
    fake = RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
    got = discriminator_loss(jnp.asarray(real), jnp.asarray(fake), "lsgan")
    rt, ft = torch.from_numpy(real), torch.from_numpy(fake)
    ref = ((rt - 1).pow(2).mean() + ft.pow(2).mean()) * 0.5
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)

    got_v = discriminator_loss(jnp.asarray(real), jnp.asarray(fake), "vanilla")
    ref_v = (
        F.binary_cross_entropy_with_logits(rt, torch.ones_like(rt))
        + F.binary_cross_entropy_with_logits(ft, torch.zeros_like(ft))
    ) * 0.5
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)


def test_hinge_real_fake_matches_torch_hinge_embedding():
    real = RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
    fake = RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
    got = hinge_real_fake_loss(jnp.asarray(real), jnp.asarray(fake))
    crit = torch.nn.HingeEmbeddingLoss(reduction="mean")
    rt, ft = torch.from_numpy(real), torch.from_numpy(fake)
    ref = 0.5 * (
        crit(rt, torch.ones_like(rt)) + crit(ft, -torch.ones_like(ft))
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_cosine_loss_matches_reference_formula():
    z = [RNG.standard_normal((2, 16)).astype(np.float32) for _ in range(4)]
    got = cosine_loss(
        [(jnp.asarray(z[0]), jnp.asarray(z[1]))],
        [(jnp.asarray(z[2]), jnp.asarray(z[3]))],
    )

    def cos_dist(a, b):
        a = F.normalize(torch.from_numpy(a), dim=-1)
        b = F.normalize(torch.from_numpy(b), dim=-1)
        return 5.0 * ((a * b).sum(-1) - 0.5)

    pos = torch.stack([cos_dist(z[0], z[1])])
    neg = torch.stack([cos_dist(z[2], z[3])])
    ref = -torch.log(
        torch.exp(pos) / (torch.exp(pos) + torch.sum(torch.exp(neg)))
    ).mean()
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_generator_adv_and_fm():
    fake = RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
    got = generator_adversarial_loss(jnp.asarray(fake), "lsgan")
    np.testing.assert_allclose(float(got), float(((fake - 1) ** 2).mean()),
                               rtol=1e-6)
    a = RNG.random((2, 8, 8, 3)).astype(np.float32)
    b = RNG.random((2, 8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        float(feature_matching_loss(jnp.asarray(a), jnp.asarray(b))),
        float(((a - b) ** 2).mean()),
        rtol=1e-6,
    )


def test_lpips_zero_for_identical_inputs():
    model = LPIPS(policy=FP32_POLICY)
    x = jnp.asarray(RNG.random((1, 32, 32, 3)).astype(np.float32)) * 2 - 1
    vars_ = model.init(jax.random.PRNGKey(0), x, x)
    out = model.apply(vars_, x, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_perceptual_loss_runs_and_is_positive():
    model = PerceptualLoss(policy=FP32_POLICY)
    x = jnp.asarray(RNG.random((1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(RNG.random((1, 32, 32, 3)).astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0), x, y)
    out = model.apply(vars_, x, y)
    assert np.isfinite(float(out))
    # gaze slot constant contributes 4.0 even for identical inputs
    same = model.apply(vars_, x, x)
    np.testing.assert_allclose(float(same), 4.0, atol=1e-5)
