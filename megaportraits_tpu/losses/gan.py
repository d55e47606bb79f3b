"""Adversarial objectives (reference train.py:72-82, 129-320).

The reference's generator adversarial term is computed from
``Dbase(pred_frame.detach(), ...)`` (train.py:234) — detached, so it carries
no gradient to the generator; a latent defect we do not replicate. We use
the standard LSGAN generator term by default and also expose the
reference's hinge-style combination for logging parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def discriminator_loss(
    real_pred: jnp.ndarray, fake_pred: jnp.ndarray, loss_type: str = "lsgan"
) -> jnp.ndarray:
    """Reference discriminator_loss (train.py:72-82)."""
    real_pred = real_pred.astype(jnp.float32)
    fake_pred = fake_pred.astype(jnp.float32)
    if loss_type == "lsgan":
        real_loss = jnp.mean((real_pred - 1.0) ** 2)
        fake_loss = jnp.mean(fake_pred**2)
    elif loss_type == "vanilla":
        real_loss = jnp.mean(
            optax.sigmoid_binary_cross_entropy(real_pred, jnp.ones_like(real_pred))
        )
        fake_loss = jnp.mean(
            optax.sigmoid_binary_cross_entropy(fake_pred, jnp.zeros_like(fake_pred))
        )
    elif loss_type == "hinge":
        real_loss = jnp.mean(jnp.maximum(0.0, 1.0 - real_pred))
        fake_loss = jnp.mean(jnp.maximum(0.0, 1.0 + fake_pred))
    else:
        raise NotImplementedError(loss_type)
    return (real_loss + fake_loss) * 0.5


def generator_adversarial_loss(
    fake_pred: jnp.ndarray, loss_type: str = "lsgan"
) -> jnp.ndarray:
    """Generator wants D(fake) -> real."""
    fake_pred = fake_pred.astype(jnp.float32)
    if loss_type == "lsgan":
        return jnp.mean((fake_pred - 1.0) ** 2)
    if loss_type == "vanilla":
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(fake_pred, jnp.ones_like(fake_pred))
        )
    if loss_type == "hinge":
        return -jnp.mean(fake_pred)
    raise NotImplementedError(loss_type)


def hinge_real_fake_loss(
    real_pred: jnp.ndarray, fake_pred: jnp.ndarray, margin: float = 1.0
) -> jnp.ndarray:
    """The reference's HingeEmbeddingLoss combination (train.py:131,229-250):
    target +1 on real (loss = mean(x)), target -1 on fake
    (loss = mean(max(0, margin - x))), averaged."""
    real_loss = jnp.mean(real_pred.astype(jnp.float32))
    fake_loss = jnp.mean(
        jnp.maximum(0.0, margin - fake_pred.astype(jnp.float32))
    )
    return 0.5 * (real_loss + fake_loss)


def feature_matching_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Reference 'feature matching' is plain pixel MSE (train.py:132,253)."""
    return jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    )
