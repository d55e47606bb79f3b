"""Disentanglement losses (reference model.py:2186-2261).

PairwiseTransferLoss (VASA-style): re-mix motion descriptors of two frames
of the SAME video through Gbase's synthesis path — pose from I2 with
expression from I1 vs pose from I1 with expression from I2 — and L1 the two
outputs. Uses Gbase.synthesize so the appearance volume is encoded once.

IdentitySimilarityLoss: cosine similarity of face embeddings between the
source and the full cross-transfer output. (The reference's *used* variant
computes a vggface-weighted PerceptualLoss between two real frames,
train.py:143,270 — carrying no generator gradient; we implement the
documented intent, reference model.py:2221-2261.)
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp


def pairwise_transfer_loss(
    gbase_apply: Callable,
    variables: Any,
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    train: bool = False,
) -> jnp.ndarray:
    """L1 between pose-transfer and expression-transfer outputs.

    `gbase_apply(variables, xs, xd, train, mix)` must run Gbase with mixed
    descriptors; see train/train_base.py:_pairwise_outputs.
    """
    i_pose, i_exp = gbase_apply(variables, i1, i2, train)
    return jnp.mean(
        jnp.abs(i_pose.astype(jnp.float32) - i_exp.astype(jnp.float32))
    )


def identity_similarity_loss(
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    source: jnp.ndarray,
    transferred: jnp.ndarray,
) -> jnp.ndarray:
    """Negative cosine similarity between identity embeddings."""
    a = embed_fn(source).astype(jnp.float32)
    b = embed_fn(transferred).astype(jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return -jnp.mean(jnp.sum(a * b, axis=-1))
