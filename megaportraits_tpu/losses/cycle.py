"""Cycle-consistency cosine contrastive loss (reference train.py:85-122).

Positive pairs P = [(z_pred, z_d), (z*_pred, z_d)], negative pairs
N = [(z_pred, z_d*), (z*_pred, z_d*)]; cos distances scaled by 5 with margin
0.5; loss = -log(exp(pos) / (exp(pos) + sum(exp(neg)))) averaged.
The reference sums exp(neg) over *all* negative elements (pairs and batch,
train.py:120) — replicated.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def _cosine_distance(
    z_i: jnp.ndarray, z_j: jnp.ndarray, margin: float, scale: float
) -> jnp.ndarray:
    z_i = z_i / jnp.maximum(
        jnp.linalg.norm(z_i, axis=-1, keepdims=True), 1e-12
    )
    z_j = z_j / jnp.maximum(
        jnp.linalg.norm(z_j, axis=-1, keepdims=True), 1e-12
    )
    cos_sim = jnp.sum(z_i * z_j, axis=-1)
    return scale * (cos_sim - margin)


def cosine_loss(
    positive_pairs: List[Tuple[jnp.ndarray, jnp.ndarray]],
    negative_pairs: List[Tuple[jnp.ndarray, jnp.ndarray]],
    margin: float = 0.5,
    scale: float = 5.0,
) -> jnp.ndarray:
    pos = jnp.stack(
        [_cosine_distance(a.astype(jnp.float32), b.astype(jnp.float32),
                          margin, scale) for a, b in positive_pairs]
    )
    neg = jnp.stack(
        [_cosine_distance(a.astype(jnp.float32), b.astype(jnp.float32),
                          margin, scale) for a, b in negative_pairs]
    )
    neg_sum = jnp.sum(jnp.exp(neg))
    loss = -(pos - jnp.log(jnp.exp(pos) + neg_sum))
    return jnp.mean(loss)
