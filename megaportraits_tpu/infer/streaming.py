"""Streaming one-shot reenactment: encode the source once, drive per frame.

The reference re-runs the full Gbase per frame (inference.py:35). On TPU the
source-dependent half (Eapp, source Emtn, s2c warp, G3d) is
driving-invariant, so a streaming session precomputes it and each driving
frame costs only Emtn + c2d warp + projection + G2d — the latency that the
>=30 fps north-star actually measures.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, Policy
from megaportraits_tpu.models.gbase import Gbase


class ReenactmentSession:
    def __init__(self, variables: Any, model: Optional[Gbase] = None,
                 policy: Policy = DEFAULT_POLICY, bn_mode: str = "running"):
        """bn_mode: 'running' = eval-mode BatchNorm (reference
        convention); 'batch' = per-input batch statistics (the GAN
        convention — what small-batch-trained checkpoints need; see
        benchmarks/stage1_quality/README.md)."""
        self.model = model or Gbase(policy=policy)
        self.variables = variables
        if bn_mode == "batch":
            self._encode = jax.jit(
                lambda v, xs: self.model.apply(
                    v, xs, True, method=Gbase.encode_source,
                    mutable=["batch_stats"])[0]
            )
            self._drive = jax.jit(
                lambda v, state, xd: self.model.apply(
                    v, state, xd, True, method=Gbase.drive,
                    mutable=["batch_stats"])[0]
            )
        else:
            self._encode = jax.jit(
                lambda v, xs: self.model.apply(
                    v, xs, method=Gbase.encode_source)
            )
            self._drive = jax.jit(
                lambda v, state, xd: self.model.apply(
                    v, state, xd, method=Gbase.drive
                )
            )
        self.source_state = None

    def set_source(self, xs: jnp.ndarray) -> None:
        """xs: [B, H, W, 3] source image(s)."""
        self.source_state = self._encode(self.variables, xs)

    def __call__(self, xd: jnp.ndarray) -> jnp.ndarray:
        """xd: [B, H, W, 3] driving frame -> [B, H, W, 3] reenacted frame."""
        assert self.source_state is not None, "call set_source first"
        return self._drive(self.variables, self.source_state, xd)
