"""Mixed-precision policy for TPU.

The reference uses CUDA AMP (autocast + GradScaler, reference train.py:145,188).
On TPU the idiomatic equivalent is bfloat16 compute with float32 parameters and
float32 normalization statistics — bf16 has the same exponent range as f32, so
no loss scaling is required.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Parameter / compute / output dtype policy threaded through all modules."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Norm layers reduce in float32 regardless of compute dtype.
    norm_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
