"""PatchGanEncoder (reference model.py:1702-1722): reflection-padded conv
encoder to a 1x1 embedding, used by contrastive losses in the legacy
trainers."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import _BatchNorm
from megaportraits_tpu.nn.layers import TorchConv


class PatchGanEncoder(nn.Module):
    output_nc: int = 512
    ngf: int = 64
    n_downsampling: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.policy
        x = p.cast_to_compute(x)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = TorchConv(self.ngf, (7, 7), policy=p, name="conv0")(x)
        x = _BatchNorm(p, name="bn0")(x, train)
        x = nn.relu(x)
        for i in range(self.n_downsampling):
            mult = 2**i
            x = TorchConv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                          policy=p, name=f"down{i}")(x)
            x = _BatchNorm(p, name=f"bn{i + 1}")(x, train)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool 1x1
        x = TorchConv(self.output_nc, (1, 1), policy=p, name="proj")(x)
        return x
