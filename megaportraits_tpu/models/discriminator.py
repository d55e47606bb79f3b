"""Conditional PatchGAN discriminator (reference model.py:1902-1926).

cat(img_A, img_B) over channels -> 4x [conv4x4 s2 (+InstanceNorm from the
2nd block) + LeakyReLU(0.2)] 64->512 -> zero-pad (left,top) -> conv4x4 s1
-> 1 logit channel. For 512x512 inputs the output patch map is 32x32
(train.py:130's (1, H/16, W/16)).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import InstanceNorm, TorchConv


class Discriminator(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, img_a: jnp.ndarray, img_b: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        a = self.arch
        x = jnp.concatenate(
            [p.cast_to_compute(img_a), p.cast_to_compute(img_b)], axis=-1
        )
        chans = [a.ch(64 * 2 ** i) if a.width_div > 1 else 64 * 2 ** i
                 for i in range(a.disc_stages)]
        for i, ch in enumerate(chans):
            x = TorchConv(ch, (4, 4), strides=2, padding=1, policy=p,
                          name=f"block{i}_conv")(x)
            if i > 0:
                x = InstanceNorm()(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        # nn.ZeroPad2d((1, 0, 1, 0)): (left, right, top, bottom).
        x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        x = TorchConv(1, (4, 4), padding=1, use_bias=False, policy=p,
                      name="final_conv")(x)
        return x.astype(jnp.float32)
