"""Student — distilled real-time per-avatar generator (SPADE-conditioned).

The reference Student (model.py:1614-1645) chains a from-scratch ResNet18
*classifier* (1000-dim vector output) into conv ResBlocks and a SPADE
decoder with no upsampling — it cannot execute as written (SURVEY.md
section 2.1 'Student'). We keep its capability contract (ResNet18-style
encoder, 192->...->24 bottleneck, SIX SPADE res-blocks conditioned on a
per-avatar embedding index, InstanceNorm+ReLU head) and make it a real
image-to-image network designed for the real-time-at-1024 north-star
(BASELINE.md): all SPADE capacity sits at <=1/4 resolution, and a
lightweight IN+conv upsampling tail reaches full resolution — running
SPADE blocks at 1024^2 is HBM-bound (~800 MB per InstanceNorm pass) and
measured 6 fps; this layout reaches real-time (benchmarks/RESULTS.md).

  encoder: ResNet18 trunk stages 0-2 (stride 8, 128 ch) -> conv to 192 ->
           ResBlock chain 192,192,192,192,96,48,24 (stride 1, at /8)
  decoder: SPADEResBlock 24->48->96->192 at /8, x2 up, 192->192 x2 at /4
           (six SPADE blocks, as in the reference list)
  tail:    x2 up + conv3x3-64 + IN + ReLU (at /2),
           x2 up + conv3x3-32 + IN + ReLU (full res), 1x1 conv -> 3, sigmoid
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.resnet import max_pool_3x3_s2
from megaportraits_tpu.nn.blocks import ResBlockBN, SPADEResBlock, _BatchNorm
from megaportraits_tpu.nn.layers import InstanceNorm, TorchConv
from megaportraits_tpu.ops.resize import upsample_nearest


class Student(nn.Module):
    num_avatars: int
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(
        self, xd: jnp.ndarray, avatar_index: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        p = self.policy
        a = self.arch

        def ch(c):  # BN/IN have no group constraint: floor at 8, not 32
            return c if a.width_div <= 1 else max(8, c // a.width_div)

        x = p.cast_to_compute(xd)

        # ResNet18-style stem + stages 1-2 (stride 8 overall).
        x = TorchConv(ch(64), (7, 7), strides=2, padding=3, policy=p,
                      name="stem_conv")(x)
        x = _BatchNorm(p, name="stem_bn")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        x = ResBlockBN(ch(64), policy=p, name="layer1_0")(x, train)
        x = ResBlockBN(ch(64), policy=p, name="layer1_1")(x, train)
        x = ResBlockBN(ch(128), downsample=True, policy=p,
                       name="layer2_0")(x, train)
        x = ResBlockBN(ch(128), policy=p, name="layer2_1")(x, train)

        x = TorchConv(ch(192), (3, 3), padding=1, policy=p, name="adapter")(x)
        for i, c in enumerate([192, 192, 192, 192, 96, 48, 24]):
            x = ResBlockBN(ch(c), policy=p, name=f"enc_res{i}")(x, train)

        # SPADE decoder: capacity at /8 and /4 only.
        for i, c in enumerate([48, 96, 192]):
            x = SPADEResBlock(ch(c), self.num_avatars, policy=p,
                              name=f"dec{i}")(x, avatar_index)
        x = upsample_nearest(x, (2, 2), axes=(1, 2))
        for i in (3, 4, 5):
            x = SPADEResBlock(ch(192), self.num_avatars, policy=p,
                              name=f"dec{i}")(x, avatar_index)

        # Lightweight tail to full resolution.
        x = upsample_nearest(x, (2, 2), axes=(1, 2))
        x = TorchConv(ch(64), (3, 3), padding=1, policy=p,
                      name="tail_conv0")(x)
        x = InstanceNorm()(x)
        x = nn.relu(x)
        x = upsample_nearest(x, (2, 2), axes=(1, 2))
        x = TorchConv(ch(32), (3, 3), padding=1, policy=p,
                      name="tail_conv1")(x)
        x = InstanceNorm()(x)
        x = nn.relu(x)
        x = TorchConv(3, (1, 1), policy=p, name="final_conv")(x)
        return nn.sigmoid(x.astype(jnp.float32))
