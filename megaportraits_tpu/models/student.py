"""Student — distilled real-time per-avatar generator (SPADE-conditioned).

The reference Student (model.py:1614-1645) chains a from-scratch ResNet18
*classifier* (1000-dim vector output) into conv ResBlocks and a SPADE
decoder with no upsampling — it cannot execute as written (SURVEY.md
section 2.1 'Student'). We keep its capability contract (ResNet18-style
encoder, 192->...->24 bottleneck, 6 SPADE res-blocks conditioned on a
per-avatar embedding index, InstanceNorm+ReLU+1x1 conv head) and make it a
real image-to-image network:

  encoder: ResNet18 trunk stages 0-2 (stride 8, 128 ch) -> conv to 192 ->
           ResBlock chain 192,192,192,192,96,48,24 (stride 1)
  decoder: SPADEResBlock 24->48->96 with x2 nearest upsample between
           (back to full resolution at stride 1), then SPADE blocks
           192,192,192 as in the reference list
  head:    InstanceNorm -> ReLU -> 1x1 conv -> 3, sigmoid

Distillation target is GHR's output (train_student, train_highres.py:365).
At 1024x1024 the whole forward is a single fused XLA graph.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.resnet import max_pool_3x3_s2
from megaportraits_tpu.nn.blocks import ResBlockBN, SPADEResBlock, _BatchNorm
from megaportraits_tpu.nn.layers import InstanceNorm, TorchConv
from megaportraits_tpu.ops.resize import upsample_nearest


class Student(nn.Module):
    num_avatars: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(
        self, xd: jnp.ndarray, avatar_index: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        p = self.policy
        x = p.cast_to_compute(xd)

        # ResNet18-style stem + stages 1-2 (stride 8 overall).
        x = TorchConv(64, (7, 7), strides=2, padding=3, policy=p,
                      name="stem_conv")(x)
        x = _BatchNorm(p, name="stem_bn")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        x = ResBlockBN(64, policy=p, name="layer1_0")(x, train)
        x = ResBlockBN(64, policy=p, name="layer1_1")(x, train)
        x = ResBlockBN(128, downsample=True, policy=p, name="layer2_0")(x, train)
        x = ResBlockBN(128, policy=p, name="layer2_1")(x, train)

        x = TorchConv(192, (3, 3), padding=1, policy=p, name="adapter")(x)
        for i, ch in enumerate([192, 192, 192, 192, 96, 48, 24]):
            x = ResBlockBN(ch, policy=p, name=f"enc_res{i}")(x, train)

        # SPADE decoder, upsampling back to full resolution (x8).
        x = SPADEResBlock(48, self.num_avatars, policy=p, name="dec0")(
            x, avatar_index
        )
        x = upsample_nearest(x, (2, 2), axes=(1, 2))
        x = SPADEResBlock(96, self.num_avatars, policy=p, name="dec1")(
            x, avatar_index
        )
        x = upsample_nearest(x, (2, 2), axes=(1, 2))
        x = SPADEResBlock(192, self.num_avatars, policy=p, name="dec2")(
            x, avatar_index
        )
        x = upsample_nearest(x, (2, 2), axes=(1, 2))
        x = SPADEResBlock(192, self.num_avatars, policy=p, name="dec3")(
            x, avatar_index
        )
        x = SPADEResBlock(192, self.num_avatars, policy=p, name="dec4")(
            x, avatar_index
        )
        x = SPADEResBlock(192, self.num_avatars, policy=p, name="dec5")(
            x, avatar_index
        )

        x = InstanceNorm()(x)
        x = nn.relu(x)
        x = TorchConv(3, (1, 1), policy=p, name="final_conv")(x)
        return nn.sigmoid(x.astype(jnp.float32))
