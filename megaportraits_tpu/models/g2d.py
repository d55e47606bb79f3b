"""G2d — 2D synthesis network (reference model.py:715-763).

Projected volume [B, H/8, W/8, 96] -> 1x1 conv 96->1536 -> 1x1 1536->512 ->
8x ResBlock2D-512 -> 3x (bilinear up x2 (align_corners=True) + ResBlock2D
512->256->128->64) -> GN+ReLU+3x3 conv-3 + sigmoid -> [B, H, W, 3].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import ResBlock2D
from megaportraits_tpu.nn.layers import GroupNorm32, TorchConv
from megaportraits_tpu.ops.resize import linear_resize


def _up2(x):
    sizes = [s * 2 for s in x.shape[1:3]]
    return linear_resize(x, sizes, axes=(1, 2), align_corners=True)


class G2d(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.policy
        x = TorchConv(1536, (1, 1), policy=p, name="reshape_conv")(x)
        x = TorchConv(512, (1, 1), policy=p, name="conv1x1")(x)
        for i in range(8):
            x = ResBlock2D(512, policy=p, name=f"res{i}")(x, train)
        x = _up2(x)
        x = ResBlock2D(256, policy=p, name="up1")(x, train)
        x = _up2(x)
        x = ResBlock2D(128, policy=p, name="up2")(x, train)
        x = _up2(x)
        x = ResBlock2D(64, policy=p, name="up3")(x, train)
        x = GroupNorm32()(x)
        x = nn.relu(x)
        x = TorchConv(3, (3, 3), padding=1, policy=p, name="final_conv")(x)
        return nn.sigmoid(x.astype(jnp.float32))
