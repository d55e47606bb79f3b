"""G3d — 3D U-Net over the canonical volume (reference model.py:571-597).

Down: ResBlock3D 96 -> avgpool -> 192 -> avgpool -> 384 -> avgpool -> 768.
Up:   768 -> 384 -> up x2 -> 192 -> up -> 96 -> up, then final 3x3x3 conv-96.
All trilinear upsamples use align_corners=True. Input/output
[B, 16, 64, 64, 96] NDHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import ResBlock3D
from megaportraits_tpu.nn.layers import TorchConv
from megaportraits_tpu.ops.resize import avg_pool_3d, linear_resize


def _up2(x):
    sizes = [s * 2 for s in x.shape[1:4]]
    return linear_resize(x, sizes, axes=(1, 2, 3), align_corners=True)


class G3d(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        x = ResBlock3D(96, policy=p, name="down1")(x)
        x = avg_pool_3d(x)
        x = ResBlock3D(192, policy=p, name="down2")(x)
        x = avg_pool_3d(x)
        x = ResBlock3D(384, policy=p, name="down3")(x)
        x = avg_pool_3d(x)
        x = ResBlock3D(768, policy=p, name="down4")(x)

        x = ResBlock3D(384, policy=p, name="up1")(x)
        x = _up2(x)
        x = ResBlock3D(192, policy=p, name="up2")(x)
        x = _up2(x)
        x = ResBlock3D(96, policy=p, name="up3")(x)
        x = _up2(x)
        return TorchConv(96, (3, 3, 3), padding=1, policy=p, name="final_conv")(x)
