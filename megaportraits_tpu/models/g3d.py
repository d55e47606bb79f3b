"""G3d — 3D U-Net over the canonical volume (reference model.py:571-597).

Down: ResBlock3D 96 -> avgpool -> 192 -> avgpool -> 384 -> avgpool -> 768.
Up:   768 -> 384 -> up x2 -> 192 -> up -> 96 -> up, then final 3x3x3 conv-96.
All trilinear upsamples use align_corners=True. Input/output
[B, 16, 64, 64, 96] NDHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import ResBlock3D
from megaportraits_tpu.nn.layers import TorchConv
from megaportraits_tpu.ops.resize import avg_pool_3d, linear_resize


def _up2(x):
    sizes = [s * 2 for s in x.shape[1:4]]
    return linear_resize(x, sizes, axes=(1, 2, 3), align_corners=True)


class G3d(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        a = self.arch
        stages = a.g3d_stages  # reference: 3 pools, widths 96..768
        chans = [a.ch(a.volume_channels * 2 ** i) if a.width_div > 1
                 else a.volume_channels * 2 ** i
                 for i in range(stages + 1)]
        x = ResBlock3D(chans[0], policy=p, name="down1")(x)
        for i in range(1, stages + 1):
            x = avg_pool_3d(x)
            x = ResBlock3D(chans[i], policy=p, name=f"down{i + 1}")(x)
        for j, i in enumerate(range(stages - 1, -1, -1)):
            x = ResBlock3D(chans[i], policy=p, name=f"up{j + 1}")(x)
            x = _up2(x)
        return TorchConv(a.volume_channels, (3, 3, 3), padding=1, policy=p,
                         name="final_conv")(x)
