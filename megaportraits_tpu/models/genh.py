"""Genh — 512->1024 high-resolution enhancer, and GHR composition.

Reference Genh (model.py:1349-1403): conv7-64 encoder with 3 avg-pool
downsamples, 8x ResBlock2D-64 bottleneck, decoder with 3 bilinear
(align_corners=True) upsamples, final conv7-3 + tanh.

Reference defects fixed here (SURVEY.md section 7 step 8):
  * Genh's blocks are constructed as ``ResBlock2D(64)`` which cannot run
    (missing out_channels arg, model.py:1354) — we use ResBlock2D(64, 64).
  * GHR feeds Gbase's (xhat, pyramids) *tuple* into Genh
    (model.py:1450-1453) — we pass the image.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.gbase import Gbase
from megaportraits_tpu.nn.blocks import ResBlock2D
from megaportraits_tpu.nn.layers import TorchConv
from megaportraits_tpu.ops.resize import avg_pool_2d, linear_resize


def _up2(x):
    sizes = [s * 2 for s in x.shape[1:3]]
    return linear_resize(x, sizes, axes=(1, 2), align_corners=True)


class Genh(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.policy
        a = self.arch
        c = a.ch(64)
        n_mid = 8 if a.width_div <= 1 else a.g2d_blocks
        x = p.cast_to_compute(x)
        x = TorchConv(c, (7, 7), padding=3, policy=p, name="enc_conv")(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="enc_res0")(x, train)
        x = avg_pool_2d(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="enc_res1")(x, train)
        x = avg_pool_2d(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="enc_res2")(x, train)
        x = avg_pool_2d(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="enc_res3")(x, train)
        for i in range(n_mid):
            x = ResBlock2D(c, policy=p, norm=a.norm, name=f"mid_res{i}")(x, train)
        x = _up2(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="dec_res0")(x, train)
        x = _up2(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="dec_res1")(x, train)
        x = _up2(x)
        x = ResBlock2D(c, policy=p, norm=a.norm, name="dec_res2")(x, train)
        x = TorchConv(3, (7, 7), padding=3, policy=p, name="dec_conv")(x)
        return jnp.tanh(x.astype(jnp.float32))


class GHR(nn.Module):
    """Gbase + Genh composition (reference model.py:1444-1453)."""

    policy: Policy = DEFAULT_POLICY
    warp_normalize_mode: str = "reference"
    arch: Arch = FULL

    def setup(self):
        self.gbase = Gbase(
            policy=self.policy, warp_normalize_mode=self.warp_normalize_mode,
            arch=self.arch,
        )
        self.genh = Genh(policy=self.policy, arch=self.arch)

    def __call__(self, xs: jnp.ndarray, xd: jnp.ndarray, train: bool = False):
        xhat_base, _ = self.gbase(xs, xd, train)
        return self.genh(xhat_base, train)
