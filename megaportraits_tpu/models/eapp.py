"""Eapp — appearance encoder (reference model.py:206-299).

Image [B, H, W, 3] ->
  * volumetric features vs [B, 16, H/8, W/8, 96] (NDHWC): 7x7 conv-64,
    ResBlock_Custom 128/256/512 with avg-pool between, GN+ReLU+1x1 conv-1536,
    reshape 1536 -> (C96 x D16), then 3 rounds of 2x ResBlock3D_Adaptive-96.
    (We instantiate six distinct 3D blocks — the reference accidentally
    defines `resblock3D_96_2` twice so its rounds 1 and 3 share weights,
    model.py:218,225 — documented defect, not replicated.)
  * global descriptor es [B, 512]: CustomResNet50 -> flatten -> Linear(2048,512).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import ResBlockCustom, ResBlock3DAdaptive
from megaportraits_tpu.nn.layers import GroupNorm32, TorchConv, TorchDense
from megaportraits_tpu.models.resnet import CustomResNet50
from megaportraits_tpu.ops.resize import avg_pool_2d

COMPRESS_DIM = 512  # reference model.py:48
VOLUME_DEPTH = 16
VOLUME_CHANNELS = 96


class Eapp(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        p = self.policy
        a = self.arch
        x = p.cast_to_compute(x)

        out = TorchConv(a.ch(64), (7, 7), padding=3, policy=p, name="conv")(x)
        out = ResBlockCustom(2, a.ch(128), policy=p, name="resblock_128")(out)
        out = avg_pool_2d(out)
        out = ResBlockCustom(2, a.ch(256), policy=p, name="resblock_256")(out)
        out = avg_pool_2d(out)
        out = ResBlockCustom(2, a.ch(512), policy=p, name="resblock_512")(out)
        out = avg_pool_2d(out)

        out = GroupNorm32()(out)
        out = nn.relu(out)
        vol_c, vol_d = a.volume_channels, a.volume_depth
        out = TorchConv(vol_c * vol_d, (1, 1), policy=p, name="conv_1")(out)

        # reshape 1536 -> C96 x D16 (torch view(B,96,16,H,W) splits channels
        # with depth minor; NHWC [..,1536] -> [..,96,16] matches) then to
        # NDHWC [B, 16, H, W, 96].
        b, h, w, _ = out.shape
        vs = out.reshape(b, h, w, vol_c, vol_d)
        vs = jnp.transpose(vs, (0, 4, 1, 2, 3))

        for rnd in range(a.eapp_rounds3d):
            vs = ResBlock3DAdaptive(vol_c, policy=p,
                                    name=f"resblock3D_96_r{rnd}_a")(vs)
            vs = ResBlock3DAdaptive(vol_c, policy=p,
                                    name=f"resblock3D_96_r{rnd}_b")(vs)

        es_feat = CustomResNet50(policy=p, arch=a,
                                 name="custom_resnet50")(x, train)
        es = es_feat.reshape(b, -1)  # [B, 2*2*512] = [B, 2048]
        es = TorchDense(a.compress_dim, policy=p, name="fc")(es)
        return vs, es
