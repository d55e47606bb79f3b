"""G2d — 2D synthesis network (reference model.py:715-763).

Projected volume [B, H/8, W/8, 96] -> 1x1 conv 96->1536 -> 1x1 1536->512 ->
8x ResBlock2D-512 -> 3x (bilinear up x2 (align_corners=True) + ResBlock2D
512->256->128->64) -> GN+ReLU+3x3 conv-3 + sigmoid -> [B, H, W, 3].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import ResBlock2D
from megaportraits_tpu.nn.layers import GroupNorm32, TorchConv
from megaportraits_tpu.ops.resize import linear_resize


def _up2(x):
    sizes = [s * 2 for s in x.shape[1:3]]
    return linear_resize(x, sizes, axes=(1, 2), align_corners=True)


class G2d(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL
    # Run the 8-block 512-channel trunk as ONE fused Pallas kernel at
    # inference (ops/pallas/g2d_chain_v2) — activations never leave VMEM
    # between blocks. Opt-in; batch is processed per-sample.
    use_chain_kernel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.policy
        a = self.arch
        x = TorchConv(a.ch(1536), (1, 1), policy=p, name="reshape_conv")(x)
        x = TorchConv(a.ch(512), (1, 1), policy=p, name="conv1x1")(x)
        trunk = [ResBlock2D(a.ch(512), policy=p, norm=a.norm,
                             name=f"res{i}")
                 for i in range(a.g2d_blocks)]
        chain_ok = (
            self.use_chain_kernel and not train and a.norm == "batch"
            and not self.is_initializing()
            and x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0
        )
        if chain_ok:
            from megaportraits_tpu.ops.pallas.g2d_chain_v2 import (
                fused_resblock_chain_v2,
            )

            cdt = p.compute_dtype
            ws, scs, shs = [], [], []
            for blk in trunk:
                k1, k2, s1, t1, s2, t2 = blk(x, train, chain_params=True)
                ws.append(jnp.stack([k1, k2]).astype(cdt))
                scs.append(jnp.stack([s1, s2]))
                shs.append(jnp.stack([t1, t2]))
            weights = jnp.stack(ws)             # [8, 2, 3, 3, 512, 512]
            scales = jnp.stack(scs)             # [8, 2, 512] f32
            shifts = jnp.stack(shs)
            y_tile = max(2, min(8, x.shape[1] // 2))
            x = jnp.stack([
                fused_resblock_chain_v2(x[i].astype(cdt), weights,
                                        scales, shifts, y_tile=y_tile)
                for i in range(x.shape[0])
            ])
        else:
            for blk in trunk:
                x = blk(x, train)
        x = _up2(x)
        x = ResBlock2D(a.ch(256), policy=p, norm=a.norm,
                       name="up1")(x, train)
        x = _up2(x)
        x = ResBlock2D(a.ch(128), policy=p, norm=a.norm,
                       name="up2")(x, train)
        x = _up2(x)
        x = ResBlock2D(a.ch(64), policy=p, norm=a.norm,
                       name="up3")(x, train)
        x = GroupNorm32()(x)
        x = nn.relu(x)
        x = TorchConv(3, (3, 3), padding=1, policy=p, name="final_conv")(x)
        return nn.sigmoid(x.astype(jnp.float32))
