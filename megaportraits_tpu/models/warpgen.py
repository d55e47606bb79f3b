"""Expression warp generators (reference model.py:415-471, 927-1024).

FlowField: latent [B,512] -> 1x1 conv to 2048 -> reshape to a [4,1,1,512]
volume -> 4x (ResBlock3D_Adaptive + nearest upsample) 512->256->128->64->32
-> 3x3x3 conv-3 -> GroupNorm(1) -> ReLU -> tanh -> [B,16,16,16,3] flow.
(The reference applies ReLU *then* tanh, clipping flow to be non-negative —
replicated for checkpoint parity; see model.py:462-465.)

WarpGenerator (shared S2C/C2D body): w = w_rt + resize(w_em) where
w_em = FlowField((z + e) @ A) and w_rt is the rotation/translation affine
grid over 64^3; S2C inverts the affine (model.py:965), C2D does not
(model.py:1016).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.blocks import ResBlock3DAdaptive
from megaportraits_tpu.nn.layers import AffineGroupNorm, TorchConv
from megaportraits_tpu.ops.affine_grid import compute_rt_warp
from megaportraits_tpu.ops.resize import linear_resize, upsample_nearest

COMPRESS_DIM = 512


class FlowField(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, z_sum: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        a = self.arch
        cdim = a.compress_dim
        # [B,512] == the reference's [B,512,1,1] for a 1x1 conv.
        x = TorchConv(cdim * 4, (1, 1), policy=p, name="conv1x1")(
            z_sum[:, None, None, :]
        )  # [B,1,1,2048]
        # torch view(-1, 512, 4, 1, 1): channel-major 512, depth minor 4.
        b = x.shape[0]
        x = x.reshape(b, 1, 1, cdim, 4)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # [B,4,1,1,512] (D,H,W,C)

        x = ResBlock3DAdaptive(a.ch(256), policy=p, name="resblock1")(x)
        x = upsample_nearest(x, (2, 2, 2), axes=(1, 2, 3))
        x = ResBlock3DAdaptive(a.ch(128), policy=p, name="resblock2")(x)
        x = upsample_nearest(x, (2, 2, 2), axes=(1, 2, 3))
        x = ResBlock3DAdaptive(a.ch(64), policy=p, name="resblock3")(x)
        x = upsample_nearest(x, (1, 2, 2), axes=(1, 2, 3))
        x = ResBlock3DAdaptive(a.ch(32), policy=p, name="resblock4")(x)
        x = upsample_nearest(x, (1, 2, 2), axes=(1, 2, 3))

        x = TorchConv(3, (3, 3, 3), padding=1, policy=p, name="conv3x3x3")(x)
        x = AffineGroupNorm(num_groups=1, policy=p, name="gn")(x)
        x = nn.relu(x)
        x = jnp.tanh(x)
        return x  # [B, 16, 16, 16, 3]


class WarpGenerator(nn.Module):
    """S2C (invert=True) / C2D (invert=False) warp generator."""

    invert: bool
    grid_size: int = 0  # 0 = use arch.grid_size (reference: 64)
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(
        self,
        rotation: jnp.ndarray,  # [B,3] Euler degrees
        translation: jnp.ndarray,  # [B,3]
        z: jnp.ndarray,  # [B,512] expression descriptor
        e: jnp.ndarray,  # [B,512] appearance descriptor
    ) -> jnp.ndarray:
        p = self.policy
        grid_size = self.grid_size or self.arch.grid_size
        adaptive_matrix = self.param(
            "adaptive_matrix_gamma",
            nn.initializers.normal(stddev=1.0),  # torch.randn (model.py:934)
            (self.arch.compress_dim, self.arch.compress_dim),
            p.param_dtype,
        )
        z_sum = (z + e).astype(p.compute_dtype)
        z_sum = z_sum @ adaptive_matrix.astype(p.compute_dtype)

        w_em = FlowField(policy=p, arch=self.arch, name="flowfield")(z_sum)
        w_rt = compute_rt_warp(
            rotation.astype(jnp.float32),
            translation.astype(jnp.float32),
            invert=self.invert,
            grid_size=grid_size,
        )  # [B, 64, 64, 64, 3] float32
        w_em = linear_resize(
            w_em.astype(jnp.float32),
            (grid_size,) * 3,
            axes=(1, 2, 3),
            align_corners=False,
        )
        return w_rt + w_em  # [B, D, H, W, 3]
