"""Gbase — the stage-1 one-shot reenactment generator.

Pipeline (reference Gbase.forward, model.py:1140-1180; call stack SURVEY.md
section 3.2):

    vs, es = Eapp(xs)                      # volume + appearance descriptor
    Rs, ts, zs = Emtn(xs); Rd, td, zd = Emtn(xd)
    w_s2c = WarpGenerator(invert=True)(Rs, ts, zs, es)
    vc = apply_warping_field(vs, w_s2c)    # -> canonical volume
    vc2d = G3d(vc)
    w_c2d = WarpGenerator(invert=False)(Rd, td, zd, es)
    vc2d_warped = apply_warping_field(vc2d, w_c2d)
    projected = sum over depth             # orthographic projection P
    xhat = G2d(projected)                  # [B, H, W, 3] in [0, 1]
    pyramids = anti-aliased {0.5, 0.25} downsamples of xhat

The whole forward is one XLA graph: batched, channels-last, bf16 compute.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.eapp import Eapp
from megaportraits_tpu.models.emtn import Emtn
from megaportraits_tpu.models.g2d import G2d
from megaportraits_tpu.models.g3d import G3d
from megaportraits_tpu.models.warpgen import WarpGenerator
from megaportraits_tpu.ops.resize import anti_alias_downsample
from megaportraits_tpu.ops.warp import apply_warping_field

PYRAMID_SCALES = (0.5, 0.25)


class Gbase(nn.Module):
    policy: Policy = DEFAULT_POLICY
    # 'reference' replicates the reference's renormalization quirk
    # (model.py:1056-1058) for checkpoint parity; 'standard' is the textbook
    # grid+flow sampling.
    warp_normalize_mode: str = "reference"
    # Rematerialize heavy submodules in the backward pass — required to
    # fit the fused multi-forward training graph at 512^2 in HBM
    # (jax.checkpoint; trades extra forward FLOPs for activations).
    # False/"none": no remat; True/"full": remat every submodule;
    # "selective": remat only the large-activation encoders/decoders
    # (Eapp, G2d) and keep the cheap/small modules' activations resident —
    # measured ~same memory headroom with fewer recomputed FLOPs.
    remat: object = False
    # Emtn input resolutions (serving levers; 0 = full res). PARITY NOTE:
    # the defaults change activations vs the reference — use
    # ModelConfig.parity() / configs/inference/parity.yaml (full res, fp32)
    # for any reference-checkpoint parity measurement.
    rotation_input_size: int = 224
    descriptor_input_size: int = 256
    # Width/depth scale preset (core/arch.py); FULL = the reference sizes.
    arch: Arch = FULL

    def setup(self):
        mode = self.remat
        if mode is True:
            mode = "full"
        elif not mode:
            mode = "none"
        eapp_cls, emtn_cls = Eapp, Emtn
        g3d_cls, g2d_cls, warp_cls = G3d, G2d, WarpGenerator
        if mode in ("full", "selective"):
            eapp_cls = nn.remat(Eapp, static_argnums=(2,))
            g2d_cls = nn.remat(G2d, static_argnums=(2,))
        if mode == "full":
            emtn_cls = nn.remat(Emtn, static_argnums=(2,))
            g3d_cls = nn.remat(G3d)
            warp_cls = nn.remat(WarpGenerator)
        self.appearance_encoder = eapp_cls(policy=self.policy, arch=self.arch)
        self.motion_encoder = emtn_cls(
            policy=self.policy,
            rotation_input_size=self.rotation_input_size,
            descriptor_input_size=self.descriptor_input_size,
            arch=self.arch,
        )
        self.warp_generator_s2c = warp_cls(invert=True, policy=self.policy,
                                           arch=self.arch)
        self.warp_generator_c2d = warp_cls(invert=False, policy=self.policy,
                                           arch=self.arch)
        self.g3d = g3d_cls(policy=self.policy, arch=self.arch)
        self.g2d = g2d_cls(policy=self.policy, arch=self.arch)

    def __call__(
        self, xs: jnp.ndarray, xd: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        vs, es = self.appearance_encoder(xs, train)
        rs, ts, zs = self.motion_encoder(xs, train)
        rd, td, zd = self.motion_encoder(xd, train)
        xhat = self.synthesize(vs, es, rs, ts, zs, rd, td, zd, train)
        return xhat, self.pyramids(xhat)

    def synthesize(self, vs, es, rs, ts, zs, rd, td, zd, train: bool = False):
        """Core synthesis from precomputed appearance/motion descriptors.

        Exposed separately so PairwiseTransferLoss can re-mix descriptors
        (reference model.py:2190-2218) without re-encoding.
        """
        w_s2c = self.warp_generator_s2c(rs, ts, zs, es)
        vc = apply_warping_field(vs, w_s2c, self.warp_normalize_mode)
        vc2d = self.g3d(vc)
        w_c2d = self.warp_generator_c2d(rd, td, zd, es)
        vc2d_warped = apply_warping_field(vc2d, w_c2d, self.warp_normalize_mode)
        projected = jnp.sum(vc2d_warped, axis=1)  # orthographic projection
        return self.g2d(projected, train)

    def encode_motion(self, x: jnp.ndarray, train: bool = False):
        return self.motion_encoder(x, train)

    def encode_appearance(self, x: jnp.ndarray, train: bool = False):
        return self.appearance_encoder(x, train)

    def encode_source(self, xs: jnp.ndarray, train: bool = False):
        """One-time source encoding for streaming reenactment.

        Everything driving-independent is precomputed here — appearance
        volume, source motion, source->canonical warp, G3d — so `drive`
        only runs the driving-side half per frame (the production serving
        path; roughly halves per-frame cost vs a full forward).
        """
        vs, es = self.appearance_encoder(xs, train)
        rs, ts, zs = self.motion_encoder(xs, train)
        w_s2c = self.warp_generator_s2c(rs, ts, zs, es)
        vc = apply_warping_field(vs, w_s2c, self.warp_normalize_mode)
        vc2d = self.g3d(vc)
        return {"vc2d": vc2d, "es": es}

    def drive(self, source_state, xd: jnp.ndarray, train: bool = False):
        """Per-driving-frame path given a precomputed source state."""
        rd, td, zd = self.motion_encoder(xd, train)
        w_c2d = self.warp_generator_c2d(rd, td, zd, source_state["es"])
        vc2d_warped = apply_warping_field(
            source_state["vc2d"], w_c2d, self.warp_normalize_mode
        )
        projected = jnp.sum(vc2d_warped, axis=1)
        return self.g2d(projected, train)

    def pairwise_outputs(
        self, i1: jnp.ndarray, i2: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """VASA pairwise-transfer passes (reference model.py:2190-2218).

        Returns (I_pose, I_exp): appearance of i1 with (pose of i2 +
        expression of i1) vs (pose of i1 + expression of i2); both warp
        generators receive the same mixed descriptors, as in the reference.
        """
        vs1, es1 = self.appearance_encoder(i1, train)
        rs1, ts1, zs1 = self.motion_encoder(i1, train)
        rs2, ts2, zs2 = self.motion_encoder(i2, train)
        i_pose = self.synthesize(vs1, es1, rs2, ts2, zs1, rs2, ts2, zs1, train)
        i_exp = self.synthesize(vs1, es1, rs1, ts1, zs2, rs1, ts1, zs2, train)
        return i_pose, i_exp

    def pyramids(self, xhat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {
            str(s): anti_alias_downsample(xhat, s) for s in PYRAMID_SCALES
        }
