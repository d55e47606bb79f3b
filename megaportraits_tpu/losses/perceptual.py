"""Perceptual losses: VGG feature taps, LPIPS, and the combined
PerceptualLoss of the reference (model.py:1928-2022).

Backbone weights: the reference downloads torchvision VGG19/VGG16, facenet
InceptionResnetV1('vggface2') and the LPIPS linear heads at runtime
(model.py:1935-1947). This environment has no network egress and no
torchvision, so backbones initialize randomly unless a torch state_dict is
supplied via utils/torch_convert.load_vgg_from_torch — the weight-conversion
path demanded by SURVEY.md section 2.5. Randomly-initialized VGG features
still provide a usable random-projection perceptual signal for the overfit
harness; parity numbers require converted weights.

Reference quirks replicated:
  * inputs are ImageNet-normalized once and the SAME normalized tensors are
    fed to both the VGG tap loss and LPIPS (model.py:1951-1964);
  * the gaze slot contributes weights['gaze'] * 1 — the gaze loss itself is
    disabled in the reference (model.py:1961,1971). MediaPipe is host-only
    and unavailable here; the slot stays a constant.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.nn.layers import TorchConv

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# torchvision 'features' configs.
VGG_CFGS = {
    "vgg16": (2, 2, 3, 3, 3),  # convs per stage
    "vgg19": (2, 2, 4, 4, 4),
}
VGG_WIDTHS = (64, 128, 256, 512, 512)

# Tap points (stage, conv-index-within-stage) after ReLU:
# reference vgg19 layers [1,6,11,20,29] == relu{1_1,2_1,3_1,4_1,5_1}.
VGG19_REFERENCE_TAPS = ((0, 0), (1, 0), (2, 0), (3, 0), (4, 0))
# LPIPS-vgg taps: relu{1_2,2_2,3_3,4_3,5_3}.
LPIPS_TAPS = ((0, 1), (1, 1), (2, 2), (3, 2), (4, 2))


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class VGG(nn.Module):
    """VGG-16/19 feature trunk returning activations at `taps`."""

    cfg: str = "vgg19"
    taps: Sequence[Tuple[int, int]] = VGG19_REFERENCE_TAPS
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    def effective_taps(self) -> Sequence[Tuple[int, int]]:
        """Taps after arch truncation (arch.vgg_stages: 0 = all)."""
        if self.arch.vgg_stages:
            return tuple(t for t in self.taps if t[0] < self.arch.vgg_stages)
        return tuple(self.taps)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        p = self.policy
        a = self.arch
        convs_per_stage = VGG_CFGS[self.cfg]
        eff = self.effective_taps()
        taps = set(eff)
        max_stage = max(s for s, _ in taps)
        outputs = {}
        for stage, n_convs in enumerate(convs_per_stage):
            if stage > max_stage:
                break
            for i in range(n_convs):
                x = TorchConv(a.ch(VGG_WIDTHS[stage]), (3, 3), padding=1,
                              policy=p, name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
                if (stage, i) in taps:
                    outputs[(stage, i)] = x
            if stage < len(convs_per_stage) - 1:
                x = max_pool_2x2(x)
        return [outputs[t] for t in eff]


class LPIPS(nn.Module):
    """LPIPS(net='vgg'): unit-normalized VGG16 taps, squared difference,
    1x1 linear heads, spatial mean, summed over taps."""

    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        # LPIPS scaling layer constants.
        shift = jnp.asarray([-0.030, -0.088, -0.188], dtype=jnp.float32)
        scale = jnp.asarray([0.458, 0.448, 0.450], dtype=jnp.float32)
        xs = (x.astype(jnp.float32) - shift) / scale
        ys = (y.astype(jnp.float32) - shift) / scale
        net = VGG(cfg="vgg16", taps=LPIPS_TAPS, policy=p, arch=self.arch,
                  name="vgg16")
        fx = net(p.cast_to_compute(xs))
        fy = net(p.cast_to_compute(ys))
        total = jnp.float32(0.0)
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            head = TorchConv(1, (1, 1), use_bias=False, policy=p,
                             name=f"lin{i}")(diff.astype(p.compute_dtype))
            total = total + jnp.mean(head.astype(jnp.float32), axis=(1, 2, 3))
        return total  # [B]


class PerceptualLoss(nn.Module):
    """Reference PerceptualLoss (model.py:1928-2022).

    weights: {'vgg19': 20, 'vggface': 4|5, 'gaze': 4|5, 'lpips': 10}.
    vggface (enabled via use_vggface) runs the InceptionResnetV1 port
    (losses/vggface.py) with feature L1 at the reference's children-[4,5,6,7]
    taps (model.py:1941). Off by default: ~27M extra frozen params per loss
    instance and it only carries signal with converted pretrained weights.
    """

    weights: Optional[Dict[str, float]] = None
    use_vggface: bool = False
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL

    @nn.compact
    def __call__(self, predicted: jnp.ndarray, target: jnp.ndarray,
                 use_fm_loss: bool = False) -> jnp.ndarray:
        w = self.weights or {"vgg19": 20.0, "vggface": 5.0, "gaze": 4.0,
                             "lpips": 10.0}
        p = self.policy
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        pred_n = ((predicted.astype(jnp.float32) - mean) / std)
        tgt_n = ((target.astype(jnp.float32) - mean) / std)

        total = jnp.float32(0.0)
        if w.get("vgg19", 0.0) or use_fm_loss:
            net = VGG(cfg="vgg19", taps=VGG19_REFERENCE_TAPS, policy=p,
                      arch=self.arch, name="vgg19")
            fp = net(p.cast_to_compute(pred_n))
            ft = net(p.cast_to_compute(tgt_n))
            vgg_loss = sum(
                jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                for a, b in zip(fp, ft)
            )
            total = total + w.get("vgg19", 0.0) * vgg_loss
            if use_fm_loss:
                # Reference feature-matching variant: same taps, target
                # features detached (model.py:1987-1988, 2012-2013).
                import jax

                total = total + sum(
                    jnp.mean(jnp.abs(
                        a.astype(jnp.float32)
                        - jax.lax.stop_gradient(b.astype(jnp.float32))
                    ))
                    for a, b in zip(fp, ft)
                )
        if w.get("vggface", 0.0) and self.use_vggface:
            from megaportraits_tpu.losses.vggface import InceptionResnetV1

            face = InceptionResnetV1(policy=p, name="vggface")
            _, fa = face(p.cast_to_compute(pred_n), return_taps=True)
            _, fb = face(p.cast_to_compute(tgt_n), return_taps=True)
            face_loss = sum(
                jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                for a, b in zip(fa, fb)
            )
            total = total + w["vggface"] * face_loss
        if w.get("lpips", 0.0):
            lp = LPIPS(policy=p, arch=self.arch, name="lpips")(pred_n, tgt_n)
            total = total + w["lpips"] * jnp.mean(lp)
        # Reference gaze slot: constant contribution (model.py:1971).
        total = total + jnp.float32(w.get("gaze", 0.0))
        return total
