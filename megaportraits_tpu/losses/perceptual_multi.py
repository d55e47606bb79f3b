"""Configurable perceptual loss with selectable backbones — the ROME
PerceptualLoss surface (rome_losses.py:402-763: vgg19 / vgg16 / alexnet /
resnet50 / robust_resnet50 / vgg_face_dag backbones, layer-weighted L1 on
(optionally instance-normalized) features, multi-scale pyramid).

Backbone map in this framework:
  vgg19, vgg16        -> losses.perceptual.VGG
  alexnet             -> AlexNetFeatures (below)
  resnet50 /
  robust_resnet50     -> models.resnet ResNet50 trunk stage taps
  vgg_face_dag /
  vggface             -> losses.vggface.InceptionResnetV1 taps
All convert from torch state_dicts (utils/torch_convert and
losses/vggface.convert_inception_resnet).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.losses.perceptual import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG,
    VGG19_REFERENCE_TAPS,
    max_pool_2x2,
)
from megaportraits_tpu.nn.layers import InstanceNorm, TorchConv
from megaportraits_tpu.ops.resize import anti_alias_downsample


class AlexNetFeatures(nn.Module):
    """torchvision alexnet.features, returning post-ReLU taps."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        p = self.policy
        taps = []
        x = TorchConv(64, (11, 11), strides=4, padding=2, policy=p,
                      name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        x = TorchConv(192, (5, 5), padding=2, policy=p, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        x = TorchConv(384, (3, 3), padding=1, policy=p, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = TorchConv(256, (3, 3), padding=1, policy=p, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = TorchConv(256, (3, 3), padding=1, policy=p, name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class _ResNet50Taps(nn.Module):
    """ResNet50 trunk with per-stage taps (for resnet50-family backbones)."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        from megaportraits_tpu.models.resnet import (
            Bottleneck, _BN, max_pool_3x3_s2,
        )
        from megaportraits_tpu.nn.layers import TorchConv as Conv

        p = self.policy
        taps = []
        x = Conv(64, (7, 7), strides=2, padding=3, use_bias=False, policy=p,
                 name="conv1")(x)
        x = _BN(p, name="bn1")(x, False)
        x = nn.relu(x)
        taps.append(x)
        x = max_pool_3x3_s2(x)
        layers = (3, 4, 6, 3)
        planes = (64, 128, 256, 512)
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(layers[stage]):
                x = Bottleneck(planes=planes[stage],
                               stride=stride if i == 0 else 1, policy=p,
                               name=f"layer{stage + 1}_block{i}")(x, False)
            taps.append(x)
        return taps


class RomePerceptualLoss(nn.Module):
    """Layer-weighted feature L1 with selectable backbone + pyramid scales.

    Mirrors rome_losses.PerceptualLoss semantics: ImageNet-normalize,
    extract features at the backbone's taps, optional per-feature instance
    norm ('use_fm_loss'-style normalization), L1 per layer with
    `layer_weights`, averaged over `num_scales` anti-aliased scales.
    """

    backbone: str = "vgg19"
    layer_weights: Optional[Tuple[float, ...]] = None
    num_scales: int = 1
    normalize_features: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        p = self.policy
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        if self.backbone in ("vgg19", "vgg16"):
            taps = VGG19_REFERENCE_TAPS
            net = VGG(cfg=self.backbone, taps=taps, policy=p, name="net")
        elif self.backbone == "alexnet":
            net = AlexNetFeatures(policy=p, name="net")
        elif self.backbone in ("resnet50", "robust_resnet50",
                               "resnet50_scratch_dag"):
            net = _ResNet50Taps(policy=p, name="net")
        elif self.backbone in ("vgg_face_dag", "vggface"):
            from megaportraits_tpu.losses.vggface import InceptionResnetV1

            face = InceptionResnetV1(policy=p, name="net")
            net = lambda x: face(x, return_taps=True)[1]  # noqa: E731
        else:
            raise ValueError(f"unknown backbone {self.backbone}")

        total = jnp.float32(0.0)
        x, y = pred, target
        for scale in range(self.num_scales):
            if scale > 0:
                x = anti_alias_downsample(x, 0.5)
                y = anti_alias_downsample(y, 0.5)
            xn = ((x.astype(jnp.float32) - mean) / std)
            yn = ((y.astype(jnp.float32) - mean) / std)
            fx = net(p.cast_to_compute(xn))
            fy = net(p.cast_to_compute(yn))
            weights = self.layer_weights or (1.0,) * len(fx)
            for w, a, b in zip(weights, fx, fy):
                if self.normalize_features:
                    a = InstanceNorm()(a)
                    b = InstanceNorm()(b)
                total = total + w * jnp.mean(
                    jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
                )
        return total / self.num_scales
