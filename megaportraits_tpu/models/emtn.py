"""Emtn — motion encoder (reference model.py:869-907).

Outputs per image:
  * rotation  [B, 3] Euler degrees from the frozen SixDRepNet detector
    (model.py:876,890; gradients stopped — the reference's detector is a
    plain attribute outside nn.Module registration, so its weights never
    receive optimizer updates),
  * translation [B, 3] — resnet18-with-fc-6 output, last 3 slots
    (model.py:874-875,898; the first 3 are discarded),
  * expression [B, 512] — headless resnet18, global pool tiled to 2x2
    (the reference's AdaptiveAvgPool2d((2,2)) runs *after* the trunk's own
    1x1 global pool, model.py:880-881), flatten -> Linear(2048 -> 512).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from megaportraits_tpu.core.arch import Arch, FULL
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.repvgg import SixDRepNet
from megaportraits_tpu.models.resnet import ResNet18, _ResNetTrunk, BasicBlock
from megaportraits_tpu.nn.layers import TorchDense

COMPRESS_DIM = 512


class Emtn(nn.Module):
    policy: Policy = DEFAULT_POLICY
    arch: Arch = FULL
    # The frozen SixDRepNet was trained at 224x224 (its detector pipeline
    # resizes to 224, mysixdrepnet.py:798-801, though the reference's
    # predict() skips the transform and feeds raw 512 crops). Feeding the
    # estimator its training resolution is both more faithful to the
    # estimator and ~5x cheaper at 512 inputs. Set to 0 to disable.
    rotation_input_size: int = 224
    # Translation/expression heads are global-pooled ResNet18s — their
    # parameters are input-size agnostic, and pose/translation/expression
    # are global image properties. 256px input quarters their cost at 512
    # training/serving resolution (the reference's own debug traces exercise
    # the descriptor path at 256, model.py:247). Set to 0 to feed full res.
    descriptor_input_size: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        from megaportraits_tpu.ops.resize import linear_resize

        p = self.policy
        a = self.arch
        x = p.cast_to_compute(x)

        def maybe_resize(img, s):
            if s and (img.shape[1] > s or img.shape[2] > s):
                return linear_resize(img, (s, s), axes=(1, 2),
                                     align_corners=False)
            return img

        # Frozen head-pose rotation (SixDRepNet, deploy-mode RepVGG-B1g2).
        rot_in = maybe_resize(x, self.rotation_input_size)
        _, euler_deg = SixDRepNet(policy=p, arch=a,
                                  name="rotation_net")(rot_in, False)
        rotation = jax.lax.stop_gradient(euler_deg)
        x = maybe_resize(x, self.descriptor_input_size)

        # Translation from the resnet18 'head pose' net (fc -> 6, keep [3:]).
        head_pose = ResNet18(num_classes=6, policy=p, arch=a,
                             name="head_pose_net")(x, train)
        translation = head_pose[:, 3:].astype(jnp.float32)

        # Expression descriptor.
        feats = _ResNetTrunk(BasicBlock, a.resnet18_layers, policy=p, arch=a,
                             name="expression_net")(x, train)
        pooled = jnp.mean(feats, axis=(1, 2))  # trunk global pool (1x1)
        tiled = jnp.tile(pooled[:, None, :], (1, 4, 1))  # 2x2 adaptive pool
        flat = tiled.reshape(x.shape[0], -1)  # [B, 2048]
        expression = TorchDense(a.compress_dim, policy=p, name="fc")(flat)
        return rotation, translation, expression.astype(jnp.float32)
