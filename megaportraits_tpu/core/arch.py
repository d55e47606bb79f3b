"""Architecture scale presets.

The full-size architecture is fixed by the reference (SURVEY.md §2.1); this
module makes every width/depth a function of one ``Arch`` value so the SAME
training graph — every component, every loss term, both optimizers, the
DP x FSDP shardings — can be built at a gate-sized scale that compiles COLD
on a 1-core host in minutes (the driver's ``dryrun_multichip`` contract).

``FULL`` is the identity: all defaults match the reference exactly, so
golden-parity tests and checkpoints are unaffected. ``TINY`` divides channel
widths by 8 (floored at 32 and rounded up to a multiple of 32 — every
GroupNorm in the block zoo uses 32 groups) and trims depths: 1 block per
ResNet/RepVGG stage, 1 Eapp 3D round, 2 of 8 G2d trunk blocks, VGG taps at
2 stages, 2 discriminator stages, a 16^3 warp grid and a 4-deep volume.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Arch:
    name: str = "full"
    # Global channel divisor; ch() floors at 32 and rounds up to a multiple
    # of 32 (GroupNorm(32) compatibility).
    width_div: int = 1
    # Volumetric representation (reference model.py:271: 1536 -> 96 x 16).
    volume_channels: int = 96
    volume_depth: int = 16
    # Appearance/expression descriptor width (reference COMPRESS_DIM=512).
    compress_dim: int = 512
    # Rotation/translation warp grid (reference 64^3, model.py:825).
    grid_size: int = 64
    # Depths.
    eapp_rounds3d: int = 3                       # model.py:218-231 (3 rounds)
    resnet18_layers: Tuple[int, ...] = (2, 2, 2, 2)
    resnet50_layers: Tuple[int, ...] = (3, 4, 6, 3)
    repvgg_blocks: Optional[Tuple[int, ...]] = None  # None = per-config
    g2d_blocks: int = 8                          # model.py:735 (8 ResBlock2D)
    g3d_stages: int = 3                          # pools in the 3D U-Net
    vgg_stages: int = 0                          # 0 = all reference taps
    disc_stages: int = 4                         # model.py:1906-1914
    # Norm flavor for the ResBlock2D family (the reference's only
    # BatchNorm sites, model.py:600-640 — the G2d/Genh synthesis trunks).
    # 'batch' = reference parity. 'group' = AffineGroupNorm(32): identical
    # train/eval forward (no running-stats gap), no batch-composition
    # sensitivity, DP-clean without sync-BN — the TPU-first choice
    # sanctioned by SURVEY.md §7 (Hard parts #5). Emtn's resnet18/RepVGG
    # backbones keep BN (pretrained-weight compatibility).
    norm: str = "batch"

    def ch(self, c: int) -> int:
        """Scale a reference channel count."""
        if self.width_div <= 1:
            return c
        scaled = -(-c // self.width_div)       # ceil div
        return max(32, -(-scaled // 32) * 32)  # round up to multiple of 32


FULL = Arch()

TINY = Arch(
    name="tiny",
    width_div=8,
    volume_channels=32,
    volume_depth=4,
    compress_dim=64,
    grid_size=16,
    eapp_rounds3d=1,
    resnet18_layers=(1, 1, 1, 1),
    resnet50_layers=(1, 1, 1, 1),
    repvgg_blocks=(1, 1, 1, 1),
    g2d_blocks=2,
    g3d_stages=1,
    vgg_stages=2,
    disc_stages=2,
)

_PRESETS = {"full": FULL, "tiny": TINY}


def get_arch(name_or_arch) -> Arch:
    if isinstance(name_or_arch, Arch):
        return name_or_arch
    try:
        return _PRESETS[name_or_arch]
    except KeyError:
        raise ValueError(
            f"unknown arch preset {name_or_arch!r}; expected one of "
            f"{sorted(_PRESETS)}"
        ) from None
