"""Configuration: same YAML surface as the reference configs.

The reference loads OmegaConf YAML (reference train.py:434, inference.py:74)
with schema documented in configs/training/stage1-base.yaml. We keep the same
keys but validate them through dataclasses and eliminate the reference's
config/hardcode drift (batch_size 24 in yaml vs hardcoded 16, train.py:414).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml


@dataclasses.dataclass
class DataConfig:
    train_width: int = 512
    train_height: int = 512
    sample_rate: int = 25
    n_sample_frames: int = 1
    n_motion_frames: int = 2


@dataclasses.dataclass
class TrainingConfig:
    # Mirrors reference configs/training/stage1-base.yaml:7-41.
    frame_offset: int = 20
    checkpoint_path: str = "./checkpoints"
    save_interval: int = 50
    log_interval: int = 100
    batch_size: int = 4
    num_workers: int = 0
    lr: float = 1.0e-5
    base_epochs: int = 100
    hr_epochs: int = 50
    student_epochs: int = 100
    use_gpu_video_tensor: bool = True
    prev_frames: int = 2
    video_dir: str = "./junk"
    sample_rate: int = 25
    n_sample_frames: int = 100
    json_file: str = "./data/overfit.json"
    # Loss weights (stage1-base.yaml:34-41).
    w_per: float = 20.0
    w_adv: float = 1.0
    w_fm: float = 40.0
    w_cos: float = 2.0
    w_pairwise: float = 1.0
    w_identity: float = 1.0
    w_cyc: float = 1.0
    # lambda_* family kept for schema compatibility.
    lambda_perceptual: float = 1.0
    lambda_adversarial: float = 1.0
    lambda_cosine: float = 1.0
    lambda_keypoints: float = 1.0
    lambda_gaze: float = 1.0
    lambda_supervised: float = 1.0
    lambda_unsupervised: float = 1.0
    # Legacy-trainer variant: mask pred/target with the host-computed
    # foreground mask before the perceptual terms (reference
    # train_highres.py:244-248 via DeepLabV3; our provider-pluggable
    # data/segmentation.py). Batches must carry 'foreground_mask'.
    use_foreground_mask: bool = False
    # Opt-in gaze term (reference train_highres.py:164-207 wires MediaPipe
    # gaze into the legacy trainer; effectively disabled in the canonical
    # path, model.py:1961,1971). TPU split: the host supplies per-batch
    # eye-region masks (losses/gaze.gaze_masks_for_batch, needs a 68-point
    # landmark provider); the jitted step applies the masked-MSE term
    # weighted by lambda_gaze.
    use_gaze_loss: bool = False
    # TPU-native additions (no reference counterpart).
    # Orbax bundle from scripts/convert_weights.py; loaded when the
    # directory exists (frozen loss backbones + SixDRepNet + resnet18
    # trunks — the reference's runtime downloads, model.py:1935-1947).
    pretrained_path: str = "./pretrained"
    seed: int = 0
    use_bf16: bool = True
    # Held-out early stopping (eval/heldout.py): every eval_interval
    # steps score self-reenactment PSNR on holdout_frames reserved tail
    # frames per clip and export the best-scoring snapshot. 0 = off
    # (reference behavior: fixed epoch count, train.py:387-435 — which
    # the round-3 overtraining study shows is unsafe at small data scale).
    eval_interval: int = 0
    holdout_frames: int = 4
    unroll_steps: int = 1  # train steps per device call (lax.scan)
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {"data": 8}
    steps_per_epoch: Optional[int] = None
    num_avatars: int = 4


@dataclasses.dataclass
class ModelConfig:
    """TPU-native model knobs (no reference counterpart).

    The serving defaults (224px rotation input, 256px descriptor input,
    bf16) change activations vs the reference. For any parity measurement
    (LPIPS-within-1% north star) use the PARITY preset:
    configs/inference/parity.yaml — full-res Emtn inputs, fp32 compute,
    reference warp renormalization, reference [-1,1] input transform.
    """

    # Emtn input resolutions; 0 = feed full resolution (parity mode).
    rotation_input_size: int = 224
    descriptor_input_size: int = 256
    # Width/depth preset (core/arch.py): 'full' = reference sizes; 'tiny' =
    # gate-sized graph for multi-chip dryruns/CI (every component kept,
    # ~8x narrower, 1-block stages).
    arch: str = "full"
    # 'reference' replicates the reference warp renormalization quirk
    # (model.py:1056-1058); 'standard' is textbook grid+flow.
    warp_normalize_mode: str = "reference"
    use_bf16: bool = True
    # Norm flavor for the ResBlock2D family (G2d/Genh — the reference's
    # only BatchNorm sites, model.py:600-640): 'batch' = reference parity,
    # 'group' = AffineGroupNorm(32), identical train/eval forward. See
    # core/arch.py and the round-5 GN-vs-BN comparison in
    # benchmarks/RESULTS.md for the decision evidence.
    norm: str = "batch"

    def parity(self) -> "ModelConfig":
        return dataclasses.replace(
            self, rotation_input_size=0, descriptor_input_size=0,
            warp_normalize_mode="reference", use_bf16=False, norm="batch",
        )


@dataclasses.dataclass
class InferenceConfig:
    checkpoint_path: str = ""
    source_image: str = ""
    driving_image: str = ""
    output_image: str = "output_base.jpg"
    # Framework contract: images are [0,1] END-TO-END (training feeds [0,1],
    # Gbase ends in sigmoid). The reference's inference.py normalizes inputs
    # to [-1,1] while its trainer never does (reference defect, train.py:391
    # vs inference.py:17-20) — set this flag only to reproduce that behavior
    # byte-for-byte against a converted reference checkpoint.
    reference_normalize: bool = False
    # BatchNorm statistics at inference: 'running' = eval mode (reference
    # inference.py convention); 'batch' = per-input batch stats (GAN-
    # generator convention — serves what a small-batch-trained generator
    # actually learned; the train/eval BN gap is large at small data/batch
    # scale).
    bn_mode: str = "running"


@dataclasses.dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    inference: InferenceConfig = dataclasses.field(default_factory=InferenceConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)

    def make_gbase(self, policy=None, remat: bool = False):
        """Construct Gbase from the model section (single source of truth
        for the parity-affecting knobs)."""
        from megaportraits_tpu.core.dtypes import (
            DEFAULT_POLICY, FP32_POLICY,
        )
        from megaportraits_tpu.models.gbase import Gbase

        if policy is None:
            policy = DEFAULT_POLICY if self.model.use_bf16 else FP32_POLICY
        return Gbase(
            policy=policy,
            warp_normalize_mode=self.model.warp_normalize_mode,
            rotation_input_size=self.model.rotation_input_size,
            descriptor_input_size=self.model.descriptor_input_size,
            remat=remat,
            arch=self.make_arch(),
        )

    def make_arch(self):
        """Arch preset with the config's norm decision applied."""
        import dataclasses as _dc

        from megaportraits_tpu.core.arch import get_arch

        return _dc.replace(get_arch(self.model.arch), norm=self.model.norm)


def _filter_fields(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def load_config(path: str) -> Config:
    """Load a reference-schema YAML file into a validated Config."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config()
    if "data" in raw and raw["data"]:
        cfg.data = DataConfig(**_filter_fields(DataConfig, raw["data"]))
    if "training" in raw and raw["training"]:
        cfg.training = TrainingConfig(
            **_filter_fields(TrainingConfig, raw["training"])
        )
    if "inference" in raw and raw["inference"]:
        cfg.inference = InferenceConfig(
            **_filter_fields(InferenceConfig, raw["inference"])
        )
    if "model" in raw and raw["model"]:
        cfg.model = ModelConfig(**_filter_fields(ModelConfig, raw["model"]))
    return cfg
