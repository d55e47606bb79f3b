"""Inference entry point — parity with reference inference.py.

``python -m megaportraits_tpu.infer.inference --config
configs/inference/stage1-base.yaml`` loads a checkpoint, runs the jitted
Gbase forward on a source/driving pair and writes the output image —
mirroring inference.py:15-67.

Input-range contract: this framework is **[0,1] end-to-end** — the trainer
feeds dataset frames in [0,1] and Gbase ends in a sigmoid, so checkpoints
trained here are served with in-distribution inputs. The reference instead
normalizes inference inputs to [-1,1] (inference.py:17-20) while its trainer
never normalizes (train.py:391-395) — a documented reference defect. Pass
``reference_normalize=True`` (CLI ``--reference-normalize``, config
``inference.reference_normalize``) to reproduce the reference's byte-exact
transform for converted reference checkpoints.
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from megaportraits_tpu.core.config import Config, load_config
from megaportraits_tpu.core.checkpoint import CheckpointManager
from megaportraits_tpu.core.dtypes import DEFAULT_POLICY
from megaportraits_tpu.models.gbase import Gbase


def load_image(
    path: str,
    size: Optional[Tuple[int, int]] = None,
    reference_normalize: bool = False,
) -> jnp.ndarray:
    """Image -> [1, H, W, 3] float32 in [0,1] (framework contract), or the
    reference's mean/std-0.5 [-1,1] transform when reference_normalize."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if reference_normalize:
        arr = (arr - 0.5) / 0.5
    return jnp.asarray(arr)[None]


def to_uint8(frame: jnp.ndarray) -> np.ndarray:
    """[0,1] model output -> uint8 RGB."""
    out = np.asarray(frame[0], dtype=np.float32)
    return np.clip(out * 255.0, 0, 255).astype(np.uint8)


def denormalize(frame: jnp.ndarray) -> np.ndarray:
    """Reference [-1,1] -> uint8 RGB denorm (inference.py:38-44)."""
    out = np.asarray(frame[0], dtype=np.float32)
    return np.clip((out + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)


def inference_base(
    source_image_path: str,
    driving_image_path: str,
    variables,
    model: Optional[Gbase] = None,
    size: Optional[Tuple[int, int]] = (512, 512),
    reference_normalize: bool = False,
    bn_mode: str = "running",
) -> np.ndarray:
    """Single-pair inference (reference inference.py:15-46).

    bn_mode: 'running' = eval-mode BatchNorm (reference convention);
    'batch' = normalize by the input's own batch statistics (the GAN-
    generator convention). Checkpoints trained at small batch sizes carry
    a large BN train/eval gap (the generator learns against per-batch
    stats); 'batch' serves what the generator actually learned."""
    model = model or Gbase(policy=DEFAULT_POLICY)
    xs = load_image(source_image_path, size, reference_normalize)
    xd = load_image(driving_image_path, size, reference_normalize)

    @jax.jit
    def forward(variables, xs, xd):
        if bn_mode == "batch":
            (xhat, _), _ = model.apply(
                variables, xs, xd, True, mutable=["batch_stats"]
            )
            return xhat
        xhat, _ = model.apply(variables, xs, xd)
        return xhat

    xhat = forward(variables, xs, xd)
    if reference_normalize:
        # Gbase outputs sigmoid [0,1]; the reference denorm assumes [-1,1] —
        # map to the same scale first for byte-exact behavior
        # (inference.py:38-44).
        return denormalize(xhat * 2.0 - 1.0)
    return to_uint8(xhat)


def main(cfg: Config = None):
    if cfg is None:
        # CLI entry (python -m megaportraits_tpu infer --config ...).
        from megaportraits_tpu.core.debug import apply_platform_env

        apply_platform_env()
        parser = argparse.ArgumentParser(description="Inference script")
        parser.add_argument("--config", type=str, required=True)
        parser.add_argument(
            "--reference-normalize", action="store_true",
            help="reproduce the reference's [-1,1] input transform "
                 "(for converted reference checkpoints)",
        )
        parser.add_argument(
            "--bn-mode", choices=["running", "batch"], default=None,
            help="BatchNorm stats: 'running' (eval-mode, reference "
                 "convention) or 'batch' (per-input stats — the GAN "
                 "convention; use for small-batch-trained checkpoints)",
        )
        args = parser.parse_args()
        cfg = load_config(args.config)
        if args.reference_normalize:
            cfg.inference.reference_normalize = True
        if args.bn_mode:
            cfg.inference.bn_mode = args.bn_mode
    model = cfg.make_gbase()
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.data.train_height, cfg.data.train_width, 3),
                      jnp.float32)
    variables = jax.jit(model.init)(rng, dummy, dummy)

    restored = None
    for path in (cfg.inference.checkpoint_path,
                 cfg.inference.checkpoint_path + "/export"):
        try:
            mgr = CheckpointManager(path)
            restored = mgr.restore({"g_variables": variables})
        except Exception:
            restored = None
        if restored is not None:
            break
    if restored is not None:
        variables = restored["g_variables"]
    else:
        print(f"No checkpoint found at '{cfg.inference.checkpoint_path}' — "
              "running with random weights")

    out = inference_base(
        cfg.inference.source_image,
        cfg.inference.driving_image,
        variables,
        model,
        size=(cfg.data.train_width, cfg.data.train_height),
        reference_normalize=cfg.inference.reference_normalize,
        bn_mode=cfg.inference.bn_mode,
    )
    Image.fromarray(out).save(cfg.inference.output_image)
    print(f"wrote {cfg.inference.output_image}")


if __name__ == "__main__":
    main()
