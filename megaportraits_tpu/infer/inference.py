"""Inference entry point — parity with reference inference.py.

``python -m megaportraits_tpu.infer.inference --config
configs/inference/stage1-base.yaml`` loads a checkpoint, runs the jitted
Gbase forward on a source/driving pair and writes the output image —
mirroring inference.py:15-67 including the [-0.5, 0.5] Normalize transform
and the (x+1)/2 denormalization.
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
from megaportraits_tpu.core.dtypes import DEFAULT_POLICY, Policy
from megaportraits_tpu.models.gbase import Gbase


def load_image(path: str, size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Image -> [1, H, W, 3], normalized with mean/std 0.5 (inference.py:17-20)."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return jnp.asarray(arr)[None]


def denormalize(frame: jnp.ndarray) -> np.ndarray:
    """[-1,1] -> uint8 RGB (inference.py:38-44)."""
    out = np.asarray(frame[0], dtype=np.float32)
    out = np.clip((out + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
    return out


def inference_base(
    source_image_path: str,
    driving_image_path: str,
    variables,
    model: Optional[Gbase] = None,
    size: Optional[Tuple[int, int]] = (512, 512),
) -> np.ndarray:
    model = model or Gbase(policy=DEFAULT_POLICY)
    xs = load_image(source_image_path, size)
    xd = load_image(driving_image_path, size)

    @jax.jit
    def forward(variables, xs, xd):
        xhat, _ = model.apply(variables, xs, xd)
        return xhat

    xhat = forward(variables, xs, xd)
    # Gbase outputs sigmoid [0,1]; reference denorm assumes [-1,1] — map to
    # the same scale first for byte-exact behavior.
    return denormalize(xhat * 2.0 - 1.0)


def main(cfg: Config):
    model = Gbase(policy=DEFAULT_POLICY)
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
    )
    Image.fromarray(out).save(cfg.inference.output_image)
    print(f"wrote {cfg.inference.output_image}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Inference script")
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    main(load_config(args.config))
