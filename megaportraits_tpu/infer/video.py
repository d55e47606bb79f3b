"""Video reenactment: drive a source image with a whole driving video.

Extends the reference's single-pair inference (inference.py:15-46) into the
streaming production path: source encoded once, driving frames batched and
pipelined to the device, output frames written with cv2.
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.checkpoint import CheckpointManager
from megaportraits_tpu.core.config import load_config
from megaportraits_tpu.infer.inference import load_image
from megaportraits_tpu.infer.streaming import ReenactmentSession
from megaportraits_tpu.models.gbase import Gbase


def reenact_video(
    source_image_path: str,
    driving_video_path: str,
    output_video_path: str,
    variables,
    size: int = 512,
    fps: Optional[float] = None,
    max_frames: Optional[int] = None,
    reference_normalize: bool = False,
    model: Optional[Gbase] = None,
    bn_mode: str = "running",
) -> int:
    """Returns the number of frames written.

    Inputs stay [0,1] end-to-end (framework contract); set
    reference_normalize for converted reference checkpoints, which expect
    the reference's [-1,1] transform (reference inference.py:17-20).
    """
    import cv2

    session = ReenactmentSession(variables, model=model, bn_mode=bn_mode)
    session.set_source(
        load_image(source_image_path, (size, size), reference_normalize)
    )

    cap = cv2.VideoCapture(driving_video_path)
    src_fps = fps or cap.get(cv2.CAP_PROP_FPS) or 25.0
    writer = cv2.VideoWriter(
        output_video_path, cv2.VideoWriter_fourcc(*"mp4v"), src_fps,
        (size, size),
    )
    count = 0
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and count >= max_frames):
            break
        rgb = cv2.cvtColor(cv2.resize(frame, (size, size)), cv2.COLOR_BGR2RGB)
        xd = jnp.asarray(rgb.astype(np.float32) / 255.0)[None]
        if reference_normalize:
            xd = (xd - 0.5) / 0.5  # reference [-1,1] compat
        xhat = session(xd)  # [1, H, W, 3] in [0, 1]
        out = (np.asarray(xhat[0], dtype=np.float32) * 255).clip(0, 255)
        writer.write(cv2.cvtColor(out.astype(np.uint8), cv2.COLOR_RGB2BGR))
        count += 1
    writer.release()
    cap.release()
    return count


def main():
    from megaportraits_tpu.core.debug import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Video reenactment")
    parser.add_argument("--config", default="configs/inference/stage1-base.yaml")
    parser.add_argument("--source", required=True)
    parser.add_argument("--driving", required=True)
    parser.add_argument("--output", default="reenacted.mp4")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument(
        "--bn-mode", choices=["running", "batch"], default="running",
        help="BatchNorm stats: 'batch' for small-batch-trained "
             "checkpoints (see benchmarks/stage1_quality/README.md)",
    )
    args = parser.parse_args()

    cfg = load_config(args.config)
    model = cfg.make_gbase()
    dummy = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
    mgr = CheckpointManager(cfg.inference.checkpoint_path)
    restored = mgr.restore({"g_variables": variables})
    if restored is not None:
        variables = restored["g_variables"]
    n = reenact_video(args.source, args.driving, args.output, variables,
                      size=args.size, max_frames=args.max_frames,
                      reference_normalize=cfg.inference.reference_normalize,
                      model=model, bn_mode=args.bn_mode)
    print(f"wrote {n} frames to {args.output}")


if __name__ == "__main__":
    main()
