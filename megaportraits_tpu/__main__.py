"""Unified CLI: python -m megaportraits_tpu <command> [args]

Commands:
  train-base     stage-1 Gbase training        (reference: python train.py)
  train-hr       stage-2 Genh training         (reference: train_highres.py)
  train-student  stage-3 Student distillation  (reference: train_student.py)
  infer          single-pair inference         (reference: inference.py)
  reenact        drive a source image with a video (streaming)
  eval           directory metric suite        (reference: metrics.py)
"""

from __future__ import annotations

import sys


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd = sys.argv[1]
    sys.argv = [f"megaportraits_tpu {cmd}"] + sys.argv[2:]
    if cmd == "train-base":
        from megaportraits_tpu.train.main_base import main as run
    elif cmd == "train-hr":
        from megaportraits_tpu.train.main_hr import main as run
    elif cmd == "train-student":
        from megaportraits_tpu.train.main_student import main as run
    elif cmd == "infer":
        from megaportraits_tpu.infer.inference import main as run
    elif cmd == "reenact":
        from megaportraits_tpu.infer.video import main as run
    elif cmd == "eval":
        import argparse

        from megaportraits_tpu.eval.metrics import evaluate_metrics

        parser = argparse.ArgumentParser()
        parser.add_argument("--output-dir", required=True)
        parser.add_argument("--target-dir", required=True)
        parser.add_argument(
            "--pretrained", default="",
            help="converted-weight bundle (scripts/convert_weights.py); "
                 "enables real LPIPS, 68-point FAN landmarks for AKD, and "
                 "vggface identity embeddings for AED",
        )
        args = parser.parse_args()
        lpips_apply = embedding_apply = None
        if args.pretrained:
            import jax
            import jax.numpy as jnp

            from megaportraits_tpu.core.dtypes import FP32_POLICY
            from megaportraits_tpu.data.landmarks import provider_from_bundle
            from megaportraits_tpu.utils.pretrained import load_bundle
            from megaportraits_tpu.utils.torch_convert import merge_params

            bundle = load_bundle(args.pretrained) or {}
            if provider_from_bundle(args.pretrained):
                print("eval: FAN 68-point landmarks active")
            if "vgg16" in bundle and "lpips_heads" in bundle:
                from megaportraits_tpu.losses.perceptual import LPIPS

                lp = LPIPS(policy=FP32_POLICY)
                d = jnp.zeros((1, 64, 64, 3), jnp.float32)
                init = jax.jit(lp.init)(jax.random.PRNGKey(0), d, d)
                merged = merge_params(
                    init["params"],
                    {"vgg16": bundle["vgg16"], **bundle["lpips_heads"]},
                )
                lpips_apply = jax.jit(
                    lambda a, b: lp.apply({"params": merged}, a, b))
                print("eval: converted LPIPS active")
            if "vggface" in bundle:
                from megaportraits_tpu.losses.vggface import InceptionResnetV1

                face = InceptionResnetV1(policy=FP32_POLICY)
                d = jnp.zeros((1, 160, 160, 3), jnp.float32)
                init = jax.jit(face.init, static_argnums=2)(
                    jax.random.PRNGKey(0), d, False)
                fmerged = merge_params(init["params"], bundle["vggface"])
                from megaportraits_tpu.ops.resize import linear_resize

                def embedding_apply(img):
                    img = linear_resize(img, (160, 160), axes=(1, 2),
                                        align_corners=False)
                    return face.apply({"params": fmerged}, img * 2.0 - 1.0)

                print("eval: vggface identity embeddings active (AED)")
        print(evaluate_metrics(args.output_dir, args.target_dir,
                               lpips_apply=lpips_apply,
                               embedding_apply=embedding_apply))
        return 0
    else:
        print(f"unknown command: {cmd}\n{__doc__}")
        return 1
    run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
