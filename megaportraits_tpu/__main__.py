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
            from megaportraits_tpu.eval.metrics import make_eval_callables

            lpips_apply, embedding_apply = make_eval_callables(args.pretrained)
            if lpips_apply is not None:
                print("eval: converted LPIPS active")
            if embedding_apply is not None:
                print("eval: vggface identity embeddings active (AED)")
        print(evaluate_metrics(args.output_dir, args.target_dir,
                               lpips_apply=lpips_apply,
                               embedding_apply=embedding_apply,
                               pretrained_path=args.pretrained or "./pretrained"))
        return 0
    else:
        print(f"unknown command: {cmd}\n{__doc__}")
        return 1
    run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
