"""Held-out self-reenactment evaluation + best-snapshot early stopping.

The round-3 overtraining study (benchmarks/RESULTS.md) showed that at
small data scale the stage-1 GAN keeps lowering its training loss while
held-out reenactment quality DEGRADES past a cliff (~600 steps on the
4-clip harness); no reference driver guards against this (train.py runs
a fixed epoch count). This module gives every stage-1 driver the guard:
reserve a tail of frames per clip, score self-reenactment PSNR on them
every N steps, and keep the best-scoring snapshot for export.

Used by scripts/overfit.py and train/main_base.py
(``training.eval_interval`` / ``training.holdout_frames``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


class HeldoutEvaluator:
    """Score self-reenactment PSNR on reserved tail frames; track best.

    Eval pairs: source = the clip's first training frame, driving (and
    target) = each reserved tail frame. The forward runs train-mode BN
    with per-batch statistics (the GAN-generator convention; at small
    batch/data scale running-stats output is a washed blob and an
    eval-mode PSNR would early-stop on noise — RESULTS.md round 4).
    """

    def __init__(
        self,
        gbase,
        clips: Dict[str, np.ndarray],
        holdout: int,
        batch_size: int,
    ):
        self.batch_size = batch_size
        pairs: List[Tuple[np.ndarray, np.ndarray]] = []
        for frames in clips.values():
            if len(frames) <= holdout:
                continue
            for t in range(holdout):
                pairs.append((frames[0], frames[len(frames) - holdout + t]))
        self.src = (np.stack([p[0] for p in pairs])
                    if pairs else np.zeros((0,)))
        self.drv = (np.stack([p[1] for p in pairs])
                    if pairs else np.zeros((0,)))
        self.n_pairs = len(pairs)
        self._fwd = jax.jit(
            lambda v, a, b: gbase.apply(
                v, a, b, True, mutable=["batch_stats"]
            )[0][0]
        )
        self.best_psnr: float = float("-inf")
        self.best_step: int = 0
        self.best_variables: Optional[dict] = None

    @staticmethod
    def variables_of(g_state) -> dict:
        v = {"params": g_state.params}
        if getattr(g_state, "batch_stats", None) is not None:
            v["batch_stats"] = g_state.batch_stats
        return v

    def psnr(self, g_state) -> float:
        """Mean held-out self-reenactment PSNR (dB); -inf with no pairs."""
        if not self.n_pairs:
            return float("-inf")
        v = self.variables_of(g_state)
        bs = self.batch_size
        psnrs: List[float] = []
        for s0 in range(0, self.n_pairs, bs):
            src, drv = self.src[s0:s0 + bs], self.drv[s0:s0 + bs]
            n_valid = src.shape[0]
            if n_valid < bs:
                # Pad the tail slice by repetition to keep ONE jitted
                # shape (a second batch shape is a full recompile on the
                # remote service); only the valid rows are scored.
                pad = [(0, bs - n_valid)] + [(0, 0)] * (src.ndim - 1)
                src = np.pad(src, pad, mode="edge")
                drv = np.pad(drv, pad, mode="edge")
            pred = np.asarray(self._fwd(v, src, drv), dtype=np.float32)
            mse = np.mean(
                (pred[:n_valid] - drv[:n_valid].astype(np.float32)) ** 2,
                axis=tuple(range(1, pred.ndim)),
            )
            psnrs.extend(10.0 * np.log10(1.0 / np.maximum(mse, 1e-10)))
        return float(np.mean(psnrs))

    def consider(self, g_state, step: int) -> Tuple[float, bool]:
        """Evaluate; snapshot the variables when the score improves."""
        score = self.psnr(g_state)
        improved = score > self.best_psnr
        if improved:
            self.best_psnr, self.best_step = score, step
            self.best_variables = jax.device_get(
                self.variables_of(g_state))
        return score, improved

    def export_variables(self, g_state) -> Tuple[dict, int, bool]:
        """(variables, step, is_best): the best snapshot when one exists,
        else the current state (caller supplies the fallback step)."""
        if self.best_variables is not None:
            return self.best_variables, self.best_step, True
        return self.variables_of(g_state), -1, False
