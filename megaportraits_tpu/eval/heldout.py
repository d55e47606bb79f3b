"""Held-out self-reenactment evaluation + best-snapshot early stopping.

The round-3 overtraining study (benchmarks/RESULTS.md) showed that at
small data scale the stage-1 GAN keeps lowering its training loss while
held-out reenactment quality DEGRADES past a cliff (~600 steps on the
4-clip harness); no reference driver guards against this (train.py runs
a fixed epoch count). This module gives the training drivers the guard:
reserve a tail of frames per clip, score PSNR on them every N steps, and
keep the best-scoring snapshot for export.

Used by scripts/overfit.py and train/main_base.py (stage 1, via
``HeldoutEvaluator.for_gbase``) and train/main_hr.py (stage 2, via
``HeldoutEvaluator.for_genh``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


class HeldoutEvaluator:
    """Score held-out PSNR with a model forward; track the best snapshot.

    The generic core takes a jitted ``fwd(variables, src, drv) -> pred``
    plus aligned (src, drv, tgt) arrays; the ``for_*`` constructors build
    the stage-specific forwards. Forwards run train-mode BN with
    per-batch statistics (the GAN-generator convention; at small
    batch/data scale running-stats output is a washed blob and an
    eval-mode PSNR would early-stop on noise — RESULTS.md round 4).
    """

    def __init__(
        self,
        fwd: Callable,
        src: np.ndarray,
        drv: np.ndarray,
        tgt: np.ndarray,
        batch_size: int,
        burn_in: int = 0,
    ):
        self._fwd = fwd
        self.src, self.drv, self.tgt = src, drv, tgt
        self.n_pairs = int(src.shape[0]) if src.ndim > 1 else 0
        self.batch_size = batch_size
        # Evals before `burn_in` steps are scored but never snapshotted:
        # an early noise spike (observed: 12.27 dB at step 50 on a run
        # whose plateau was ~11.8) would otherwise pin "best" to an
        # undertrained model for the rest of the run.
        self.burn_in = burn_in
        self.best_psnr: float = float("-inf")
        self.best_step: int = 0
        self.best_variables: Optional[dict] = None

    # -- stage-specific constructors ------------------------------------

    @staticmethod
    def _tail_pairs(
        clips: Dict[str, np.ndarray], holdout: int
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """(first training frame, reserved tail frame) per clip."""
        pairs: List[Tuple[np.ndarray, np.ndarray]] = []
        for frames in clips.values():
            if len(frames) <= holdout:
                continue
            for t in range(holdout):
                pairs.append((frames[0], frames[len(frames) - holdout + t]))
        return pairs

    @classmethod
    def for_gbase(cls, gbase, clips: Dict[str, np.ndarray], holdout: int,
                  batch_size: int, burn_in: int = 0,
                  bn_mode: str = "batch") -> "HeldoutEvaluator":
        """Stage-1 self-reenactment: source = clip's first training frame,
        driving (and target) = each reserved tail frame.

        bn_mode: 'batch' scores train-mode per-batch BN statistics (the
        GAN-generator convention — see the class docstring); 'running'
        scores the SERVING forward (eval mode, running stats) so the best
        snapshot optimizes what inference actually runs (VERDICT r4 Weak
        #5). 'running' is the right choice for norm='group' models, where
        the generator forward is train/eval-identical and only Emtn's
        backbone BN consumes running stats."""
        pairs = cls._tail_pairs(clips, holdout)
        if pairs:
            src = np.stack([p[0] for p in pairs])
            drv = np.stack([p[1] for p in pairs])
        else:
            src = drv = np.zeros((0,))
        if bn_mode == "running":
            fwd = jax.jit(lambda v, a, b: gbase.apply(v, a, b, False)[0])
        else:
            fwd = jax.jit(
                lambda v, a, b: gbase.apply(
                    v, a, b, True, mutable=["batch_stats"]
                )[0][0]
            )
        return cls(fwd, src, drv, drv, batch_size, burn_in=burn_in)

    @classmethod
    def for_genh(cls, genh, gbase, gbase_vars,
                 clips_hr: Dict[str, np.ndarray], holdout: int,
                 batch_size: int, base_size: int,
                 upscale: int = 2) -> "HeldoutEvaluator":
        """Stage-2 super-resolution self-reenactment: mirrors the HR train
        step's composition (train_hr.py) — frozen eval-mode Gbase at base
        resolution, bilinear x``upscale`` pre-upscale, train-mode Genh —
        scored against the NATIVE-resolution tail frame."""
        import cv2
        import jax.numpy as jnp

        from megaportraits_tpu.ops.resize import linear_resize

        pairs = cls._tail_pairs(clips_hr, holdout)
        if pairs:
            tgt = np.stack([p[1] for p in pairs])
            down = lambda f: cv2.resize(  # noqa: E731
                f, (base_size, base_size), interpolation=cv2.INTER_AREA)
            src = np.stack([down(p[0]) for p in pairs])
            drv = np.stack([down(p[1]) for p in pairs])
        else:
            src = drv = tgt = np.zeros((0,))

        def fwd(v, a, b):
            xhat, _ = gbase.apply(gbase_vars, a, b)
            if upscale != 1:
                hr = [s * upscale for s in xhat.shape[1:3]]
                xhat = linear_resize(xhat, hr, axes=(1, 2),
                                     align_corners=False)
            pred = genh.apply(v, xhat, True, mutable=["batch_stats"])[0]
            # Genh outputs tanh [-1,1]; targets are [0,1].
            return (pred.astype(jnp.float32) + 1.0) * 0.5

        return cls(jax.jit(fwd), src, drv, tgt, batch_size)

    # -- scoring / tracking ---------------------------------------------

    @staticmethod
    def variables_of(g_state) -> dict:
        v = {"params": g_state.params}
        if getattr(g_state, "batch_stats", None) is not None:
            v["batch_stats"] = g_state.batch_stats
        return v

    def psnr(self, g_state) -> float:
        """Mean held-out PSNR (dB); -inf with no pairs."""
        if not self.n_pairs:
            return float("-inf")
        v = self.variables_of(g_state)
        bs = self.batch_size
        psnrs: List[float] = []
        for s0 in range(0, self.n_pairs, bs):
            src, drv = self.src[s0:s0 + bs], self.drv[s0:s0 + bs]
            tgt = self.tgt[s0:s0 + bs]
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
                (pred[:n_valid] - tgt[:n_valid].astype(np.float32)) ** 2,
                axis=tuple(range(1, pred.ndim)),
            )
            psnrs.extend(10.0 * np.log10(1.0 / np.maximum(mse, 1e-10)))
        return float(np.mean(psnrs))

    def consider(self, g_state, step: int) -> Tuple[float, bool]:
        """Evaluate; snapshot the variables when the score improves."""
        score = self.psnr(g_state)
        improved = score > self.best_psnr and step >= self.burn_in
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
