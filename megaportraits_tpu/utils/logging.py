"""Structured training metrics: TensorBoard (tensorboardX) + console.

Replaces the reference's SummaryWriter usage (train.py:29,146,333-339) with
a writer that tolerates a missing tensorboardX install.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

logger = logging.getLogger("megaportraits_tpu")


class MetricsWriter:
    def __init__(self, log_dir: str = "runs/training_logs"):
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            logger.warning("tensorboardX unavailable; console logging only")

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        for key, value in metrics.items():
            if self._tb is not None:
                self._tb.add_scalar(key, float(value), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
