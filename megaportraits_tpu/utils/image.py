"""Host-side image dump helpers (the reference's vutils.save_image debug
artifacts, train.py:206-215, 284-285)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def save_image(array, path: str) -> None:
    """[H,W,3] or [B,H,W,3] float in [0,1] -> PNG (first item of batch)."""
    arr = np.asarray(array)
    if arr.ndim == 4:
        arr = arr[0]
    arr = (np.clip(arr.astype(np.float32), 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)
