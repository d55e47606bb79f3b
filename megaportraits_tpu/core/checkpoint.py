"""Checkpoint / resume via Orbax.

Reference contract (train.py:349-385): an epoch-keyed dict
{epoch, model_G, model_D, optimizer_G, optimizer_D} saved every
`save_interval`, with opportunistic restore on start. Here the same payload
is an Orbax CheckpointManager with async saves (non-blocking on TPU) and
automatic latest-step restore; partial restores (inference needs only G
params) mirror the reference's strict=False load (inference.py:60).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, payload: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, payload_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload_like)
        )

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
