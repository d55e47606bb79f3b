"""Host->device prefetch: overlap preprocessing with the device step.

The reference's data loading is synchronous (DataLoader num_workers=0,
train.py:414). On TPU the host pipeline must stay ahead of the device or
the MXU starves (SURVEY.md §7 hard part 7): we double-buffer with a
background thread + device_put so the next batch is in HBM before the
current step finishes.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterator[Any],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Any]:
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                if sharding is not None:
                    item = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), item
                    )
                else:
                    item = jax.tree_util.tree_map(jax.device_put, item)
                q.put(item)
            q.put(sentinel)
        except BaseException as e:  # propagate, never end silently
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
