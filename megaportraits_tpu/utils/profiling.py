"""Tracing / profiling subsystem.

Replaces the reference's commented-out memory_profiler decorators and
`mprof run` workflow (reference model.py:109, README.md:20-23) with the
TPU-native stack (SURVEY.md section 5):

  * jax.profiler traces viewable in XProf/Perfetto/TensorBoard,
  * a trace-server hook for live capture,
  * device memory stats per step,
  * a slope-based step timer that excludes the host<->device round-trip
    (essential here: the tunnel RTT is ~28 ms and block_until_ready does
    not block — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a profiler trace: `with trace('runs/trace'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live-capture profiler server (connect with XProf/TensorBoard)."""
    return jax.profiler.start_server(port)


def device_memory_stats(device=None) -> Dict[str, int]:
    """Per-device HBM stats (bytes): in_use, limit, peak where available."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    keep = ("bytes_in_use", "bytes_limit", "peak_bytes_in_use",
            "largest_alloc_size")
    return {k: stats[k] for k in keep if k in stats}


class StepTimer:
    """Wall-clock it/s with warmup skip (compile excluded)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._count = 0
        self._start: Optional[float] = None

    def tick(self) -> Optional[float]:
        self._count += 1
        if self._count == self.warmup:
            self._start = time.perf_counter()
            return None
        if self._start is None or self._count <= self.warmup:
            return None
        return (self._count - self.warmup) / (time.perf_counter() - self._start)


def annotate(name: str):
    """Named profiler region: shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
