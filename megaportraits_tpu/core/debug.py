"""Numerics debugging / invariant checks.

The reference relies on inline Python asserts in forward passes
(model.py:126-128, 940-942, 1157) — impossible inside jit. TPU-native
equivalents (SURVEY.md section 5 'race detection / sanitizers' row):

  * enable_nan_debugging(): jax_debug_nans — aborts on the op producing a
    NaN, recompiling in op-by-op mode to localize it;
  * checked(): checkify-wrapped callable that carries shape/finite
    invariants through jit and reports them on the host;
  * assert_shape / assert_finite: checkify-based in-graph invariants used
    where the reference had asserts.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def apply_platform_env() -> None:
    """Honor MEGAPORTRAITS_PLATFORM=cpu|tpu|... at driver startup.

    The supported way to run a driver on a host whose axon TPU tunnel is
    down: the plugin hijacks JAX_PLATFORMS at import (even
    JAX_PLATFORMS=cpu lands on the TPU) and HANGS jax.devices() during
    outages, and JAX_PLATFORM_NAME only picks the default among
    already-discovered backends (discovery itself still hangs). Setting
    jax.config AFTER import restricts backend discovery — verified
    round 3. Call this before any device use."""
    import os

    p = os.environ.get("MEGAPORTRAITS_PLATFORM")
    if p:
        jax.config.update("jax_platforms", p)


def assert_shape(x: jnp.ndarray, expected: Sequence[int], name: str) -> None:
    """Static shape invariant (trace-time, like the reference's asserts)."""
    if tuple(x.shape[1:]) != tuple(expected):
        raise AssertionError(
            f"{name}: expected trailing shape {tuple(expected)}, "
            f"got {tuple(x.shape[1:])}"
        )


def assert_finite(x: jnp.ndarray, name: str) -> None:
    """In-graph finiteness check (surfaces via checked())."""
    checkify.check(
        jnp.all(jnp.isfinite(x.astype(jnp.float32))),
        f"{name} contains non-finite values",
    )


def checked(fn: Callable) -> Callable:
    """Wrap fn so checkify.check invariants raise on the host after the
    jitted call: `err, out = checked(step)(...); err.throw()`."""
    return checkify.checkify(fn, errors=checkify.user_checks)


def probe_device_count(timeout_s: float = 120.0):
    """Return len(jax.devices()), or None if backend init fails OR hangs.

    The axon TPU plugin HANGS jax.devices() (rather than erroring) while
    its tunnel is down (outage observed 2026-08-17); every entry point
    that must not stall on a dead tunnel (bench.py, __graft_entry__)
    probes through this daemon-thread timeout. The thread is abandoned on
    timeout — acceptable for process-lifetime entry points.
    """
    import threading

    import jax

    probe: dict = {}

    def _probe():
        try:
            probe["n"] = len(jax.devices())
        except Exception as e:  # noqa: BLE001
            probe["error"] = repr(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    return probe.get("n")
