"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (the standard JAX trick for
testing shard_map/pjit sharding without TPU pods — SURVEY.md section 4).
"""

import os

# Platform forcing quirks of this environment:
#  * the axon TPU plugin hijacks JAX_PLATFORMS (even JAX_PLATFORMS=cpu lands
#    on the TPU) — never set JAX_PLATFORMS;
#  * a pytest plugin imports jax BEFORE conftest, so JAX_PLATFORM_NAME set
#    here via os.environ is too late (jax binds it at import). Use
#    jax.config.update instead — backends initialize lazily, so this works.
os.environ["JAX_PLATFORM_NAME"] = "cpu"  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This JAX build's DEFAULT precision is low even on CPU convs/matmuls
# (~1e-2 error vs float64 ground truth); parity tests need real float32.
import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
# Restrict backend DISCOVERY to cpu too: a registered-but-unreachable
# axon plugin HANGS jax.devices() during tunnel outages even with the
# default platform pinned (observed 2026-08-17, whole-suite stall). The
# env var JAX_PLATFORMS is hijacked by the plugin at import time, but
# the config set AFTER import sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# This host has a single CPU core: XLA compiles dominate test time. A
# persistent on-disk compilation cache makes reruns near-instant.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
