"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (the standard JAX trick for
testing shard_map/pjit sharding without TPU pods — SURVEY.md section 4).
"""

import os

# NOTE: this environment's jax build ignores JAX_PLATFORMS (the 'axon' TPU
# plugin wins); JAX_PLATFORM_NAME does force CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This JAX build's DEFAULT precision is low even on CPU convs/matmuls
# (~1e-2 error vs float64 ground truth); parity tests need real float32.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# This host has a single CPU core: XLA compiles dominate test time. A
# persistent on-disk compilation cache makes reruns near-instant.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
