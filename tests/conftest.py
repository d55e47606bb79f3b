"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (the standard JAX trick for
testing shard_map/pjit sharding without TPU pods — SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
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
