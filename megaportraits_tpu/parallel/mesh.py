"""Device mesh + sharding helpers.

The reference trains single-process single-GPU with no distributed backend
(SURVEY.md section 2.4). The TPU-native scaling strategy is GSPMD: build a
jax.sharding.Mesh over ICI, shard the batch over the 'data' axis, replicate
parameters, and let XLA insert the gradient all-reduces — no NCCL/MPI
translation (this workload is conv-image-to-image; data parallel is the
first-class axis, with an optional 'model' axis reserved for spatial/volume
sharding at megapixel scale).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build a Mesh; defaults to all devices on a single 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {DATA_AXIS: len(devices)}
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    assert int(np.prod(dims)) == len(devices), (
        f"mesh shape {shape} does not match {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
