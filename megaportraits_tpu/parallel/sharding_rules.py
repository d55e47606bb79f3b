"""Parameter sharding rules for the optional 'model' mesh axis.

Data parallelism is the first-class strategy for this conv workload
(SURVEY.md section 2.4); when HBM is tight (megapixel volumes, large
batches) the large conv kernels and dense matrices can additionally be
sharded FSDP-style over a 'model' axis — XLA inserts the all-gathers on
use and reduce-scatters on the gradient, riding ICI.

Rule: shard the largest axis of any parameter whose size exceeds
`min_shard_size` and whose that-axis length is divisible by the model-axis
size; everything else replicates. Batch stats and small params replicate.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megaportraits_tpu.parallel.mesh import MODEL_AXIS


def fsdp_param_specs(
    params: Any,
    mesh: Mesh,
    min_shard_size: int = 2**16,
) -> Any:
    """PartitionSpec tree for params: biggest divisible axis -> MODEL_AXIS."""
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: P(), params)
    n = mesh.shape[MODEL_AXIS]

    def spec(leaf):
        shape = np.shape(leaf)
        if np.prod(shape, dtype=np.int64) < min_shard_size:
            return P()
        # Prefer the last (feature) axis, then the largest divisible axis.
        order = sorted(range(len(shape)), key=lambda i: (i != len(shape) - 1,
                                                         -shape[i]))
        for axis in order:
            if shape[axis] % n == 0 and shape[axis] >= n:
                parts = [None] * len(shape)
                parts[axis] = MODEL_AXIS
                return P(*parts)
        return P()

    return jax.tree_util.tree_map(spec, params)


def shard_params(params: Any, mesh: Mesh, min_shard_size: int = 2**16) -> Any:
    """Place params on the mesh according to fsdp_param_specs."""
    specs = fsdp_param_specs(params, mesh, min_shard_size)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs,
    )
