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


def fit_mesh_shape(shape: Dict[str, int], n_devices: int) -> Dict[str, int]:
    """Adapt a requested mesh shape to the devices actually available.

    Keeps the non-data axes if their product divides ``n_devices`` (the data
    axis absorbs the rest); otherwise shrinks non-data axes toward 1 until a
    factorization fits. Degenerates to ``{data: n_devices}`` as a last resort,
    so a shape written for an 8-chip slice still builds a valid mesh on 1
    axon chip or a 4-device CPU host.
    """
    shape = dict(shape) if shape else {DATA_AXIS: n_devices}
    if DATA_AXIS not in shape:
        shape = {DATA_AXIS: 1, **shape}
    other = {k: v for k, v in shape.items() if k != DATA_AXIS}
    # Shrink non-data axes (largest first) until their product divides n.
    while other:
        prod = int(np.prod(list(other.values())))
        if prod <= n_devices and n_devices % prod == 0:
            return {DATA_AXIS: n_devices // prod, **other}
        k = max(other, key=other.get)
        if other[k] > 1:
            other[k] //= 2
        else:
            other.pop(k)
    return {DATA_AXIS: n_devices}


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None, strict: bool = False) -> Mesh:
    """Build a Mesh; defaults to all devices on a single 'data' axis.

    Unless ``strict``, the requested shape is adapted via :func:`fit_mesh_shape`
    to whatever device count this process actually sees — production configs
    written for a pod slice must still bring up a valid (smaller) mesh on a
    single chip or a virtual CPU mesh.
    """
    if devices is None:
        # Probe before touching jax.devices(): the axon plugin HANGS it
        # (no error) while its tunnel is down, which stalled training
        # drivers for an hour+ (observed round 4). bench/__graft_entry__
        # already fail fast; this is the chokepoint for the drivers.
        from megaportraits_tpu.core.debug import probe_device_count

        if probe_device_count(timeout_s=120.0) is None:
            raise RuntimeError(
                "device backend unavailable (jax.devices() hung or failed "
                "within 120s — axon tunnel down?). For CPU-only runs set "
                "jax.config.update('jax_platforms', 'cpu') before any "
                "device use."
            )
        devices = jax.devices()
    if not shape:
        shape = {DATA_AXIS: len(devices)}
    if strict:
        dims = tuple(shape.values())
        assert int(np.prod(dims)) == len(devices), (
            f"mesh shape {shape} does not match {len(devices)} devices"
        )
    else:
        requested = dict(shape)
        shape = fit_mesh_shape(shape, len(devices))
        if shape != requested:
            # A production misconfiguration silently running at reduced
            # parallelism must be visible (advisor finding, round 2).
            import warnings

            warnings.warn(
                f"mesh shape {requested} adapted to {shape} for "
                f"{len(devices)} visible devices",
                stacklevel=2,
            )
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names)


def check_per_chip_batch(global_batch: int, mesh: Mesh) -> int:
    """Return the per-chip batch; warn if it lands in the pathological
    XLA:TPU conv regime.

    Measured (benchmarks/RESULTS.md round-3 shape table): per-chip
    batches 2-4 pad the batch axis toward the 8-wide sublane tile and run
    up to 8.3x slower PER SAMPLE than batch 1 (b4 -> b8 is free). Use
    per-chip batch 1 (scale via the data axis; under GSPMD the BN batch
    reduction stays global across shards) or >= 8.
    """
    data = mesh.shape.get(DATA_AXIS, 1)
    # Ceil division: a non-dividing batch leaves some shard carrying the
    # ceiling (e.g. batch 12 over data=8 -> shards of 2), which is what
    # the conv regime sees.
    per_chip = max(1, -(-global_batch // data))
    if global_batch % data != 0:
        import warnings

        warnings.warn(
            f"global batch {global_batch} does not divide the data-axis "
            f"size {data}: jax.sharding cannot shard it evenly — the step "
            f"will fail (or pad) at the sharding layer. Use a multiple of "
            f"the data-axis size.",
            stacklevel=2,
        )
    if 2 <= per_chip <= 7:
        import warnings

        warnings.warn(
            f"per-chip batch {per_chip} is in the pathological TPU conv "
            f"regime (2-7, padded toward the 8-wide sublane tile; batch 2 "
            f"measured up to ~8x worse per-sample than batch 1). Use "
            f"batch_size = data-axis size, or >= 8x data-axis size.",
            stacklevel=2,
        )
    return per_chip


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
