"""Infrastructure tests: config schema, Orbax checkpoint roundtrip,
optimizer freezing mask, mesh/sharding helpers, prefetch."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.checkpoint import CheckpointManager
from megaportraits_tpu.core.config import Config, load_config
from megaportraits_tpu.train.state import TrainState, make_optimizer, _trainable_mask


def test_config_loads_reference_schema(tmp_path):
    cfg = load_config("configs/training/stage1-base.yaml")
    assert cfg.data.train_width == 512
    assert cfg.training.w_per == 20
    assert cfg.training.w_fm == 40
    assert cfg.training.lr == 1e-5
    assert cfg.training.base_epochs == 100
    # Unknown keys are ignored, missing keys take defaults.
    p = tmp_path / "min.yaml"
    p.write_text("training:\n  lr: 0.001\n  bogus_key: 1\n")
    cfg2 = load_config(str(p))
    assert cfg2.training.lr == 0.001
    assert cfg2.data.train_width == 512


def test_stage3_student_config_roundtrip():
    """The checked-in stage-3 yaml loads and is the train-student CLI
    default (VERDICT r3 item 8; the reference ships no stage-3 config —
    its trainer hardcodes everything, train_student.py:365-403)."""
    cfg = load_config("configs/training/stage3-student.yaml")
    assert cfg.data.train_width == 512
    assert cfg.training.student_epochs == 100
    assert cfg.training.num_avatars == 4
    assert cfg.training.checkpoint_path == "./checkpoints/stage3"
    # CLI default wiring.
    import megaportraits_tpu.train.main_student as ms
    import inspect

    assert "stage3-student.yaml" in inspect.getsource(ms.main)


def test_checkpoint_roundtrip(tmp_path):
    tx = make_optimizer(1e-4, 10)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = TrainState.create(params, None, tx)
    state = state.apply_gradients({"w": jnp.ones((4, 4)) * 0.1,
                                   "b": jnp.ones((4,)) * 0.1})

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, {"g": state}, wait=True)
    assert mgr.latest_step() == 1

    fresh = TrainState.create(params, None, tx)
    restored = mgr.restore({"g": fresh})["g"]
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))
    assert int(restored.step) == 1
    mgr.close()


def test_trainable_mask_freezes_rotation_net():
    params = {
        "motion_encoder": {
            "rotation_net": {"trunk": {"kernel": jnp.ones(3)}},
            "fc": {"kernel": jnp.ones(3)},
        },
        "g2d": {"conv": {"kernel": jnp.ones(3)}},
    }
    mask = _trainable_mask(params)
    assert mask["motion_encoder"]["rotation_net"]["trunk"]["kernel"] is False
    assert mask["motion_encoder"]["fc"]["kernel"] is True
    assert mask["g2d"]["conv"]["kernel"] is True


def test_frozen_params_not_updated_by_optimizer():
    params = {
        "rotation_net": {"k": jnp.ones((2,))},
        "other": {"k": jnp.ones((2,))},
    }
    tx = make_optimizer(0.1, 10, params_example=params)
    state = TrainState.create(params, None, tx)
    grads = {"rotation_net": {"k": jnp.ones((2,))},
             "other": {"k": jnp.ones((2,))}}
    new = state.apply_gradients(grads)
    np.testing.assert_array_equal(np.asarray(new.params["rotation_net"]["k"]),
                                  np.asarray(params["rotation_net"]["k"]))
    assert not np.allclose(np.asarray(new.params["other"]["k"]),
                           np.asarray(params["other"]["k"]))


def test_mesh_and_shard_batch():
    from megaportraits_tpu.parallel.mesh import (
        batch_sharding, make_mesh, shard_batch,
    )

    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    batch = {"x": np.ones((8, 4, 4, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh)


def test_prefetch_to_device_preserves_order():
    from megaportraits_tpu.data.prefetch import prefetch_to_device

    items = [{"a": np.full((2,), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(items), size=2))
    assert len(out) == 5
    for i, item in enumerate(out):
        np.testing.assert_array_equal(np.asarray(item["a"]),
                                      np.full((2,), i, np.float32))


def test_fsdp_param_sharding_on_fake_mesh():
    from megaportraits_tpu.parallel.mesh import make_mesh
    from megaportraits_tpu.parallel.sharding_rules import (
        fsdp_param_specs, shard_params,
    )
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh({"data": 2, "model": 4})
    params = {
        "big_kernel": jnp.ones((3, 3, 256, 512)),   # shard feature axis
        "odd_kernel": jnp.ones((3, 3, 7, 13)),       # small -> replicate
        "bias": jnp.ones((512,)),                    # small -> replicate
        "dense": jnp.ones((2048, 512)),              # shard last axis
    }
    specs = fsdp_param_specs(params, mesh)
    assert specs["big_kernel"] == P(None, None, None, "model")
    assert specs["dense"] == P(None, "model")
    assert specs["bias"] == P()
    assert specs["odd_kernel"] == P()

    sharded = shard_params(params, mesh)
    # A sharded matmul executes correctly on the mesh.
    y = jax.jit(lambda p, x: x @ p["dense"])(
        sharded, jnp.ones((4, 2048))
    )
    np.testing.assert_allclose(np.asarray(y), 2048.0)


def test_per_chip_batch_warning():
    """Batches 2-7 per chip warn (pathological TPU conv regime); 1 and 8
    don't; non-dividing batches use the CEILING shard size. Measured
    basis: benchmarks/RESULTS.md round-3 shape table."""
    import warnings

    from megaportraits_tpu.parallel.mesh import check_per_chip_batch, make_mesh

    mesh = make_mesh({"data": 1}, devices=jax.devices()[:1])
    for batch, should_warn in ((1, False), (2, True), (4, True), (7, True),
                               (8, False)):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            per_chip = check_per_chip_batch(batch, mesh)
        assert per_chip == batch
        hits = [x for x in w if "pathological" in str(x.message)]
        assert bool(hits) == should_warn, (batch, [str(x.message) for x in w])

    mesh4 = make_mesh({"data": 4}, devices=jax.devices()[:4])
    for batch, expect, should_warn in ((4, 1, False), (6, 2, True),
                                       (32, 8, False), (3, 1, False)):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            per_chip = check_per_chip_batch(batch, mesh4)
        assert per_chip == expect, (batch, per_chip)
        hits = [x for x in w if "pathological" in str(x.message)]
        assert bool(hits) == should_warn, (batch, [str(x.message) for x in w])
