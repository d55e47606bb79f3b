"""Smoke tests for stage-2 (Genh HR) and stage-3 (Student) fused train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.config import Config
from megaportraits_tpu.core.dtypes import FP32_POLICY

SIZE = 64


def _cfg():
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = SIZE
    cfg.training.steps_per_epoch = 1
    cfg.training.num_avatars = 2
    return cfg


@pytest.mark.slow
def test_hr_train_step_runs_and_updates():
    from megaportraits_tpu.models.gbase import Gbase
    from megaportraits_tpu.train.train_hr import init_hr_state, make_hr_train_step

    cfg = _cfg()
    rng = jax.random.PRNGKey(0)
    gbase = Gbase(policy=FP32_POLICY)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    gbase_vars = gbase.init(rng, dummy, dummy)

    genh, ploss, p_vars, state = init_hr_state(
        cfg, rng, FP32_POLICY, image_size=SIZE, upscale=2
    )
    step = make_hr_train_step(genh, gbase, gbase_vars, ploss, p_vars, cfg,
                              upscale=2, donate=False)
    rng_np = np.random.default_rng(0)
    batch = {
        "source": rng_np.random((1, SIZE, SIZE, 3)).astype(np.float32),
        "driving": rng_np.random((1, SIZE, SIZE, 3)).astype(np.float32),
        "target_hr": rng_np.random((1, SIZE * 2, SIZE * 2, 3)).astype(np.float32),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_hr"]))
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_student_train_step_runs_and_updates():
    from megaportraits_tpu.models.genh import GHR
    from megaportraits_tpu.train.train_student import (
        init_student_state,
        make_student_train_step,
    )

    cfg = _cfg()
    rng = jax.random.PRNGKey(0)
    teacher = GHR(policy=FP32_POLICY)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    teacher_vars = teacher.init(rng, dummy, dummy)

    student, state = init_student_state(cfg, rng, FP32_POLICY, image_size=SIZE)
    step = make_student_train_step(student, teacher, teacher_vars, cfg,
                                   donate=False)
    rng_np = np.random.default_rng(0)
    batch = {
        "source": rng_np.random((1, SIZE, SIZE, 3)).astype(np.float32),
        "driving": rng_np.random((1, SIZE, SIZE, 3)).astype(np.float32),
        "avatar_index": np.zeros((1,), np.int32),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_student"]))
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
