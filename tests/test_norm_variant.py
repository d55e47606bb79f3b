"""GroupNorm arch variant (core/arch.py `norm`, VERDICT r4 item 2).

The reference's only BatchNorm sites are the ResBlock2D family
(model.py:600-640 — the G2d/Genh synthesis trunks). Round 4 measured a
large train/eval BN-statistics gap at small batch/data scale (three BN
serving conventions grew out of it). `norm='group'` replaces those sites
with AffineGroupNorm(32): the forward is identical in train and eval
mode and per-sample independent, which these tests pin down.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from megaportraits_tpu.core.arch import TINY
from megaportraits_tpu.core.dtypes import FP32_POLICY

TINY_GN = dataclasses.replace(TINY, norm="group")


def _leaf_paths(tree):
    return [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]


def test_g2d_groupnorm_has_no_batch_stats_and_no_train_gap():
    from megaportraits_tpu.models.g2d import G2d

    m = G2d(policy=FP32_POLICY, arch=TINY_GN)
    x = jnp.linspace(-1, 1, 2 * 8 * 8 * TINY_GN.ch(96)).reshape(
        2, 8, 8, TINY_GN.ch(96)
    ).astype(jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in v, _leaf_paths(v)
    out_train = m.apply(v, x, True)
    out_eval = m.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_eval))


def test_g2d_groupnorm_batch_composition_invariance():
    """The BN failure mode GN removes: a sample's output must not depend
    on what else is in the batch (train-mode BN stats span the batch)."""
    from megaportraits_tpu.models.g2d import G2d

    m = G2d(policy=FP32_POLICY, arch=TINY_GN)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 8, 8, TINY_GN.ch(96)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    batched = m.apply(v, x, True)
    solo = m.apply(v, x[:1], True)
    np.testing.assert_allclose(
        np.asarray(batched[:1]), np.asarray(solo), rtol=0, atol=1e-6
    )


def test_genh_groupnorm_no_batch_stats():
    from megaportraits_tpu.models.genh import Genh

    m = Genh(policy=FP32_POLICY, arch=TINY_GN)
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    v = m.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in v
    out = m.apply(v, x, True)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gbase_groupnorm_train_step_smoke():
    """The fused stage-1 step runs under norm='group' (Emtn backbones keep
    their BN, so batch_stats threading stays exercised) and the G2d
    param tree carries GN scale/bias instead of BN stats."""
    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.train.train_base import (
        init_states, make_train_step,
    )

    cfg = Config()
    cfg.model.arch = "tiny"
    cfg.model.norm = "group"
    cfg.data.train_width = cfg.data.train_height = 32
    cfg.training.steps_per_epoch = 1
    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, jax.random.PRNGKey(0), policy=FP32_POLICY, image_size=32,
        fast_init=True,
    )
    # Emtn's resnet backbones still carry BN stats; G2d must not.
    stats_paths = _leaf_paths(g_state.batch_stats)
    assert stats_paths, "Emtn BN stats should remain"
    assert not any("g2d" in p for p in stats_paths), stats_paths
    assert any("g2d" in p and ("gn1" in p or "gn2" in p)
               for p in _leaf_paths(g_state.params))

    step = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        k: rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        for k in ("source", "driving", "source_next", "source_star",
                  "driving_star")
    }
    g2, d2, metrics, xhat = step(g_state, d_state, batch)
    assert np.isfinite(float(metrics["loss_G"]))
    assert np.isfinite(float(metrics["loss_D"]))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_state.params, g2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
