"""Arch scaling presets (core/arch.py) — the gate-sized dryrun graph.

The 'tiny' preset keeps EVERY component of the stage-1 pipeline at ~8x
narrower widths / 1-block depths so the full DP x FSDP training step
compiles cold in minutes on a 1-core host (the driver's dryrun_multichip
contract; VERDICT r2 item 1). FULL must stay the identity — golden-parity
tests and converted checkpoints depend on the exact reference sizes.
"""

import jax
import jax.numpy as jnp
import pytest

from megaportraits_tpu.core.arch import FULL, TINY, get_arch


def test_full_arch_is_identity():
    for c in (3, 64, 96, 512, 768, 1536, 2048):
        assert FULL.ch(c) == c
    assert FULL.volume_channels == 96 and FULL.volume_depth == 16
    assert FULL.compress_dim == 512 and FULL.grid_size == 64
    assert FULL.g2d_blocks == 8 and FULL.disc_stages == 4


def test_tiny_channels_are_groupnorm_compatible():
    # Every GroupNorm in the block zoo uses 32 groups: scaled channels must
    # be multiples of 32 and >= 32.
    for c in (32, 64, 96, 128, 192, 256, 384, 512, 768, 1536, 2048):
        s = TINY.ch(c)
        assert s >= 32 and s % 32 == 0, (c, s)
    assert TINY.volume_channels % 32 == 0


def test_get_arch():
    assert get_arch("full") is FULL
    assert get_arch(TINY) is TINY
    with pytest.raises(ValueError):
        get_arch("medium-rare")


def test_tiny_gbase_forward_shapes():
    """Tiny Gbase compiles fast and keeps the pipeline contract:
    [B,H,W,3] -> ([B,H,W,3] in [0,1], 2-scale pyramids)."""
    from megaportraits_tpu.core.dtypes import FP32_POLICY
    from megaportraits_tpu.models.gbase import Gbase

    m = Gbase(policy=FP32_POLICY, arch=TINY)
    x = jnp.linspace(0, 1, 2 * 32 * 32 * 3, dtype=jnp.float32).reshape(
        2, 32, 32, 3
    )
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, x)
    xhat, pyr = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, x, x)
    assert xhat.shape == (2, 32, 32, 3)
    assert float(xhat.min()) >= 0.0 and float(xhat.max()) <= 1.0
    assert set(pyr) == {"0.5", "0.25"}
    assert pyr["0.5"].shape == (2, 16, 16, 3)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    assert n_params < 3_000_000, n_params  # gate-sized, not full-sized


@pytest.mark.slow
def test_tiny_train_step_on_virtual_mesh():
    """The exact dryrun_multichip configuration as a pytest: tiny arch,
    8-device DP x FSDP mesh, full fused G+D step, finite metrics."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import Policy
    from megaportraits_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
    from megaportraits_tpu.parallel.sharding_rules import shard_params
    from megaportraits_tpu.train.train_base import init_states, make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh({DATA_AXIS: 4, MODEL_AXIS: 2},
                     devices=jax.devices()[:8])
    size = 32
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.training.steps_per_epoch = 1
    cfg.model.arch = "tiny"
    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, jax.random.PRNGKey(0), policy=Policy(compute_dtype=jnp.float32),
        image_size=size, fast_init=True,
    )
    rep = NamedSharding(mesh, P())
    g_state = jax.device_put(g_state, rep)
    d_state = jax.device_put(d_state, rep)
    p_vars = jax.device_put(p_vars, rep)
    g_state = g_state.replace(
        params=shard_params(g_state.params, mesh, min_shard_size=2**10)
    )
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (5, 4, size, size, 3))
    batch = dict(zip(
        ("source", "driving", "source_next", "source_star", "driving_star"),
        imgs,
    ))
    batch = jax.device_put(batch, NamedSharding(mesh, P(DATA_AXIS)))
    step = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False)
    g2, d2, metrics, _ = step(g_state, d_state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(g2.step) == 1 and int(d2.step) == 1


@pytest.mark.slow
def test_pool_index_step_matches_plain_step():
    """pool_index=True with index i == plain step on pool[i] (tiny arch)."""
    import numpy as np

    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.core.dtypes import Policy
    from megaportraits_tpu.train.train_base import init_states, make_train_step

    size = 32
    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.training.steps_per_epoch = 1
    cfg.model.arch = "tiny"
    gbase, disc, ploss, p_vars, g_state, d_state = init_states(
        cfg, jax.random.PRNGKey(0), policy=Policy(compute_dtype=jnp.float32),
        image_size=size, fast_init=True,
    )
    keys = ("source", "driving", "source_next", "source_star", "driving_star")
    pool = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (3, 2, size, size, 3))
        for i, k in enumerate(keys)
    }
    plain = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False)
    pooled = make_train_step(gbase, disc, ploss, p_vars, cfg, donate=False,
                             pool_index=True)
    g_a, d_a, m_a, x_a = plain(
        g_state, d_state, {k: v[1] for k, v in pool.items()})
    g_b, d_b, m_b, x_b = pooled(g_state, d_state, pool, 1)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b), atol=1e-6)
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_a.params),
                    jax.tree_util.tree_leaves(g_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
