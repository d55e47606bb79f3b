"""Stage-1 base training: Gbase vs PatchGAN discriminator.

Reference: train_base (train.py:129-368). Key TPU redesigns (SURVEY.md §7):

  * The reference's per-frame Python loop (train.py:179) is batched into the
    device batch axis — every loss term of a step runs in ONE jitted XLA
    graph (G forward, D step, G step, cross-reenactment pass, 4 Emtn
    descriptor passes, pairwise-transfer passes).
  * CUDA AMP GradScaler -> bf16 compute (no scaler needed on TPU).
  * The GAN two-optimizer step is two clean grad computations with
    stop_gradient at the G/D boundary instead of retain_graph ordering.
  * Data parallel via GSPMD: batch sharded over the mesh 'data' axis,
    params replicated; XLA inserts the gradient all-reduces.

Loss terms (weights from configs/training/stage1-base.yaml:34-40):
  w_per * pyramid perceptual + w_adv * adversarial + w_fm * 'feature
  matching' (pixel MSE) + w_cos * cycle cosine + w_pairwise * pairwise
  transfer + w_identity * identity.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.config import Config
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.losses.cycle import cosine_loss
from megaportraits_tpu.losses.gan import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)
from megaportraits_tpu.models.discriminator import Discriminator
from megaportraits_tpu.models.gbase import Gbase
from megaportraits_tpu.losses.perceptual import PerceptualLoss
from megaportraits_tpu.ops.resize import linear_resize
from megaportraits_tpu.train.state import TrainState, make_optimizer


def _fill_from_shapes(shapes: Any) -> Any:
    """Materialize a ShapeDtypeStruct tree with deterministic host values."""
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, s in flat:
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        if "var" in keys:
            arr = np.ones(s.shape, dtype=s.dtype)
        elif "mean" in keys or "bias" in keys:
            arr = np.zeros(s.shape, dtype=s.dtype)
        else:
            import zlib

            rng = np.random.default_rng(zlib.crc32(keys.encode()))
            arr = rng.normal(0.0, 0.02, s.shape).astype(s.dtype)
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


class BaseTrainer(NamedTuple):
    """Bundled modules + jitted step for stage-1 training."""

    gbase: Gbase
    disc: Discriminator
    ploss: PerceptualLoss
    ploss_vars: Any
    train_step: Any  # jitted (g_state, d_state, batch, rng) -> ...


def init_states(
    cfg: Config,
    rng: jax.Array,
    policy: Policy = DEFAULT_POLICY,
    image_size: Optional[int] = None,
    remat_mode: Optional[str] = None,
    fast_init: bool = False,
) -> Tuple[Gbase, Discriminator, PerceptualLoss, Any, TrainState, TrainState]:
    size = image_size or cfg.data.train_width
    # remat the heavy submodules: without it the fused multi-forward
    # training graph does not fit HBM at 512^2. 'selective' (Eapp+G2d only)
    # is the measured default at >=256: same HBM headroom, fewer recomputed
    # FLOPs than blanket remat (benchmarks/RESULTS.md round 2).
    if remat_mode is None:
        remat_mode = "selective" if size >= 256 else "none"
    arch = cfg.make_arch()
    gbase = cfg.make_gbase(policy=policy, remat=remat_mode)
    disc = Discriminator(policy=policy, arch=arch)
    # Weights pinned to the reference ctor (model.py:1929):
    # {'vgg19': 20, 'vggface': 5, 'gaze': 4, 'lpips': 10}.
    ploss = PerceptualLoss(
        weights={"vgg19": 20.0, "vggface": 5.0, "gaze": 4.0, "lpips": 10.0},
        policy=policy,
        arch=arch,
    )
    k_g, k_d, k_p = jax.random.split(rng, 3)
    dummy = jnp.zeros((1, size, size, 3), policy.compute_dtype)
    if fast_init:
        # Shape-only init (jax.eval_shape traces, never compiles) with a
        # deterministic host-side fill — for compile gates/CI where the
        # init DISTRIBUTION is irrelevant but a ~minute of init compile on
        # a 1-core host is the budget. Running-var leaves are filled with
        # ones (rsqrt of a negative variance would poison eval-mode BN).
        g_vars = _fill_from_shapes(jax.eval_shape(gbase.init, k_g, dummy, dummy))
        d_vars = _fill_from_shapes(jax.eval_shape(disc.init, k_d, dummy, dummy))
        p_vars = _fill_from_shapes(jax.eval_shape(ploss.init, k_p, dummy, dummy))
    else:
        # jit the inits: eager init dispatches thousands of individual ops —
        # pathological through the axon tunnel (~28 ms RTT per dispatch).
        g_vars = jax.jit(gbase.init)(k_g, dummy, dummy)
        d_vars = jax.jit(disc.init)(k_d, dummy, dummy)
        p_vars = jax.jit(ploss.init)(k_p, dummy, dummy)

    # Converted pretrained weights (frozen loss backbones + SixDRepNet +
    # resnet18 trunks) — loaded when a bundle exists at pretrained_path.
    from megaportraits_tpu.utils.pretrained import maybe_load_pretrained

    g_vars, p_vars, msg = maybe_load_pretrained(
        cfg.training.pretrained_path, g_vars, p_vars
    )
    # Always surface the graft report: a missing/mistyped pretrained_path
    # means every frozen loss backbone runs RANDOM — that must be visible.
    print(msg)

    steps_per_epoch = cfg.training.steps_per_epoch or 1
    total_steps = cfg.training.base_epochs * steps_per_epoch
    tx_g = make_optimizer(
        cfg.training.lr, total_steps, params_example=g_vars["params"]
    )
    tx_d = make_optimizer(cfg.training.lr, total_steps)
    g_state = TrainState.create(
        g_vars["params"], g_vars.get("batch_stats"), tx_g
    )
    d_state = TrainState.create(d_vars["params"], d_vars.get("batch_stats"), tx_d)
    return gbase, disc, ploss, p_vars, g_state, d_state


def make_train_step(
    gbase: Gbase,
    disc: Discriminator,
    ploss: PerceptualLoss,
    ploss_vars: Any,
    cfg: Config,
    donate: bool = True,
    unroll: int = 1,
    pool_index: bool = False,
):
    """Build the fused train step (D update + G update + metrics).

    With unroll > 1, the returned function takes batches stacked on a
    leading [unroll] axis and runs them in one device call via lax.scan
    (amortizes host dispatch latency); it returns the last step's metrics
    and prediction.

    With pool_index=True, the returned function has signature
    ``(g_state, d_state, pool, i)`` where ``pool`` is a batch dict with a
    leading pool axis kept resident on device and ``i`` a scalar index —
    no per-step host->device batch transfer.
    """
    t = cfg.training
    w = dict(per=t.w_per, adv=t.w_adv, fm=t.w_fm, cos=t.w_cos,
             pairwise=t.w_pairwise, identity=t.w_identity)

    # NOTE: ploss_vars is threaded through as a JIT ARGUMENT (bound by the
    # returned wrapper), never closed over: closed-over param trees are
    # inlined as HLO constants, which bloats the compile request by the
    # full frozen-backbone weight size (the remote compile service
    # rejects/OOMs on such requests, and compiles take far longer).
    def g_forward(params, batch_stats, xs, xd, train):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            (xhat, pyr), new_vars = gbase.apply(
                variables, xs, xd, True, mutable=["batch_stats"]
            )
            return xhat, pyr, new_vars["batch_stats"]
        xhat, pyr = gbase.apply(variables, xs, xd, train)
        return xhat, pyr, batch_stats

    def step(g_state: TrainState, d_state: TrainState, batch: Dict[str, Any],
             p_vars: Any = None):
        def perceptual(pred, target):
            return ploss.apply(p_vars, pred, target)

        xs = batch["source"]
        xd = batch["driving"]
        xs_next = batch["source_next"]
        xs_star = batch["source_star"]
        xd_star = batch["driving_star"]
        # Legacy-trainer foreground masking (train_highres.py:244-248):
        # host-computed mask multiplies pred/target before the perceptual
        # terms. [B, H, W, 1], 1 = keep.
        fg_mask = (
            batch.get("foreground_mask")
            if t.use_foreground_mask else None
        )
        # Opt-in gaze term: [B, H, W, 2] host-rasterized left/right
        # eye-region masks (losses/gaze.gaze_masks_for_batch); per-eye
        # masked MSE between prediction and driving frame
        # (reference MPGazeLoss, model.py:1830-1880 / legacy trainer
        # train_highres.py:164-207).
        gaze_masks = (
            batch.get("gaze_masks") if t.use_gaze_loss else None
        )

        # ------------------------------------------------------------------
        # Generator loss (captures everything that needs G gradients).
        #
        # TPU-first redesign: the reference re-runs whole networks for every
        # auxiliary loss term (train.py:269,283,289-293 — ~10 extra
        # forwards/step). Here every auxiliary pass rides ONE batched
        # application of each sub-network instead:
        #   * appearance encoder once on [xs; xs_star],
        #   * motion encoder once on [xs; xd; xs_next; xs_star; xd_star]
        #     and once on the predictions [xhat; xhat_star],
        #   * the synthesis trunk once on the 4 stacked descriptor mixes
        #     (main, cross-reenactment, pairwise-pose, pairwise-exp).
        # Same math on the same inputs; the only deviation from per-call
        # semantics is that train-mode BatchNorm statistics are computed
        # over the concatenated batches (the reference computes them per
        # forward call) — larger-batch statistics, documented here.
        # Cuts compiled graph size ~3x and removes ~6 redundant encoder
        # runs per step.
        # ------------------------------------------------------------------
        def g_loss_fn(g_params):
            variables = {"params": g_params}
            if g_state.batch_stats is not None:
                variables["batch_stats"] = g_state.batch_stats

            mutable = (
                ["batch_stats"] if g_state.batch_stats is not None else False
            )
            new_stats = g_state.batch_stats

            def run(*args, method=None):
                # Thread batch_stats BETWEEN calls: Flax returns untouched
                # submodules at their input values, so applying every call
                # against the original stats would keep only the last
                # call's updates (appearance/synthesis BN stats frozen at
                # init forever). Each mutable apply reads the previous
                # call's merged stats and merges its own updates back.
                nonlocal new_stats, variables
                out = gbase.apply(variables, *args, method=method,
                                  mutable=mutable)
                if mutable:
                    out, new_vars = out
                    new_stats = new_vars.get("batch_stats")
                    variables = {**variables, "batch_stats": new_stats}
                return out

            b = xs.shape[0]

            def split(x, n):
                return [x[i * b:(i + 1) * b] for i in range(n)]

            # Appearance: [xs; xs_star] in one pass.
            vs_all, es_all = run(
                jnp.concatenate([xs, xs_star], 0), True,
                method=Gbase.encode_appearance,
            )
            (vs_s, vs_star), (es_s, es_star) = split(vs_all, 2), split(es_all, 2)

            # Motion: all five source images in one pass.
            r_all, t_all, z_all = run(
                jnp.concatenate([xs, xd, xs_next, xs_star, xd_star], 0), True,
                method=Gbase.encode_motion,
            )
            rs, rd, rn, rst, _ = split(r_all, 5)
            ts, td, tn, tst, _ = split(t_all, 5)
            zs, zd, zn, zst, zd_star = split(z_all, 5)

            # Synthesis: 4 descriptor mixes in one pass —
            #   [0] main reenactment   (xs appearance, xs->xd motion)
            #   [1] cross-reenactment  (xs_star appearance, xs_star->xd)
            #   [2] pairwise I_pose    (pose of xs_next, expression of xs)
            #   [3] pairwise I_exp     (pose of xs, expression of xs_next)
            # Mixes [2]/[3] feed the same descriptors to both warp
            # generators, as the reference does (model.py:2190-2218).
            cat = lambda parts: jnp.concatenate(parts, 0)
            out = run(
                cat([vs_s, vs_star, vs_s, vs_s]),
                cat([es_s, es_star, es_s, es_s]),
                cat([rs, rst, rn, rs]), cat([ts, tst, tn, ts]),
                cat([zs, zst, zs, zn]),
                cat([rd, rd, rn, rs]), cat([td, td, tn, ts]),
                cat([zd, zd, zs, zn]),
                True,
                method=Gbase.synthesize,
            )
            xhat, xhat_star, i_pose, i_exp = split(out, 4)
            pyramids = gbase.pyramids(xhat)

            # Pyramid perceptual loss vs the driving frame (train.py:220-223).
            loss_per = jnp.float32(0.0)
            for scale, pred_scaled in pyramids.items():
                tgt = linear_resize(
                    xd, pred_scaled.shape[1:3], axes=(1, 2), align_corners=False
                )
                if fg_mask is not None:
                    m = linear_resize(
                        fg_mask.astype(pred_scaled.dtype),
                        pred_scaled.shape[1:3], axes=(1, 2),
                        align_corners=False,
                    )
                    pred_scaled = pred_scaled * m
                    tgt = tgt * m
                loss_per = loss_per + perceptual(pred_scaled, tgt)

            # Adversarial: D is frozen inside the G step.
            d_vars = {"params": jax.lax.stop_gradient(d_state.params)}
            fake_pred = disc.apply(d_vars, xhat, xs)
            loss_adv = generator_adversarial_loss(fake_pred, "lsgan")

            loss_fm = feature_matching_loss(xhat, xd)

            # Cycle cosine (train.py:289-304): motion descriptors of the two
            # predictions in one batched pass; driving descriptors reuse the
            # source-motion pass above.
            _, _, z_pred_all = run(
                jnp.concatenate([xhat, xhat_star], 0), True,
                method=Gbase.encode_motion,
            )
            z_pred, z_star_pred = split(z_pred_all, 2)
            loss_cos = cosine_loss(
                [(z_pred, zd), (z_star_pred, zd)],
                [(z_pred, zd_star), (z_star_pred, zd_star)],
            )

            # Pairwise transfer (model.py:2186-2219) on same-video frames.
            loss_pairwise = jnp.mean(
                jnp.abs(i_pose.astype(jnp.float32) - i_exp.astype(jnp.float32))
            )

            # Identity similarity between the cross-reenactment source and
            # its output (documented intent of model.py:2221-2261).
            loss_identity = perceptual(xhat_star, xs_star)

            total = (
                w["per"] * loss_per
                + w["adv"] * loss_adv
                + w["fm"] * loss_fm
                + w["cos"] * loss_cos
                + w["pairwise"] * loss_pairwise
                + w["identity"] * loss_identity
            )
            loss_gaze = jnp.float32(0.0)
            if gaze_masks is not None:
                from megaportraits_tpu.losses.gaze import mp_gaze_loss

                m = gaze_masks.astype(jnp.float32)
                loss_gaze = mp_gaze_loss(
                    xhat, xd, m[..., 0:1], m[..., 1:2]
                )
                total = total + t.lambda_gaze * loss_gaze
            metrics = {
                "loss_G": total,
                "loss_G_per": loss_per,
                "loss_G_adv": loss_adv,
                "loss_fm": loss_fm,
                "loss_G_cos": loss_cos,
                "loss_pairwise": loss_pairwise,
                "loss_identity": loss_identity,
                "loss_G_gaze": loss_gaze,
            }
            return total, (metrics, new_stats, xhat)

        (loss_g, (metrics, new_g_stats, xhat)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params)

        # ------------------------------------------------------------------
        # Discriminator loss on the detached prediction (train.py:237-247).
        # ------------------------------------------------------------------
        def d_loss_fn(d_params):
            d_vars = {"params": d_params}
            real_pred = disc.apply(d_vars, xd, xs)
            fake_pred = disc.apply(d_vars, jax.lax.stop_gradient(xhat), xs)
            return discriminator_loss(real_pred, fake_pred, "lsgan")

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        metrics["loss_D"] = loss_d

        new_g_state = g_state.apply_gradients(g_grads, new_g_stats)
        new_d_state = d_state.apply_gradients(d_grads)
        return new_g_state, new_d_state, metrics, xhat

    donate_argnums = (0, 1) if donate else ()
    if pool_index and unroll > 1:
        raise ValueError("pool_index and unroll>1 are mutually exclusive")
    if pool_index:
        # Device-resident batch pool: the caller uploads a pool of batches
        # ONCE ([N, ...] leading axis) and passes a scalar index per step;
        # the batch is sliced on device. Removes the per-step host->device
        # transfer (the dominant wall-clock cost through the axon tunnel:
        # ~1.2 s/step of ~4-8 MB uploads vs ~0.1 s device time).
        def pool_step(g_state, d_state, pool, i, p_vars):
            batch = jax.tree_util.tree_map(lambda x: x[i], pool)
            return step(g_state, d_state, batch, p_vars)

        jitted_pool = jax.jit(pool_step, donate_argnums=donate_argnums)
        return lambda g, d, pool, i: jitted_pool(g, d, pool, i, ploss_vars)
    if unroll <= 1:
        jitted = jax.jit(step, donate_argnums=donate_argnums)
        return lambda g, d, b: jitted(g, d, b, ploss_vars)

    def multi_step(g_state, d_state, batches, p_vars):
        def body(carry, batch):
            g, d = carry
            g, d, metrics, xhat = step(g, d, batch, p_vars)
            return (g, d), metrics

        (g_state, d_state), metrics = jax.lax.scan(
            body, (g_state, d_state), batches
        )
        last_metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return g_state, d_state, last_metrics, None

    jitted_multi = jax.jit(multi_step, donate_argnums=donate_argnums)
    return lambda g, d, b: jitted_multi(g, d, b, ploss_vars)
