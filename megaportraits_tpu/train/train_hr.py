"""Stage-2: high-resolution enhancer training (reference train_highres.py:297-364).

Gbase is frozen (stop_gradient, the reference's torch.no_grad forward,
train_highres.py:319-321); Genh learns:
  * supervised L1 + VGG19-slice perceptual vs the HR target
  * unsupervised cycle L1 (Genh(Genh(x)) ~ x, reference model.py:1389)
AdamW + cosine, same optimizer family as stage 1.

For 512 -> 1024 super-resolution the base output is bilinearly pre-upscaled
x2 before entering Genh (Genh itself is shape-preserving; the reference's
README 512->1024 contract, README.md:104).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.config import Config
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.losses.perceptual import PerceptualLoss
from megaportraits_tpu.models.gbase import Gbase
from megaportraits_tpu.models.genh import Genh
from megaportraits_tpu.ops.resize import linear_resize
from megaportraits_tpu.train.state import TrainState, make_optimizer


def init_hr_state(cfg: Config, rng: jax.Array, policy: Policy = DEFAULT_POLICY,
                  image_size: int = 512, upscale: int = 2):
    arch = cfg.make_arch()
    genh = Genh(policy=policy, arch=arch)
    k1, k2 = jax.random.split(rng)
    dummy = jnp.zeros((1, image_size * upscale, image_size * upscale, 3),
                      policy.compute_dtype)
    variables = jax.jit(genh.init)(k1, dummy)
    ploss = PerceptualLoss(weights={"vgg19": 1.0, "vggface": 0.0, "gaze": 0.0,
                                    "lpips": 0.0}, policy=policy, arch=arch)
    p_vars = jax.jit(ploss.init)(k2, dummy, dummy)
    steps = (cfg.training.steps_per_epoch or 1) * cfg.training.hr_epochs
    tx = make_optimizer(cfg.training.lr, steps)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"), tx)
    return genh, ploss, p_vars, state


def make_hr_train_step(
    genh: Genh,
    gbase: Gbase,
    gbase_variables: Any,
    ploss: PerceptualLoss,
    ploss_vars: Any,
    cfg: Config,
    upscale: int = 2,
    w_sup: float = 1.0,
    w_unsup: float = 1.0,
    w_per: float = 1.0,
    donate: bool = True,
):
    # Frozen-model variables are threaded as JIT ARGUMENTS (bound by the
    # returned wrapper) — closed-over trees become HLO constants and bloat
    # the compile request by the whole weight size (remote compile service
    # rejects/OOMs).
    def step(state: TrainState, batch: Dict[str, Any], g_vars: Any,
             p_vars: Any):
        xs, xd, target_hr = batch["source"], batch["driving"], batch["target_hr"]

        # Frozen base forward (train_highres.py:319-321).
        xhat_base, _ = gbase.apply(g_vars, xs, xd)
        xhat_base = jax.lax.stop_gradient(xhat_base)
        if upscale != 1:
            hr_size = [s * upscale for s in xhat_base.shape[1:3]]
            xhat_base = linear_resize(xhat_base, hr_size, axes=(1, 2),
                                      align_corners=False)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                (xhat_hr, new_vars) = genh.apply(
                    variables, xhat_base, True, mutable=["batch_stats"]
                )
                new_stats = new_vars["batch_stats"]
                x_cycle = genh.apply(
                    {"params": params, "batch_stats": new_stats},
                    xhat_hr, True, mutable=["batch_stats"],
                )[0]
            else:
                xhat_hr = genh.apply(variables, xhat_base, True)
                new_stats = None
                x_cycle = genh.apply(variables, xhat_hr, True)

            # Genh outputs tanh [-1,1]; targets are [0,1] — compare in [0,1].
            pred01 = (xhat_hr.astype(jnp.float32) + 1.0) * 0.5
            loss_sup = jnp.mean(jnp.abs(pred01 - target_hr.astype(jnp.float32)))
            cycle01 = (x_cycle.astype(jnp.float32) + 1.0) * 0.5
            loss_unsup = jnp.mean(
                jnp.abs(cycle01 - xhat_base.astype(jnp.float32))
            )
            loss_per = ploss.apply(p_vars, pred01, target_hr)
            total = w_sup * loss_sup + w_unsup * loss_unsup + w_per * loss_per
            metrics = {"loss_hr": total, "loss_sup": loss_sup,
                       "loss_unsup": loss_unsup, "loss_per": loss_per}
            return total, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return state.apply_gradients(grads, new_stats), metrics

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    return lambda state, batch: jitted(state, batch, gbase_variables,
                                       ploss_vars)
