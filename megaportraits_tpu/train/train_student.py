"""Stage-3: Student distillation (reference train_highres.py:365-405,
train_student.py).

The frozen teacher GHR produces the target for a fixed set of avatars; the
Student (SPADE-conditioned on avatar index) learns plain MSE distillation
(train_highres.py:388). AdamW + cosine. One jitted step; the teacher
forward is fused into the same XLA graph with stop_gradient.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.config import Config
from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY
from megaportraits_tpu.models.genh import GHR
from megaportraits_tpu.models.student import Student
from megaportraits_tpu.train.state import TrainState, make_optimizer


def init_student_state(
    cfg: Config, rng: jax.Array, policy: Policy = DEFAULT_POLICY,
    image_size: int = 512,
):
    student = Student(num_avatars=cfg.training.num_avatars, policy=policy,
                      arch=cfg.make_arch())
    dummy = jnp.zeros((1, image_size, image_size, 3), policy.compute_dtype)
    idx = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(student.init)(rng, dummy, idx)
    steps = (cfg.training.steps_per_epoch or 1) * cfg.training.student_epochs
    tx = make_optimizer(cfg.training.lr, steps)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"), tx)
    return student, state


def make_student_train_step(
    student: Student,
    teacher: GHR,
    teacher_variables: Any,
    cfg: Config,
    donate: bool = True,
):
    def step(state: TrainState, batch: Dict[str, Any], t_vars: Any):
        xd = batch["driving"]
        avatar_index = batch["avatar_index"]

        if "target01" in batch:
            # Precomputed teacher output (teacher_forward below) — keeps
            # the teacher out of the student's compiled graph; the fused
            # GHR-teacher + student-backward graph at >=256px overwhelms
            # the remote compile service.
            target01 = jax.lax.stop_gradient(batch["target01"])
        else:
            target = teacher.apply(t_vars, batch["source"], xd)
            # Teacher Genh outputs tanh [-1,1]; student sigmoid [0,1].
            target01 = jax.lax.stop_gradient(
                (target.astype(jnp.float32) + 1.0) * 0.5
            )

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                pred, new_vars = student.apply(
                    variables, xd, avatar_index, True, mutable=["batch_stats"]
                )
                new_stats = new_vars["batch_stats"]
            else:
                pred = student.apply(variables, xd, avatar_index, True)
                new_stats = None
            loss = jnp.mean((pred.astype(jnp.float32) - target01) ** 2)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, new_stats), {"loss_student": loss}

    # teacher_variables threaded as a jit argument — closures inline weight
    # trees as HLO constants (compile-request bloat; see make_teacher_forward).
    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    return lambda state, batch: jitted(state, batch, teacher_variables)


def make_teacher_forward(teacher: GHR, teacher_variables: Any,
                         include_enh: bool = True,
                         bn_mode: str = "running"):
    """Frozen-teacher forward returning [0,1] targets, compiled as TWO
    graphs (Gbase, then Genh) on standalone module bindings: the fused
    GHR graph (and even its method-scoped halves) reliably crashes the
    remote compile service at >=128px, while the identical math bound to
    plain Gbase/Genh modules compiles; the split costs one extra device
    round trip per batch on a frozen no-grad path.

    With ``include_enh=False`` the Genh stage is skipped and the Gbase
    output ([0,1] sigmoid) is the target directly — use when no trained
    Genh exists: a RANDOM Genh collapses the target distribution to
    near-constant and makes any student 'perfect' (round-3 finding).

    ``bn_mode='batch'`` runs the teacher's BatchNorms on the input's own
    batch statistics (GAN-generator convention): small-batch-trained
    Gbase checkpoints carry a train/eval BN gap large enough that
    running-stats teacher output is a washed near-constant — the OTHER
    cause of round 3's vacuous gray distillation targets."""
    from megaportraits_tpu.models.gbase import Gbase
    from megaportraits_tpu.models.genh import Genh

    def _sub(tree_key):
        out = {}
        for col, tree in teacher_variables.items():
            if tree_key in tree:
                out[col] = tree[tree_key]
        return out

    base = Gbase(policy=teacher.policy,
                 warp_normalize_mode=teacher.warp_normalize_mode,
                 arch=teacher.arch)
    genh = Genh(policy=teacher.policy, arch=teacher.arch)
    base_vars = _sub("gbase")
    genh_vars = _sub("genh")

    # Variables are jit ARGUMENTS, never closures: closed-over param trees
    # are inlined as HLO constants — a ~0.5 GB compile request that the
    # remote compile service rejects (HTTP 413) or dies buffering
    # (broken pipe). This was the root cause of every fused/split teacher
    # compile failure.
    @jax.jit
    def base_fwd(variables, xs, xd):
        if bn_mode == "batch":
            (xhat, _), _ = base.apply(
                variables, xs, xd, True, mutable=["batch_stats"]
            )
            return xhat
        xhat, _ = base.apply(variables, xs, xd)
        return xhat

    @jax.jit
    def enh_fwd(variables, xhat_base):
        target = genh.apply(variables, xhat_base)
        return (target.astype(jnp.float32) + 1.0) * 0.5

    if not include_enh:
        def forward(xs, xd):
            return base_fwd(base_vars, xs, xd).astype(jnp.float32)

        return forward

    def forward(xs, xd):
        return enh_fwd(genh_vars, base_fwd(base_vars, xs, xd))

    return forward
