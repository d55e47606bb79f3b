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
    student = Student(num_avatars=cfg.training.num_avatars, policy=policy)
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
    def step(state: TrainState, batch: Dict[str, Any]):
        xd = batch["driving"]
        avatar_index = batch["avatar_index"]

        if "target01" in batch:
            # Precomputed teacher output (teacher_forward below) — keeps
            # the teacher out of the student's compiled graph; the fused
            # GHR-teacher + student-backward graph at >=256px overwhelms
            # the remote compile service.
            target01 = jax.lax.stop_gradient(batch["target01"])
        else:
            target = teacher.apply(teacher_variables, batch["source"], xd)
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

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_teacher_forward(teacher: GHR, teacher_variables: Any):
    """Frozen-teacher forward returning [0,1] targets, compiled as TWO
    graphs (Gbase, then Genh): the fused GHR graph at >=256px crashes the
    remote compile service; each half compiles fine and the split costs
    one extra device round trip per batch on a frozen no-grad path."""

    @jax.jit
    def base_fwd(xs, xd):
        xhat, _ = teacher.apply(teacher_variables, xs, xd,
                                method=lambda m, a, b: m.gbase(a, b))
        return xhat

    @jax.jit
    def enh_fwd(xhat_base):
        target = teacher.apply(teacher_variables, xhat_base,
                               method=lambda m, a: m.genh(a))
        return (target.astype(jnp.float32) + 1.0) * 0.5

    def forward(xs, xd):
        return enh_fwd(base_fwd(xs, xd))

    return forward
