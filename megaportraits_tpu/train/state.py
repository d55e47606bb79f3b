"""Train state + optimizers.

Reference: AdamW(lr, betas=(0.5, 0.999), weight_decay=1e-2) for both G and D
(train.py:135-136) with CosineAnnealingLR(T_max=epochs, eta_min=1e-6)
stepped per epoch (train.py:137-138, 342-343). The frozen SixDRepNet
detector lives outside torch's parameter registration (model.py:876) so it
never receives updates — replicated here with an optax mask over the
'rotation_net' subtree.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def _trainable_mask(params, frozen_keys=("rotation_net",)):
    """True for trainable leaves; False under any frozen subtree name."""

    def walk(tree, frozen):
        if isinstance(tree, (dict, FrozenDict)):
            return {
                k: walk(v, frozen or any(f in str(k) for f in frozen_keys))
                for k, v in tree.items()
            }
        return not frozen

    return walk(params, False)


def make_optimizer(
    lr: float,
    total_steps: int,
    eta_min: float = 1e-6,
    b1: float = 0.5,
    b2: float = 0.999,
    weight_decay: float = 1e-2,
    params_example: Optional[Any] = None,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + torch-style cosine annealing; frozen subtrees masked out."""
    schedule = optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=max(total_steps, 1),
        alpha=eta_min / lr if lr > 0 else 0.0,
    )
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if params_example is not None:
        mask = _trainable_mask(params_example)
        if not jax.tree_util.tree_all(jax.tree_util.tree_map(bool, mask)):
            # NOTE: optax.masked passes raw gradients through for masked-out
            # leaves (they would be applied verbatim) — frozen subtrees must
            # be routed to set_to_zero instead.
            labels = jax.tree_util.tree_map(
                lambda trainable: "train" if trainable else "frozen", mask
            )
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, labels
            )
    return tx
