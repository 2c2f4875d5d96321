"""Training state: one pytree carrying everything mutable.

Unlike the reference (model / optimizer / scheduler / GradientBlender /
epoch counter as separate host objects, SURVEY.md §5 'Checkpoint/resume':
save-only, no resume), the full state here is a single flax PyTreeNode that
Orbax checkpoints atomically: params, BN statistics, optimizer state
(momentum + schedule step), gradient-blending state, epoch and RNG key —
so training is resumable mid-run.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.blending import BlendState, blend_init


class TrainState(struct.PyTreeNode):
    step: jax.Array
    epoch: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    blend: BlendState
    rng: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    sample_input,
    seed: int = 42,
    num_blend_heads: int = 3,
) -> TrainState:
    """Initialize params/batch_stats from a sample input pytree."""
    rng = jax.random.key(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng}, sample_input, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        blend=blend_init(num_blend_heads),
        rng=state_rng,
        apply_fn=model.apply,
        tx=tx,
    )
