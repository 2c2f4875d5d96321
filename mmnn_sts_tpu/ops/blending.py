"""Gradient blending (Wang et al., "What Makes Training Multi-modal
Classification Networks Hard?", arXiv:1905.12681) as pure JAX state + fns.

Re-designs the reference's stateful wrapper class
(/root/reference/losses/GradientBlender.py:9-257) into an immutable
`BlendState` pytree that lives inside the training state, so the whole
weighted-loss computation stays inside the jitted train step and the weight
update is a pure function of (state, epoch-level loss summaries).

Semantics preserved:
  * K = k+1 heads; head 0 is the multimodal output head
    (/root/reference/models/multimodal.py:69-77).
  * initial weights: softmax(ones) = uniform (GradientBlender.py:84-85).
  * update: O_N = Lv_N - Lt_N; O_{N+n} = Lv - Lt; dG; dO = O_{N+n} - O_N;
    w = softmax(dG / dO^2) (GradientBlender.py:89-96).
  * SIGN CONVENTION parity: the survival update uses dG = Lv_N - Lv
    (GradientBlender.py:91) while the classification update uses
    dG = Lv - Lv_N (GradientBlender.py:128). These are opposite; the survival
    convention is the paper's. We preserve each path's own convention since the
    published C-indices were produced with it.
  * per-head loss reduction: 'sum' over all non-head dims
    (GradientBlender.py:207-226).
  * weight history is recorded host-side by the train loop and written to
    gblend_weights_history.csv (GradientBlender.py:255-257).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .cox import multi_cox_loss
from .losses import bce_with_logits


@struct.dataclass
class BlendState:
    """Immutable gradient-blending state (a pytree; lives in TrainState)."""

    weights: jax.Array  # (K,) softmax-normalized head weights
    lvn: jax.Array  # (K,) validation loss at previous checkpoint
    ltn: jax.Array  # (K,) training loss at previous checkpoint
    has_history: jax.Array  # scalar bool — False until the first update


def blend_init(num_heads: int) -> BlendState:
    k = num_heads
    return BlendState(
        weights=jnp.full((k,), 1.0 / k, dtype=jnp.float32),
        lvn=jnp.zeros((k,), dtype=jnp.float32),
        ltn=jnp.zeros((k,), dtype=jnp.float32),
        has_history=jnp.asarray(False),
    )


def surv_head_losses(preds, events, durations, ties: str = "breslow",
                     mask=None) -> jax.Array:
    """Per-head summed multi-target Cox losses.

    Args:
      preds: (K, N, C) stacked head predictions.
      events, durations: (N, C).
      ties: "breslow" | "efron" (see ops/cox.py).
      mask: optional (N,) sample validity (ragged-tail parity, ops/cox.py).
    Returns: (K,) loss per head.
    """
    return jax.vmap(
        lambda p: multi_cox_loss(p, events, durations, ties=ties, mask=mask)
    )(preds)


def blended_surv_loss(state: BlendState, preds, events, durations,
                      ties: str = "breslow", mask=None):
    """Weighted survival loss across heads.

    Parity: GradientBlender.computeLossSurv (GradientBlender.py:181-205) —
    returns (sum(weights * head_losses), head_losses[0]); the second value is
    the unweighted multimodal-head loss used for best-model selection
    (/root/reference/main.py:572-577).
    """
    head_losses = surv_head_losses(preds, events, durations, ties, mask)
    total = jnp.sum(jax.lax.stop_gradient(state.weights) * head_losses)
    return total, head_losses[0]


def class_head_losses(preds, targets, pos_weight=None, mask=None) -> jax.Array:
    """Per-head summed BCE-with-logits losses. preds: (K, N, C)."""
    def one_head(p):
        return bce_with_logits(p, targets, pos_weight=pos_weight,
                               reduction="sum", mask=mask)

    return jax.vmap(one_head)(preds)


def blended_class_loss(state: BlendState, preds, targets, pos_weight=None,
                       mask=None):
    """Weighted classification loss across heads.

    Parity: GradientBlender.computeLossClassification
    (GradientBlender.py:150-179) with reduction='sum'.
    Returns (total, head_losses[0]).
    """
    head_losses = class_head_losses(preds, targets, pos_weight=pos_weight,
                                    mask=mask)
    total = jnp.sum(jax.lax.stop_gradient(state.weights) * head_losses)
    return total, head_losses[0]


def class_elementwise_losses(preds, targets, pos_weight=None) -> jax.Array:
    """(K, N, C) unreduced BCE losses — the validation 'no_reduce' path
    (/root/reference/main.py:260, GradientBlender.py:176-177)."""
    def one_head(p):
        return bce_with_logits(p, targets, pos_weight=pos_weight, reduction="none")

    return jax.vmap(one_head)(preds)


def blend_update(
    state: BlendState,
    train_loss: jax.Array,
    val_loss: jax.Array,
    survival: bool,
) -> BlendState:
    """Pure weight update from per-head epoch loss summaries.

    Args:
      train_loss, val_loss: (K,) reduced per-head losses at this checkpoint.
      survival: selects the dG sign convention (see module docstring).

    First call (no history) produces uniform weights
    (GradientBlender.py:84-85, 121-122).
    """
    k = state.weights.shape[0]

    o_n = state.lvn - state.ltn
    o_npn = val_loss - train_loss
    if survival:
        delta_g = state.lvn - val_loss  # GradientBlender.py:91
    else:
        delta_g = val_loss - state.lvn  # GradientBlender.py:128
    delta_o = o_npn - o_n
    gb_estimate = delta_g / jnp.square(delta_o)
    new_weights = jax.nn.softmax(gb_estimate)

    uniform = jnp.full((k,), 1.0 / k, dtype=jnp.float32)
    weights = jnp.where(state.has_history, new_weights, uniform)

    return BlendState(
        weights=weights.astype(jnp.float32),
        lvn=val_loss.astype(jnp.float32),
        ltn=train_loss.astype(jnp.float32),
        has_history=jnp.asarray(True),
    )
