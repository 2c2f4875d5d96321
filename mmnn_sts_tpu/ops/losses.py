"""Classification losses, pure JAX.

Parity targets:
  * BCE-with-logits with per-class pos_weight — the reference's training loss
    (torch.nn.BCEWithLogitsLoss, /root/reference/main.py:152-153) with
    reduction='sum' (train) and 'none' (validation / LossTracker).
  * focal binary cross-entropy (/root/reference/losses/losses.py:11-19,
    present but unused in the reference loops).
  * multilabel BCE on probabilities (/root/reference/losses/losses.py:21-33,
    also unused in the loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import NUM_CLASSES


def bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: jax.Array | None = None,
    reduction: str = "sum",
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically stable sigmoid BCE with optional positive-class weighting.

    Matches torch.nn.BCEWithLogitsLoss semantics:
      l = - [ pos_weight * y * log(sigmoid(x)) + (1 - y) * log(1 - sigmoid(x)) ]

    mask: optional (N,) per-sample validity — masked samples contribute zero
    (ragged-tail parity for wrap-padded static batches: the masked sum equals
    the reference's smaller last batch exactly).
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    # log(sigmoid(x)) = -softplus(-x); log(1 - sigmoid(x)) = -softplus(x)
    log_p = -jax.nn.softplus(-x)
    log_not_p = -jax.nn.softplus(x)
    if pos_weight is None:
        loss = -(y * log_p + (1.0 - y) * log_not_p)
    else:
        pw = jnp.asarray(pos_weight, dtype=jnp.float32)
        loss = -(pw * y * log_p + (1.0 - y) * log_not_p)
    if mask is not None:
        mf = mask.astype(jnp.float32).reshape(
            (loss.shape[0],) + (1,) * (loss.ndim - 1)
        )
        loss = loss * mf
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction in ("none", None):
        return loss
    raise ValueError(f"Unrecognized reduction: {reduction}")


def pos_weight_from_frequencies(class_freqs) -> jax.Array:
    """pos_weight = (1 - f) / f per class (/root/reference/main.py:147-149)."""
    f = jnp.asarray(class_freqs, dtype=jnp.float32)
    return (jnp.ones_like(f) - f) / f


def focal_binary_cross_entropy(
    logits: jax.Array, targets: jax.Array, gamma: float = 2.0
) -> jax.Array:
    """Focal BCE operating on probabilities, reference-formula parity
    (/root/reference/losses/losses.py:11-19: inputs are treated as
    probabilities despite the name `logits`)."""
    p = logits.reshape(-1).astype(jnp.float32)
    t = targets.reshape(-1).astype(jnp.float32)
    p = jnp.where(t >= 0.5, p, 1.0 - p)
    logp = -jnp.log(jnp.clip(p, 1e-4, 1.0 - 1e-4))
    loss = logp * (1.0 - p) ** gamma
    return NUM_CLASSES * jnp.mean(loss)


def multilabel_bce(
    probs: jax.Array, targets: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """BCE on probabilities (/root/reference/losses/losses.py:21-33)."""
    p = targets.astype(jnp.float32)
    q = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    loss = -(p * jnp.log(q) + (1.0 - p) * jnp.log(1.0 - q))
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
