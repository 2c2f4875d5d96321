"""Cox proportional-hazards partial likelihood, pure JAX.

Replaces the reference's pycox dependency (/root/reference/losses/losses.py:6-9).
Semantics follow the standard Breslow-free (no-tie-correction) batch Cox partial
likelihood used by pycox.models.loss.CoxPHLoss:

    loss = - sum_{i: event_i=1} [ log_h_i - log( sum_{j: T_j >= T_i} exp(log_h_j) ) ]
           / (number of events)

computed by sorting the batch by duration descending and taking a running
logcumsumexp, so the risk set of patient i is the prefix of patients with
duration >= T_i. Patients with tied durations all share the full tied risk set
(pycox's behavior: the cumulative sum runs in sorted order, so within a tie
group the risk set depends on sort order; we use a stable sort on descending
duration, matching pycox's torch.sort(descending=True) up to tie order —
differences only arise for tied durations and are O(eps) in practice).

NOTE (intent vs. reference): the reference wrapper passes arguments in the
order (log_h, events, durations) into pycox's CoxPHLoss.forward(log_h,
durations, events) (/root/reference/losses/losses.py:6-9 vs pycox signature),
silently swapping events and durations. We implement the evident intent — the
mathematically correct partial likelihood — and document the deviation here.

All fns are jit-/vmap-/grad-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cox_ph_loss(
    log_h: jax.Array,
    events: jax.Array,
    durations: jax.Array,
    eps: float = 1e-7,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Negative Cox partial log-likelihood for one target column.

    Args:
      log_h: (N,) predicted log hazard ratios.
      events: (N,) 0/1 event indicators (1 = event observed / uncensored).
      durations: (N,) follow-up durations.
      eps: numerical floor inside the log-cumsum-exp.
      mask: optional (N,) 0/1 validity — masked samples are EXCLUDED from
        both risk sets and event terms, so the loss equals the loss of the
        valid subset exactly (ragged-tail parity for wrap-padded static
        batches; masked hazards contribute w=0 to the cumulative sum, which
        leaves every valid prefix's partial sums bitwise unchanged).

    Returns: scalar loss. If the batch contains no events the loss is 0
    (the reference would divide by zero; a zero loss keeps gradients finite
    and is the standard guard).
    """
    log_h = log_h.reshape(-1).astype(jnp.float32)
    events = events.reshape(-1).astype(jnp.float32)
    durations = durations.reshape(-1)

    # Sort by duration descending (stable), so prefix i contains exactly the
    # risk set {j : T_j >= T_i} (up to tie ordering).
    order = jnp.argsort(-durations, stable=True)
    log_h = log_h[order]
    events = events[order]

    if mask is None:
        gamma = jax.lax.stop_gradient(jnp.max(log_h))
        w = jnp.exp(log_h - gamma)
    else:
        m = mask.reshape(-1).astype(jnp.float32)[order]
        events = events * m
        gamma = jnp.max(jnp.where(m > 0, log_h, -jnp.inf))
        gamma = jax.lax.stop_gradient(jnp.where(jnp.isfinite(gamma), gamma, 0.0))
        # clamp masked entries to gamma BEFORE exp so neither where-branch
        # can produce inf (the where-NaN gradient trap); reuse the clamped
        # values for the event terms too, so a non-finite masked log_h
        # (e.g. an overflowed fully-masked microbatch) can't inject
        # inf * 0 = NaN into pll
        log_h = jnp.where(m > 0, log_h, gamma)
        w = jnp.where(m > 0, jnp.exp(log_h - gamma), 0.0)
    log_cumsum_h = jnp.log(jnp.cumsum(w) + eps) + gamma

    n_events = jnp.sum(events)
    pll = jnp.sum((log_h - log_cumsum_h) * events)
    return -pll / jnp.maximum(n_events, 1.0)


def cox_ph_loss_efron(
    log_h: jax.Array,
    events: jax.Array,
    durations: jax.Array,
    eps: float = 1e-7,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Cox partial likelihood with Efron's tie correction (beyond-reference
    capability; the reference/pycox formulation above ignores ties).

    For a group of d tied event times with risk-set hazard sum S_R and
    tied-event hazard sum S_D, each tied event l = 0..d-1 contributes
    denominator log(S_R - (l/d) * S_D):

        pll = sum_events [ log_h_i - log(S_R(t_i) - (l_i/d_i) S_D(t_i)) ]

    Static-shape implementation: sort by duration descending; contiguous
    equal-duration groups are reduced with cumulative sums + group-boundary
    gathers (no dynamic shapes, jit/vmap/grad-safe).
    """
    log_h = log_h.reshape(-1).astype(jnp.float32)
    events = events.reshape(-1).astype(jnp.float32)
    durations = durations.reshape(-1)
    n = log_h.shape[0]

    order = jnp.argsort(-durations, stable=True)
    lh = log_h[order]
    ev = events[order]
    dur = durations[order]

    if mask is None:
        gamma = jax.lax.stop_gradient(jnp.max(lh))
        w = jnp.exp(lh - gamma)  # scaled hazards
    else:
        # masked samples: zero hazard + zero event => excluded from risk
        # sets, tied-group sums and event counts (see cox_ph_loss)
        m = mask.reshape(-1).astype(jnp.float32)[order]
        ev = ev * m
        gamma = jnp.max(jnp.where(m > 0, lh, -jnp.inf))
        gamma = jax.lax.stop_gradient(jnp.where(jnp.isfinite(gamma), gamma, 0.0))
        # clamp masked entries for the event terms too (see cox_ph_loss)
        lh = jnp.where(m > 0, lh, gamma)
        w = jnp.where(m > 0, jnp.exp(lh - gamma), 0.0)

    idx = jnp.arange(n)
    # group starts where the (descending) duration changes
    is_start = jnp.concatenate([jnp.ones((1,), bool), dur[1:] != dur[:-1]])
    # index of each element's group start: running max of start positions
    start_idx = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    # index of each element's group END: next group's start - 1
    is_end = jnp.concatenate([dur[1:] != dur[:-1], jnp.ones((1,), bool)])
    rev_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_end, idx, n - 1), reverse=True
    )

    cum_w = jnp.cumsum(w)
    cum_we = jnp.cumsum(w * ev)
    cum_ev = jnp.cumsum(ev)

    # risk-set sum for a group: cumulative hazard up to the group END
    # (everything with duration >= t, ties included)
    s_r = cum_w[rev_end]
    # tied-event hazard sum within the group
    start_off_we = jnp.where(start_idx > 0, cum_we[start_idx - 1], 0.0)
    s_d = cum_we[rev_end] - start_off_we
    # event count within the group and each event's rank l_i among them
    start_off_ev = jnp.where(start_idx > 0, cum_ev[start_idx - 1], 0.0)
    d_group = cum_ev[rev_end] - start_off_ev
    l_i = cum_ev - start_off_ev - 1.0  # rank of THIS event (0-based)

    frac = jnp.where(d_group > 0, l_i / jnp.maximum(d_group, 1.0), 0.0)
    denom = jnp.log(jnp.maximum(s_r - frac * s_d, eps)) + gamma
    pll = jnp.sum((lh - denom) * ev)
    n_events = jnp.sum(ev)
    return -pll / jnp.maximum(n_events, 1.0)


def multi_cox_loss(
    log_h: jax.Array,
    events: jax.Array,
    durations: jax.Array,
    eps: float = 1e-7,
    ties: str = "breslow",
    mask: jax.Array | None = None,
) -> jax.Array:
    """Sum of independent Cox losses over C target columns.

    Parity: the reference's `surv_criterion` loops over `preds.shape[1]` and
    sums one CoxPH loss per class (/root/reference/utils/utils.py:24-29).

    ties: "breslow" (reference/pycox formulation) or "efron" (tie-corrected,
    beyond-reference; select via Hyperparameters.cox_ties).

    Args:
      log_h: (N, C) log hazard predictions.
      events: (N, C) event indicators.
      durations: (N, C) durations.
      mask: optional (N,) per-sample validity, shared across columns
        (ragged-tail parity; see cox_ph_loss).
    """
    fn = cox_ph_loss_efron if ties == "efron" else cox_ph_loss
    per_class = jax.vmap(fn, in_axes=(1, 1, 1, None, None))(
        log_h, events, durations, eps, mask
    )
    return jnp.sum(per_class)
