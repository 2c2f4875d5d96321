"""Evaluation metrics: Harrell concordance index and per-class F1.

The C-index reimplements the exact pair-admissibility semantics of
`lifelines.utils.concordance_index` (used by the reference at
/root/reference/main.py:106-123), since lifelines is not a dependency here:

  * pair (i dies at t_i, j dies at t_j), t_i < t_j  -> admissible;
    concordant iff pred_i < pred_j; tied predictions count 1/2.
  * pair (i dies at t_i, j dies at t_i)             -> NOT admissible.
  * pair (i dies at t_i, j censored at t_j >= t_i)  -> admissible (including
    t_j == t_i); concordant iff pred_i < pred_j; ties 1/2.
  * pair (i dies at t_i, j censored at t_j <  t_i)  -> not admissible.
  * censored/censored                               -> not admissible.

  C = (concordant + 0.5 * tied) / admissible

Raises ZeroDivisionError when no admissible pairs exist, exactly like
lifelines — the reference's bootstrap loop relies on catching that
(/root/reference/main.py:856-860).

Two implementations are provided:
  * `concordance_index` — exact, vectorized numpy, O(N^2) memory (cohorts here
    are ~10^2 patients, so this is microseconds).
  * `concordance_index_jax` — the same O(N^2) math in pure jnp with a weight
    mask, usable under jit/vmap for on-device bootstrap CI evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pair_stats(durations, preds, events):
    t = np.asarray(durations, dtype=np.float64).reshape(-1)
    p = np.asarray(preds, dtype=np.float64).reshape(-1)
    e = np.asarray(events).reshape(-1).astype(bool)

    ti = t[:, None]
    tj = t[None, :]
    # i is the index of the earlier *death* in each ordered pair (i, j).
    admissible = e[:, None] & ((ti < tj) | ((ti == tj) & ~e[None, :]))
    np.fill_diagonal(admissible, False)

    pi = p[:, None]
    pj = p[None, :]
    concordant = admissible & (pi < pj)
    tied = admissible & (pi == pj)

    return concordant.sum(), tied.sum(), admissible.sum()


def concordance_index(durations, preds, events) -> float:
    """Harrell C-index, lifelines-equivalent (see module docstring).

    Argument order matches lifelines.concordance_index(event_times,
    predicted_scores, event_observed).
    """
    concordant, tied, admissible = _pair_stats(durations, preds, events)
    if admissible == 0:
        raise ZeroDivisionError("No admissible pairs in the dataset.")
    return float((concordant + 0.5 * tied) / admissible)


def concordance_index_jax(durations, preds, events, mask=None):
    """C-index in pure jnp for on-device (jit/vmap) evaluation.

    Args:
      durations, preds, events: (N,) arrays.
      mask: optional (N,) 0/1 sample weights (e.g. to vmap bootstrap resamples
        of differing multiplicity via per-sample counts).

    Returns (c_index, admissible_count). When no admissible pairs exist the
    c_index is NaN (callers mirror lifelines' ZeroDivisionError by checking
    admissible_count == 0 on host).
    """
    t = durations.reshape(-1).astype(jnp.float32)
    p = preds.reshape(-1).astype(jnp.float32)
    e = events.reshape(-1).astype(jnp.float32)
    n = t.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=jnp.float32)
    w = mask.reshape(-1).astype(jnp.float32)

    ti, tj = t[:, None], t[None, :]
    ei, ej = e[:, None], e[None, :]
    pi, pj = p[:, None], p[None, :]
    pair_w = w[:, None] * w[None, :]
    off_diag = 1.0 - jnp.eye(n, dtype=jnp.float32)

    admissible = ei * ((ti < tj) + (ti == tj) * (1.0 - ej)) * off_diag * pair_w
    concordant = admissible * (pi < pj)
    tied = admissible * (pi == pj)

    n_adm = jnp.sum(admissible)
    c = (jnp.sum(concordant) + 0.5 * jnp.sum(tied)) / jnp.maximum(n_adm, 1.0)
    c = jnp.where(n_adm > 0, c, jnp.nan)
    return c, n_adm


def c_indices_per_class(preds, events, durations):
    """Per-target C-indices (host, exact).

    Parity: /root/reference/main.py:106-123 `getCIndices` — note its argument
    order into lifelines is (durations, preds, events).

    Args: (N, C) arrays. Returns list of C floats.
    """
    preds = np.asarray(preds)
    events = np.asarray(events)
    durations = np.asarray(durations)
    return [
        concordance_index(durations[:, i], preds[:, i], events[:, i])
        for i in range(preds.shape[1])
    ]


def f1_scores(tps, fps, fns, num_classes: int | None = None):
    """Per-class F1 from tp/fp/fn accumulators.

    Parity: /root/reference/main.py:98-104 `getF1Score` (including its
    divide-by-zero NaN behavior when a class has no positives at all).
    """
    if num_classes is None:
        num_classes = len(np.asarray(tps))
    tps = np.asarray(tps, dtype=np.float64)
    fps = np.asarray(fps, dtype=np.float64)
    fns = np.asarray(fns, dtype=np.float64)
    out = []
    for idx in range(num_classes):
        denom = tps[idx] + 0.5 * (fns[idx] + fps[idx])
        with np.errstate(invalid="ignore", divide="ignore"):
            out.append(float(tps[idx] / denom))
    return out


def confusion_counts(pred_labels, true_labels):
    """(tp, fp, fn) column sums for multilabel binary predictions, on device.

    Args: (N, C) 0/1 arrays. Returns three (C,) int32 arrays.
    """
    pred_labels = pred_labels.astype(jnp.int32)
    true_labels = true_labels.astype(jnp.int32)
    tp = jnp.sum((pred_labels == 1) & (true_labels == 1), axis=0)
    fp = jnp.sum((pred_labels == 1) & (true_labels == 0), axis=0)
    fn = jnp.sum((pred_labels == 0) & (true_labels == 1), axis=0)
    return tp, fp, fn
