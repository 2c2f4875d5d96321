"""Full-split evaluation with optional fixed-size chunking.

The reference evaluates with small-batch DataLoaders (batch 4 validation,
/root/reference/main.py:393; batch 1 inference, main.py:782) and SUMS the
per-batch losses. Round 1 of this framework instead forwarded the whole
split as one XLA program — fine at ~10^2 patients, but it blows HBM for the
streaming cohorts the host pipeline (data/streaming.py) was built for.

This module restores the chunked contract TPU-style: the split is forwarded
in fixed-size chunks (one compiled program for the main chunk shape plus at
most one for the ragged tail), per-chunk losses are summed (exactly the
reference's sum-over-batches semantics for both the Cox loss and the
selection loss), and predictions are concatenated on host.

Chunking policy (resolve_chunk): an explicit size wins; otherwise
device-resident splits stay single-program (fastest at cohort scale) and
host-resident splits default to chunks of DEFAULT_EVAL_CHUNK samples.
"""

from __future__ import annotations

import jax
import numpy as np

from .steps import classification_eval_step, survival_eval_step

DEFAULT_EVAL_CHUNK = 64


def resolve_chunk(ds, chunk: int = 0) -> int:
    """Effective chunk size for a split: 0 means whole-split-at-once."""
    if chunk:
        return int(chunk)
    from ..data.streaming import HostDataset

    if isinstance(ds, HostDataset):
        return DEFAULT_EVAL_CHUNK
    return 0


def _chunk_slices(n: int, chunk: int):
    for start in range(0, n, chunk):
        yield slice(start, min(start + chunk, n))


def survival_eval_split(state, ds, blend: bool, ties: str, chunk: int = 0):
    """Forward a whole split; returns host-side preds + summed losses.

    Returns {"preds": ([K,] N, C) np.ndarray, "loss": float,
    "selection_loss": float}. loss/selection_loss are sums over samples (the
    caller divides by N, matching /root/reference/main.py:549-556).
    """
    chunk = resolve_chunk(ds, chunk)
    n = ds.num_samples
    if not chunk or chunk >= n:
        out = survival_eval_step(
            state, ds.model_inputs(), ds.events, ds.durations,
            blend=blend, ties=ties,
        )
        # one readback for all three outputs: every host transfer is a full
        # dispatch-tunnel round-trip (docs/PERF.md)
        preds, loss, sel = jax.device_get(
            (out["preds"], out["loss"], out["selection_loss"])
        )
        return {
            "preds": np.asarray(preds),
            "loss": float(loss),
            "selection_loss": float(sel),
        }

    preds, loss, sel = [], 0.0, 0.0
    for sl in _chunk_slices(n, chunk):
        out = survival_eval_step(
            state,
            ds.model_inputs(sl),
            ds.events[sl],
            ds.durations[sl],
            blend=blend,
            ties=ties,
        )
        preds.append(np.asarray(out["preds"]))
        loss += float(out["loss"])
        sel += float(out["selection_loss"])
    return {
        "preds": np.concatenate(preds, axis=1 if blend else 0),
        "loss": loss,
        "selection_loss": sel,
    }


def classification_eval_split(state, ds, pos_weight, blend: bool,
                              chunk: int = 0):
    """Forward a whole classification split in chunks.

    Returns {"preds": ([K,] N, C), "elementwise": (N, C), "loss": float}.
    """
    chunk = resolve_chunk(ds, chunk)
    n = ds.num_samples
    if not chunk or chunk >= n:
        out = classification_eval_step(
            state, ds.model_inputs(), ds.labels, pos_weight, blend=blend
        )
        preds, elementwise, loss = jax.device_get(
            (out["preds"], out["elementwise"], out["loss"])
        )
        return {
            "preds": np.asarray(preds),
            "elementwise": np.asarray(elementwise),
            "loss": float(loss),
        }

    preds, elementwise, loss = [], [], 0.0
    for sl in _chunk_slices(n, chunk):
        out = classification_eval_step(
            state, ds.model_inputs(sl), ds.labels[sl], pos_weight, blend=blend
        )
        preds.append(np.asarray(out["preds"]))
        elementwise.append(np.asarray(out["elementwise"]))
        loss += float(out["loss"])
    return {
        "preds": np.concatenate(preds, axis=1 if blend else 0),
        "elementwise": np.concatenate(elementwise, axis=0),
        "loss": loss,
    }
