"""Stratified 70/15/15 cohort split via iterative multilabel stratification.

Replaces the reference's skmultilearn dependency
(/root/reference/data/utils.py:148-183 `_stratifiedSplit`): the split is
stratified on the STRATIFY_BY categorical columns (with the tumor-volume
cutoff feature added) plus the binary targets, done as a 70/30 split followed
by a 50/50 split of the holdout, and the resulting UID lists are written to
train/val/test txt files.

The stratifier is a from-scratch implementation of iterative stratification
(Sechidis, Tsoumakas & Vlahavas, "On the Stratification of Multi-Label Data",
ECML PKDD 2011 — the algorithm behind skmultilearn's
iterative_train_test_split). Categorical columns are expanded into one
binary label per (column, value) pair, then examples are assigned
label-by-label, rarest label first, to the fold furthest below its desired
count for that label. All tie-breaking is deterministic under the given seed
(the reference relied on the global numpy RNG and was not reproducible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import constants as C
from .tabular import add_cutoffs


def _binarize_labels(matrix: np.ndarray) -> np.ndarray:
    """Expand categorical label columns into one-hot indicator columns."""
    cols = []
    for j in range(matrix.shape[1]):
        col = matrix[:, j]
        for v in np.unique(col):
            cols.append((col == v).astype(np.int8))
    if not cols:
        return np.zeros((matrix.shape[0], 0), dtype=np.int8)
    return np.stack(cols, axis=1)


def iterative_stratified_split(
    labels: np.ndarray, test_fraction: float, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Two-fold iterative stratification.

    Args:
      labels: (N, L) 0/1 indicator matrix.
      test_fraction: desired fraction in the second fold.
    Returns (train_indices, test_indices) as sorted int arrays.
    """
    rng = np.random.default_rng(seed)
    n, n_labels = labels.shape
    fractions = np.array([1.0 - test_fraction, test_fraction])

    desired_total = fractions * n
    desired_per_label = fractions[None, :] * labels.sum(axis=0)[:, None]  # (L, 2)

    fold_of = np.full(n, -1, dtype=np.int64)
    remaining = np.ones(n, dtype=bool)

    while remaining.any():
        # Pick the label with the fewest remaining examples (but > 0).
        remaining_per_label = labels[remaining].sum(axis=0)
        candidates = np.where(remaining_per_label > 0)[0]
        if len(candidates) == 0:
            # No labels left: place leftover examples by total-count deficit.
            for i in np.where(remaining)[0]:
                deficit = desired_total - np.bincount(
                    fold_of[fold_of >= 0], minlength=2
                )
                order = np.argsort(-(deficit + rng.uniform(0, 1e-6, size=2)))
                fold_of[i] = order[0]
                remaining[i] = False
            break
        lbl = candidates[np.argmin(remaining_per_label[candidates])]

        examples = np.where(remaining & (labels[:, lbl] == 1))[0]
        # Deterministic shuffle so assignment order doesn't follow file order.
        examples = examples[rng.permutation(len(examples))]
        for i in examples:
            placed = np.bincount(fold_of[fold_of >= 0], minlength=2).astype(float)
            placed_lbl = np.array(
                [
                    labels[(fold_of == f), lbl].sum() if (fold_of == f).any() else 0
                    for f in range(2)
                ],
                dtype=float,
            )
            label_deficit = desired_per_label[lbl] - placed_lbl
            best = np.where(label_deficit == label_deficit.max())[0]
            if len(best) > 1:
                total_deficit = (desired_total - placed)[best]
                best = best[total_deficit == total_deficit.max()]
                if len(best) > 1:
                    best = best[[rng.integers(len(best))]]
            fold_of[i] = best[0]
            remaining[i] = False

    train_idx = np.sort(np.where(fold_of == 0)[0])
    test_idx = np.sort(np.where(fold_of == 1)[0])
    return train_idx, test_idx


def stratified_split(
    raw_frame: pd.DataFrame,
    uids,
    seed: int = 42,
    stratify_by=None,
    targets_binary=None,
    uid_col: str = C.UID,
    write_files: bool = True,
    output_dir: str = ".",
):
    """70/15/15 stratified split over the cohort.

    Parity with _stratifiedSplit (/root/reference/data/utils.py:148-183):
    stratifies on STRATIFY_BY (incl. VolumeCutoff, added here) + binary
    targets; restricts to the provided uids; splits 70/30 then 50/50; writes
    {train,val,test}_uids.txt.

    Returns (train_uids, val_uids, test_uids) as python int lists.
    """
    import os

    stratify_by = list(stratify_by or C.STRATIFY_BY)
    targets_binary = list(targets_binary or C.TARGETS_BINARY)

    uids = [int(u) for u in uids]
    frame = raw_frame.loc[raw_frame[uid_col].isin(uids)].copy()
    frame = add_cutoffs(frame)

    label_source = np.concatenate(
        [
            frame[stratify_by].to_numpy(dtype=float),
            frame[targets_binary].to_numpy(dtype=float),
        ],
        axis=1,
    )
    labels = _binarize_labels(label_source)
    uid_arr = frame[uid_col].to_numpy().astype(np.int64)

    train_i, holdout_i = iterative_stratified_split(labels, 0.3, seed)
    hold_labels = labels[holdout_i]
    val_rel, test_rel = iterative_stratified_split(hold_labels, 0.5, seed + 1)
    val_i, test_i = holdout_i[val_rel], holdout_i[test_rel]

    train_uids = [int(u) for u in uid_arr[train_i]]
    val_uids = [int(u) for u in uid_arr[val_i]]
    test_uids = [int(u) for u in uid_arr[test_i]]

    if write_files:
        for name, lst in [
            ("train_uids.txt", train_uids),
            ("val_uids.txt", val_uids),
            ("test_uids.txt", test_uids),
        ]:
            with open(os.path.join(output_dir, name), "w") as f:
                f.write("\n".join(str(u) for u in lst))

    return train_uids, val_uids, test_uids


def load_uids(path: str) -> list[int]:
    """One uid per line (parity: /root/reference/utils/utils.py:175-181)."""
    with open(path) as f:
        return [int(line.strip()) for line in f if line.strip()]
