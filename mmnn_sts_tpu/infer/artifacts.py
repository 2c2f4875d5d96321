"""Prediction CSV artifacts (file-contract parity).

  * survival_model_predictions.csv: MRN, VS_pred, DM_pred, VS_event,
    DM_event, VS_duration, DM_duration (/root/reference/main.py:869-877).
  * model_probabilities.csv: uid + per-class probabilities + labels, no
    headers beyond the default index row (/root/reference/main.py:739-747).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def save_survival_predictions_csv(path, uids, preds, events, durations, cls_names=None):
    cls_names = cls_names or ["VS", "DM"][: preds.shape[1]]
    data = np.concatenate(
        [np.asarray(uids).reshape(-1, 1).astype(float), preds, events, durations],
        axis=1,
    )
    headers = (
        ["MRN"]
        + [c + "_pred" for c in cls_names]
        + [c + "_event" for c in cls_names]
        + [c + "_duration" for c in cls_names]
    )
    pd.DataFrame(data, columns=headers).to_csv(path, index=False)


def save_probabilities_csv(path, uids, probs, labels):
    data = np.concatenate(
        [np.asarray(uids).reshape(-1, 1).astype(int), probs, labels], axis=1
    )
    pd.DataFrame(data).to_csv(path, index=False)
