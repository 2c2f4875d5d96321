"""Radiomics feature tables.

Parity: /root/reference/data/RadiomicsDatasets.py + data/utils.py:84-94 —
PyRadiomics CSV minus diagnostic columns as the predictor matrix; labels
(binary or survival) come from the clinical CSV joined on MRN. The reference
notes radiomics is "not implemented in this repo" end-to-end
(config.yaml:5); here it is a first-class tabular modality usable with the
MLP encoder.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .. import constants as C


@dataclass
class RadiomicsArrays:
    uids: np.ndarray  # (N,)
    features: np.ndarray  # (N, F) float32
    feature_names: list


def load_radiomics(radiomics_csv: str, exclude_columns=None, uid_col=C.UID):
    exclude = set(exclude_columns or C.RADIOMICS_EXCLUDE_COLUMNS)
    from ..utils.store import read_csv_any

    table = read_csv_any(radiomics_csv)
    table = table.drop(columns=[c for c in exclude if c in table.columns])
    label_cols = [c for c in C.RADIOMICS_LABEL_COLUMNS if c in table.columns]
    table = table.drop(columns=label_cols)
    uids = table[uid_col].to_numpy().astype(np.int64)
    feats = table.drop(columns=[uid_col])
    return RadiomicsArrays(
        uids=uids,
        features=feats.to_numpy(dtype=np.float32),
        feature_names=list(feats.columns),
    )
