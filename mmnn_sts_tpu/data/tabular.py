"""Clinical CSV loading, cleaning and target assembly.

Behavioral parity with /root/reference/data/utils.py:39-146:
  * restrict columns to predictors + binary targets + time targets + UID;
  * parse the two date columns and convert event dates to days-since-surgery
    ('Time_MET' = Date-of-mets minus Surgery_Date, utils.py:56-66);
  * index-encode string categoricals in first-appearance order
    (convert_to_index, utils.py:39-46);
  * strip '%' from the Necrosis column with NaN round-trip (utils.py:73-75);
  * survival targets: for each (event_col, time_col) pair, missing times are
    filled from FUtime, events cast to bool, durations to int
    (getSurvTargetData, utils.py:96-122).

Output here is columnar numpy (not per-row lazy Datasets): the whole cohort is
cleaned eagerly into fixed (N, F) float32 predictor matrices plus (N, C) event
and duration matrices, ready to be placed on device once.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .. import constants as C


def convert_to_index(df: pd.DataFrame, header: str) -> pd.DataFrame:
    """String categorical -> integer codes in order of first appearance."""
    unique_values = list(df[header].unique())
    mapping = {v: i for i, v in enumerate(unique_values)}
    df[header] = df[header].map(mapping)
    return df


def load_clinical(
    filename: str,
    pre_op=None,
    post_op=None,
    targets_binary=None,
    targets_time=None,
    headers_to_convert=None,
    uid_col: str = C.UID,
) -> pd.DataFrame:
    """Load + clean the clinical CSV into an all-float dataframe."""
    pre_op = list(pre_op or C.PRE_OP_PREDICTORS)
    post_op = list(post_op or C.POST_OP_PREDICTORS)
    targets_binary = list(targets_binary or C.TARGETS_BINARY)
    targets_time = list(targets_time or C.TARGETS_TIME)
    headers_to_convert = list(headers_to_convert or C.HEADERS_TO_CONVERT)

    usecols = pre_op + post_op + targets_binary + targets_time + [uid_col]
    # read_csv_any: transparent s3:// support (readCSVS3 parity,
    # /root/reference/data/s3utils.py:12-23)
    from ..utils.store import read_csv_any

    data = read_csv_any(filename, usecols=lambda c: c in set(usecols))

    # Event-date columns -> days since surgery; FUtime is already numeric.
    date_cols = targets_time[1:]
    for col in date_cols:
        data[col] = pd.to_datetime(data[col])
    time_met = data[date_cols[0]] - data[date_cols[-1]]
    data = data.drop(columns=date_cols)
    data["Time_MET"] = time_met.dt.days

    for header in headers_to_convert:
        data = convert_to_index(data, header)

    if C.NECROSIS_COLUMN in data.columns:
        col = data[C.NECROSIS_COLUMN]
        col = col.where(col.notna(), "-1%")
        col = col.astype(str).str.slice(0, -1)
        col = col.replace("-1", np.nan)
        data[C.NECROSIS_COLUMN] = col

    return data.astype(float)


@dataclass
class ClinicalArrays:
    """Cohort-level numpy views used to build on-device batches."""

    uids: np.ndarray  # (N,) int64
    predictors: np.ndarray  # (N, F) float32
    binary_targets: np.ndarray  # (N, C) float32
    events: np.ndarray  # (N, C) float32 (0/1)
    durations: np.ndarray  # (N, C) float32 (integer-valued days)
    predictor_names: list[str]
    raw: pd.DataFrame  # cleaned frame, kept for stratification features


def _surv_targets(data: pd.DataFrame, header_pairs) -> tuple[np.ndarray, np.ndarray]:
    events, durations = [], []
    for event_col, time_col in header_pairs:
        t = data[time_col].fillna(data["FUtime"]) if time_col != "FUtime" else data[
            time_col
        ]
        events.append(data[event_col].astype(bool).to_numpy())
        durations.append(t.astype(int).to_numpy())
    return (
        np.stack(events, axis=1).astype(np.float32),
        np.stack(durations, axis=1).astype(np.float32),
    )


def load_clinical_arrays(
    filename: str,
    preop: bool = True,
    postop: bool = False,
    clinical_cfg=None,
    header_pairs=None,
    uid_col: str = C.UID,
) -> ClinicalArrays:
    """Eagerly build the cohort's predictor/target arrays.

    preop selects PRE_OP_PREDICTORS; postop selects POST_OP_PREDICTORS only
    (matching the reference's getPostopBinary/getPostopSurvival,
    /root/reference/data/utils.py:130-146).
    """
    if clinical_cfg is not None:
        pre_op = clinical_cfg.pre_op_predictors
        post_op = clinical_cfg.post_op_predictors
        targets_binary = clinical_cfg.targets_binary
        targets_time = clinical_cfg.targets_time
        headers = clinical_cfg.headers_to_convert
    else:
        pre_op, post_op = C.PRE_OP_PREDICTORS, C.POST_OP_PREDICTORS
        targets_binary, targets_time = C.TARGETS_BINARY, C.TARGETS_TIME
        headers = C.HEADERS_TO_CONVERT
    header_pairs = header_pairs or C.HEADER_PAIRS

    data = load_clinical(
        filename, pre_op, post_op, targets_binary, targets_time, headers, uid_col
    )
    predictor_names = list(post_op if (postop and not preop) else pre_op)
    if preop and postop:
        predictor_names = list(pre_op) + list(post_op)

    events, durations = _surv_targets(data, header_pairs)
    return ClinicalArrays(
        uids=data[uid_col].to_numpy().astype(np.int64),
        predictors=data[predictor_names].to_numpy(dtype=np.float32),
        binary_targets=data[list(targets_binary)].to_numpy(dtype=np.float32),
        events=events,
        durations=durations,
        predictor_names=predictor_names,
        raw=data,
    )


def add_cutoffs(data: pd.DataFrame) -> pd.DataFrame:
    """Tumor-volume cutoff stratification feature
    (parity: /root/reference/data/utils.py:185-191)."""
    vol = data[C.TUMOR_VOLUME_COLUMN]
    cutoff = np.zeros(len(data), dtype=np.int64)
    cutoff[vol >= 500] = 1
    cutoff[vol > 1000] = 2
    data = data.copy()
    data["VolumeCutoff"] = cutoff
    return data


def class_frequencies(binary_targets: np.ndarray) -> np.ndarray:
    """Positive-class frequency per target column (defines BCE pos_weight;
    the reference's CLASS_FREQUENCIES constant was never defined — see
    constants.py)."""
    return binary_targets.mean(axis=0)
