"""Synthetic cohort fixtures: clinical CSV, patient key, T1/T2 NIfTI trees.

Mirrors the schemas the reference expects (clinical columns from
data/constants.py, patient-folder layout from ImageDatasets.py) so the full
pipeline can run hermetically.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from mmnn_sts_tpu import constants as C
from mmnn_sts_tpu.data.nifti import save_nifti

SEXES = ["M", "F"]
LOCATIONS = ["Thigh", "Pelvis", "Arm"]
DIAGNOSES = ["MFH", "Liposarcoma", "Synovial"]
CHEMO = ["Yes", "No"]


def make_clinical_csv(
    path: str, n: int = 24, seed: int = 0, signal: bool = False
) -> list[int]:
    """signal=True draws survival times from a hazard that actually depends
    on (TumorGrade, TumorVolume, Age), so a working training pipeline must
    reach above-chance C-index on held-out patients."""
    rng = np.random.default_rng(seed)
    uids = (1000 + np.arange(n)).tolist()
    surgery = pd.Timestamp("2015-01-01")
    if signal:
        grade = rng.integers(1, 4, n)
        volume = rng.uniform(10, 2000, n).round(1)
        age = rng.integers(20, 90, n)
        risk = (
            0.8 * (grade - 2)
            + 1.2 * (np.log(volume) - np.log(300))
            + 0.02 * (age - 55)
        )
        # exponential survival with hazard ~ exp(risk); censor at ~3000 days
        t_event = rng.exponential(scale=900 * np.exp(-risk))
        futime = np.minimum(t_event, rng.uniform(500, 3000, n)).astype(int) + 1
        vital = (t_event <= futime).astype(int)
        dm_event = rng.random(n) < (1 / (1 + np.exp(-risk)))
        met_days = np.maximum(
            (t_event * rng.uniform(0.3, 0.9, n)).astype(int), 10
        )
    else:
        grade = rng.integers(1, 4, n)
        volume = rng.uniform(10, 2000, n).round(1)
        age = rng.integers(20, 90, n)
        vital = rng.integers(0, 2, n)
        dm_event = rng.random(n) < 0.5
        futime = rng.integers(100, 3000, size=n)
        met_days = rng.integers(50, 2000, size=n)

    frame = pd.DataFrame(
        {
            C.UID: uids,
            "Sex": rng.choice(SEXES, n),
            "Age": age,
            "Location3": rng.choice(LOCATIONS, n),
            "Diagnosis": rng.choice(DIAGNOSES, n),
            "Chemo (Neoadjuvant)": rng.choice(CHEMO, n),
            "TumorSize": rng.uniform(1, 25, n).round(1),
            "TumorVolume (cm^3)": volume,
            "TumorDepth (1 = deep to fascia, 0 = superficial) ": rng.integers(0, 2, n),
            "TumorGrade": grade,
            "Metsatpresentation": rng.integers(0, 2, n),
            "RT Type (0 = preop, 1 = postop": rng.integers(0, 2, n),
            "Margin (negative==0, microscopically positive==1, grossly positive==2)":
                rng.integers(0, 3, n),
            C.NECROSIS_COLUMN: [
                f"{v}%" if keep else np.nan
                for v, keep in zip(
                    rng.integers(0, 100, n), rng.random(n) < 0.8
                )
            ],
            "LengthOR": rng.integers(60, 400, n),
            "VitalStatus": vital,
            "Distant metastasis": dm_event.astype(int),
            "FUtime": futime,
            "Date of Distant Mets": [
                (surgery + pd.Timedelta(days=int(d))).strftime("%Y-%m-%d")
                if e
                else np.nan
                for d, e in zip(met_days, dm_event)
            ],
            "Surgery_Date": surgery.strftime("%Y-%m-%d"),
        }
    )
    frame.to_csv(path, index=False)
    return uids


def make_patient_key(path: str, uids) -> list[str]:
    anon = [f"STS-{i:03d}" for i in range(len(uids))]
    pd.DataFrame({C.ANON_UID: anon, C.UID: uids}).to_csv(path, index=False)
    return anon


def make_image_tree(root: str, anon_ids, shape=(18, 20, 16), seed: int = 0):
    """One folder per patient with scan_*.nii.gz + mask .nii.gz."""
    rng = np.random.default_rng(seed)
    for anon in anon_ids:
        pdir = os.path.join(root, anon)
        os.makedirs(pdir, exist_ok=True)
        img = (rng.normal(size=shape) ** 2 * 500).astype(np.float32)
        mask = np.zeros(shape, dtype=np.float32)
        mask[2:-2, 3:-3, 2:-2] = 1.0
        save_nifti(os.path.join(pdir, f"scan_{anon}.nii.gz"), img)
        save_nifti(os.path.join(pdir, f"mask_{anon}.nii.gz"), mask)


def make_full_cohort(root: str, n: int = 24, seed: int = 0):
    """clinical.csv + key.csv + t1/ t2/ trees. Returns (paths dict, uids)."""
    os.makedirs(root, exist_ok=True)
    clin = os.path.join(root, "clinical.csv")
    key = os.path.join(root, "key.csv")
    uids = make_clinical_csv(clin, n, seed)
    anon = make_patient_key(key, uids)
    t1 = os.path.join(root, "t1")
    t2 = os.path.join(root, "t2")
    make_image_tree(t1, anon, seed=seed + 1)
    make_image_tree(t2, anon, seed=seed + 2)
    return {"clinical": clin, "key": key, "t1": t1, "t2": t2, "root": root}, uids
