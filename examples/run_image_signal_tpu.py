"""Flagship-encoder learnability on TPU hardware (VERDICT r2 item 6).

Generates a synthetic cohort whose survival signal lives ONLY in the
images — lesion radius drives the hazard (the test_learnability_image.py
recipe scaled to 64^3), clinical predictors are pure noise — then trains
the production configuration (DenseNet121-3D + clinical MLP, gradient
blending, super-batch 64, full augmentation) through the real CLI and
evaluates held-out C-index. Above-chance test C-index is attributable to
the image branch alone. Ref: the published unimodal DenseNet row,
/root/reference/README.md:50.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python examples/run_image_signal_tpu.py
Artifacts land in examples/tpu_image_signal_run/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

S = 64
N = 48


def sphere(center, radius, shape=(S, S, S)):
    zz, yy, xx = np.meshgrid(*(np.arange(s) for s in shape), indexing="ij")
    d2 = ((zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2)
    return (d2 <= radius**2).astype(np.float32)


def make_cohort(root: str, seed: int = 5):
    import pandas as pd

    from fixtures import make_clinical_csv, make_patient_key
    from mmnn_sts_tpu.data.nifti import save_nifti

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    clin = os.path.join(root, "clinical.csv")
    key = os.path.join(root, "key.csv")
    uids = make_clinical_csv(clin, N, seed, signal=False)  # clinical = noise
    anon = make_patient_key(key, uids)

    radii = rng.uniform(4.0, 14.0, size=N)
    for t, tree_seed in (("t1", 1), ("t2", 2)):
        tree_rng = np.random.default_rng(seed + tree_seed)
        for i, a in enumerate(anon):
            pdir = os.path.join(root, t, a)
            os.makedirs(pdir, exist_ok=True)
            c = tree_rng.uniform(18, S - 18, size=3)
            vol = np.abs(tree_rng.normal(0, 30, size=(S, S, S))).astype(
                np.float32
            )
            vol += sphere(c, radii[i]) * (800.0 + tree_rng.normal(0, 40))
            save_nifti(os.path.join(pdir, f"scan_{a}.nii.gz"), vol)
            save_nifti(
                os.path.join(pdir, f"mask_{a}.nii.gz"),
                np.ones((S, S, S), np.float32),
            )

    # survival targets from the IMAGE signal only: bigger lesion -> shorter
    # survival, all events observed (clean learnability target)
    durations = (
        30000.0 * radii**-2.0 * rng.lognormal(0.0, 0.10, size=N)
    ).astype(int) + 1
    frame = pd.read_csv(clin)
    frame["VitalStatus"] = 1
    frame["FUtime"] = durations
    frame["Distant metastasis"] = 1
    surgery = pd.Timestamp("2015-01-01")
    frame["Date of Distant Mets"] = [
        (surgery + pd.Timedelta(days=int(d))).strftime("%Y-%m-%d")
        for d in durations
    ]
    frame.to_csv(clin, index=False)
    return radii


CONFIG = """\
Data:
  data_loc: '{root}/clinical.csv'
  image_loc: '{root}'
  key_loc: '{root}/key.csv'
  t1_path: 't1'
  t2_path: 't2'
ImageModel:
  name: 'densenet121'
  modality: 't1t2'
  feature_layers: 12
  num_classes: 2
  spatial_dims: 3
  in_channels: 2
  dropout_prob: 0.2
  spatial_size: [64, 64, 64]
Preprocessing:
  train_uid_location: '{root}/train_uids.txt'
  val_uid_location: '{root}/val_uids.txt'
  test_uid_location: '{root}/test_uids.txt'
Hyperparameters:
  epochs: {epochs}
  learning_rate: 0.0005
  train_batch_size: 8
  test_batch_size: 8
  seed: 42
TPU:
  compute_dtype: 'bfloat16'
"""


def main():
    root = os.environ.get("IMGSIG_ROOT", "/tmp/imgsig")
    out = os.path.join(root, "out")
    epochs = int(os.environ.get("IMGSIG_EPOCHS", "30"))
    print("generating cohort...", flush=True)
    make_cohort(root)
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(root=root, epochs=epochs))

    os.chdir(root)  # --split writes {train,val,test}_uids.txt to cwd
    from mmnn_sts_tpu.cli import main as cli_main

    rc = cli_main([
        "--images", "--preop", "--survival", "--blend", "--split",
        "--config", cfg_path, "--output_path", out,
        "--epochs", str(epochs),
    ])
    print("TRAIN_RC", rc, flush=True)
    rc = cli_main([
        "--images", "--preop", "--survival", "--blend", "--inference",
        "--config", cfg_path, "--output_path", out,
    ])
    print("INFER_RC", rc, flush=True)

    # summarize. Direction convention: the logged val_c is the reference's
    # metric verbatim (lifelines concordance on raw log-hazard preds,
    # /root/reference/main.py:122) under which a correctly trained Cox risk
    # model scores BELOW 0.5; the risk-direction concordance is 1 - val_c
    # (exact here: all events observed, no ties). See
    # examples/tpu_image_signal_run/README.md.
    lines = [json.loads(ln) for ln in open(os.path.join(out, "metrics.jsonl"))]
    epochs_log = [l for l in lines if l.get("kind") == "survival_epoch"]
    final_val_c = epochs_log[-1]["val_c"]
    print(json.dumps({
        "final_val_c_reference_convention": final_val_c,
        "final_val_risk_concordance": 1.0 - final_val_c,
        "best_val_risk_concordance": max(1.0 - l["val_c"] for l in epochs_log),
        "epoch_seconds_median": float(np.median(
            [l["epoch_seconds"] for l in epochs_log[2:]]
        )),
    }), flush=True)

    dest = os.path.join(REPO, "examples", "tpu_image_signal_run")
    os.makedirs(dest, exist_ok=True)
    for name in ("metrics.jsonl", "train_val_loss.png",
                 "train_val_c_score.png", "gblend_weights_history.csv",
                 "survival_model_predictions.csv"):
        src = os.path.join(out, name)
        if os.path.exists(src):
            shutil.copy(src, dest)
    shutil.copy(cfg_path, dest)
    print("artifacts copied to", dest, flush=True)


if __name__ == "__main__":
    main()
