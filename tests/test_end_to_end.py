"""End-to-end CLI smoke tests on the synthetic cohort (clinical path; the
image path's heavy conv compiles are covered by test_models/test_steps and
the driver's dryrun)."""

import json
import os

import numpy as np
import pytest

from fixtures import make_full_cohort


@pytest.fixture(scope="module")
def cohort_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    paths, uids = make_full_cohort(str(root), n=24)
    cfg_path = os.path.join(str(root), "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            f"""
Data:
  data_loc: '{paths["clinical"]}'
  image_loc: '{paths["root"]}'
  key_loc: '{paths["key"]}'
  t1_path: 't1'
  t2_path: 't2'
ImageModel:
  name: 'tinydensenet'
  modality: 't1t2'
  feature_layers: 12
  num_classes: 2
  spatial_dims: 3
  in_channels: 2
  dropout_prob: 0.2
Preprocessing:
  train_uid_location: '{root}/train_uids.txt'
  val_uid_location: '{root}/val_uids.txt'
  test_uid_location: '{root}/test_uids.txt'
Hyperparameters:
  epochs: 2
  learning_rate: 0.0005
  train_batch_size: 4
  test_batch_size: 4
  seed: 42
"""
        )
    # write split files up front so tests are order-independent
    from mmnn_sts_tpu.data.split import stratified_split
    from mmnn_sts_tpu.data.tabular import load_clinical_arrays

    arrays = load_clinical_arrays(paths["clinical"])
    stratified_split(arrays.raw, uids, seed=42, output_dir=str(root))
    return {"root": str(root), "config": cfg_path, "paths": paths, "uids": uids}


def _run_cli(args, workdir):
    from mmnn_sts_tpu.cli import main

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        return main(args)
    finally:
        os.chdir(cwd)


def test_cli_classification_preop(cohort_cfg, tmp_path):
    rc = _run_cli(
        [
            "--classification",
            "--preop",
            "--split",
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
            "--epochs",
            "2",
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    assert (tmp_path / "train_val_loss.png").exists()
    assert (tmp_path / "train_val_f1.png").exists()
    assert (tmp_path / "val_loss_by_cm.png").exists()
    assert (tmp_path / "model.npz").exists()
    # uid split files were written by --split
    assert os.path.exists(os.path.join(cohort_cfg["root"], "train_uids.txt"))
    # metrics jsonl has epoch records
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    recs = [json.loads(x) for x in lines]
    assert any(r["kind"] == "classification_epoch" for r in recs)


def test_cli_survival_preop(cohort_cfg, tmp_path):
    rc = _run_cli(
        [
            "--survival",
            "--preop",
            "--train_uid_location",
            os.path.join(cohort_cfg["root"], "train_uids.txt"),
            "--val_uid_location",
            os.path.join(cohort_cfg["root"], "val_uids.txt"),
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
            "--epochs",
            "2",
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    assert (tmp_path / "train_val_loss.png").exists()
    assert (tmp_path / "train_val_c_score.png").exists()


def test_cli_survival_inference(cohort_cfg, tmp_path):
    rc = _run_cli(
        [
            "--inference",
            "--survival",
            "--preop",
            "--no_gradcam",
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    csv = tmp_path / "survival_model_predictions.csv"
    assert csv.exists()
    import pandas as pd

    df = pd.read_csv(csv)
    assert list(df.columns) == [
        "MRN",
        "VS_pred",
        "DM_pred",
        "VS_event",
        "DM_event",
        "VS_duration",
        "DM_duration",
    ]


def test_cli_multimodal_images_survival_blend(cohort_cfg, tmp_path):
    """Full multimodal path: T1/T2 NIfTI cohort + clinical, tinycnn at a
    small grid, gradient blending, 1 epoch + inference with gradcam export."""
    root = cohort_cfg["root"]
    cfg_path = os.path.join(root, "config_img.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    base = base.replace("name: 'tinydensenet'", "name: 'tinycnn'")
    base = base.replace(
        "  in_channels: 2\n", "  in_channels: 2\n  spatial_size: [16, 16, 16]\n"
    )
    with open(cfg_path, "w") as f:
        f.write(base)

    common = [
        "--config", cfg_path,
        "--train_uid_location", os.path.join(root, "train_uids.txt"),
        "--val_uid_location", os.path.join(root, "val_uids.txt"),
    ]
    rc = _run_cli(
        ["--images", "--preop", "--survival", "--blend", "--epochs", "1",
         "--output_path", str(tmp_path)] + common,
        root,
    )
    assert rc == 0
    assert (tmp_path / "train_val_c_score.png").exists()
    assert (tmp_path / "gblend_weights_history.csv").exists()

    rc = _run_cli(
        ["--inference", "--images", "--preop", "--survival", "--blend",
         "--output_path", str(tmp_path / "inf")] + common,
        root,
    )
    assert rc == 0
    att = tmp_path / "inf" / "attention_maps"
    assert att.is_dir() and len(list(att.iterdir())) > 0
    patient_dir = sorted(att.iterdir())[0]
    assert (patient_dir / "att_map.nii.gz").exists()
    assert (patient_dir / "t1image.nii.gz").exists()
    assert (patient_dir / "preds.txt").exists()


def test_cli_efron_ties(cohort_cfg, tmp_path):
    """Hyperparameters.cox_ties: efron trains end-to-end through the YAML."""
    root = cohort_cfg["root"]
    cfg_path = os.path.join(root, "config_efron.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    base += "  cox_ties: 'efron'\n"  # appended inside Hyperparameters
    with open(cfg_path, "w") as f:
        f.write(base)
    rc = _run_cli(
        [
            "--survival", "--preop", "--epochs", "1",
            "--config", cfg_path,
            "--output_path", str(tmp_path),
            "--train_uid_location", os.path.join(root, "train_uids.txt"),
            "--val_uid_location", os.path.join(root, "val_uids.txt"),
        ],
        root,
    )
    assert rc == 0
    assert (tmp_path / "train_val_c_score.png").exists()


def test_cli_streaming_dataset_mode(cohort_cfg, tmp_path):
    """device_resident_dataset=false: host-resident splits with prefetched
    H2D streaming through the same loops."""
    root = cohort_cfg["root"]
    cfg_path = os.path.join(root, "config_stream.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    base += "\nTPU:\n  device_resident_dataset: false\n"
    with open(cfg_path, "w") as f:
        f.write(base)
    rc = _run_cli(
        [
            "--survival",
            "--preop",
            "--epochs",
            "1",
            "--config",
            cfg_path,
            "--output_path",
            str(tmp_path),
            "--train_uid_location",
            os.path.join(root, "train_uids.txt"),
            "--val_uid_location",
            os.path.join(root, "val_uids.txt"),
        ],
        root,
    )
    assert rc == 0
    assert (tmp_path / "train_val_c_score.png").exists()


def test_cli_trimodal_images_clinical_radiomics(cohort_cfg, tmp_path):
    """images + preop + radiomics: radiomics features concatenate onto the
    clinical branch of the fusion model."""
    import pandas as pd

    root = cohort_cfg["root"]
    uids = cohort_cfg["uids"]
    rng_l = np.random.default_rng(9)
    rad = pd.DataFrame({"MRN": uids})
    for i in range(5):
        rad[f"original_glcm_f{i}"] = rng_l.normal(size=len(uids))
    rad_path = os.path.join(root, "radiomics3.csv")
    rad.to_csv(rad_path, index=False)

    cfg_path = os.path.join(root, "config_tri.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    base = base.replace("name: 'tinydensenet'", "name: 'tinycnn'")
    base = base.replace(
        "  in_channels: 2\n", "  in_channels: 2\n  spatial_size: [16, 16, 16]\n"
    )
    with open(cfg_path, "w") as f:
        f.write(base)

    rc = _run_cli(
        [
            "--images", "--preop", "--radiomics", "--survival",
            "--rad_loc", rad_path,
            "--epochs", "1",
            "--config", cfg_path,
            "--output_path", str(tmp_path),
            "--train_uid_location", os.path.join(root, "train_uids.txt"),
            "--val_uid_location", os.path.join(root, "val_uids.txt"),
        ],
        root,
    )
    assert rc == 0
    assert (tmp_path / "train_val_c_score.png").exists()


def test_cli_postop_classification(cohort_cfg, tmp_path):
    rc = _run_cli(
        [
            "--classification",
            "--postop",
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
            "--epochs",
            "1",
            "--train_uid_location",
            os.path.join(cohort_cfg["root"], "train_uids.txt"),
            "--val_uid_location",
            os.path.join(cohort_cfg["root"], "val_uids.txt"),
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    assert (tmp_path / "model.npz").exists()


def test_cli_radiomics_survival(cohort_cfg, tmp_path):
    # synthesize a radiomics CSV joined on MRN
    import pandas as pd

    uids = cohort_cfg["uids"]
    rng_l = np.random.default_rng(5)
    rad = pd.DataFrame({"MRN": uids})
    for i in range(6):
        rad[f"original_firstorder_f{i}"] = rng_l.normal(size=len(uids))
    rad["diagnostics_Versions_PyRadiomics"] = "v3"
    rad_path = os.path.join(cohort_cfg["root"], "radiomics.csv")
    rad.to_csv(rad_path, index=False)

    rc = _run_cli(
        [
            "--survival",
            "--radiomics",
            "--preop",
            "--rad_loc",
            rad_path,
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
            "--epochs",
            "1",
            "--train_uid_location",
            os.path.join(cohort_cfg["root"], "train_uids.txt"),
            "--val_uid_location",
            os.path.join(cohort_cfg["root"], "val_uids.txt"),
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    assert (tmp_path / "train_val_c_score.png").exists()


def test_cli_lr_finder(cohort_cfg, tmp_path):
    rc = _run_cli(
        [
            "--classification",
            "--preop",
            "--lr_finder",
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    assert os.path.exists(os.path.join(cohort_cfg["root"], "lr_finder.png"))


def test_cli_resume_from_checkpoint(cohort_cfg, tmp_path):
    ckdir = str(tmp_path / "ck")
    args = [
        "--classification",
        "--preop",
        "--config",
        cohort_cfg["config"],
        "--output_path",
        str(tmp_path),
        "--epochs",
        "1",
        "--checkpoint_dir",
        ckdir,
        "--train_uid_location",
        os.path.join(cohort_cfg["root"], "train_uids.txt"),
        "--val_uid_location",
        os.path.join(cohort_cfg["root"], "val_uids.txt"),
    ]
    assert _run_cli(args, cohort_cfg["root"]) == 0
    assert os.path.isdir(ckdir) and len(os.listdir(ckdir)) > 0
    # resume path restores without error
    assert _run_cli(args + ["--resume"], cohort_cfg["root"]) == 0


def test_cli_inference_with_trained_weights(cohort_cfg, tmp_path):
    """Train -> inference loading the saved .npz through the config's
    model_weights (weight-load path parity, /root/reference/main.py:1001)."""
    root = cohort_cfg["root"]
    out = tmp_path / "train"
    rc = _run_cli(
        [
            "--survival", "--preop", "--epochs", "1",
            "--config", cohort_cfg["config"],
            "--output_path", str(out),
            "--train_uid_location", os.path.join(root, "train_uids.txt"),
            "--val_uid_location", os.path.join(root, "val_uids.txt"),
        ],
        root,
    )
    assert rc == 0
    weights = out / "best_surv_model.npz"
    assert weights.exists()

    cfg_path = os.path.join(root, "config_w.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    base += f"\n  model_weights: '{weights}'\n"
    # append under Hyperparameters: last section in the base config
    with open(cfg_path, "w") as f:
        f.write(base)
    rc = _run_cli(
        [
            "--inference", "--survival", "--preop", "--no_gradcam",
            "--config", cfg_path,
            "--output_path", str(tmp_path / "inf"),
        ],
        root,
    )
    assert rc == 0
    assert (tmp_path / "inf" / "survival_model_predictions.csv").exists()


def test_cli_bootstrap(cohort_cfg, tmp_path, capfd):
    rc = _run_cli(
        [
            "--inference",
            "--survival",
            "--preop",
            "--bootstrap",
            "--no_gradcam",
            "--config",
            cohort_cfg["config"],
            "--output_path",
            str(tmp_path),
        ],
        cohort_cfg["root"],
    )
    assert rc == 0
    out = capfd.readouterr().out
    assert "Mean c indices" in out
    assert "Std. devs" in out


def test_cli_fused_epoch_mode(cohort_cfg, tmp_path):
    """TPU.fused_epoch: true routes training through the whole-epoch-as-one-
    XLA-program path (train/steps.survival_train_epoch) end-to-end."""
    root = cohort_cfg["root"]
    cfg_path = os.path.join(root, "config_fused.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    base += "\nTPU:\n  fused_epoch: true\n"
    with open(cfg_path, "w") as f:
        f.write(base)
    rc = _run_cli(
        [
            "--survival", "--preop", "--epochs", "2",
            "--config", cfg_path,
            "--output_path", str(tmp_path),
            "--train_uid_location", os.path.join(root, "train_uids.txt"),
            "--val_uid_location", os.path.join(root, "val_uids.txt"),
        ],
        root,
    )
    assert rc == 0
    assert (tmp_path / "train_val_c_score.png").exists()
    with open(tmp_path / "metrics.jsonl") as f:
        lines = [json.loads(x) for x in f]
    assert len(lines) == 2 and all(
        np.isfinite(d["val_loss"]) for d in lines
    )


def test_cli_export_uses_trained_weights(cohort_cfg, tmp_path):
    """--export_path must bake Hyperparameters.model_weights (the trained
    model) into the artifact — NOT the pretrained/random init the training
    path starts from (regression: the export once reused the training-path
    weight selection and silently shipped an untrained artifact)."""
    import numpy as np

    from mmnn_sts_tpu.infer.export import load_exported

    root = cohort_cfg["root"]
    out = tmp_path / "train"
    out.mkdir()
    rc = _run_cli(
        [
            "--survival", "--preop", "--epochs", "2",
            "--config", cohort_cfg["config"],
            "--output_path", str(out),
            "--train_uid_location", os.path.join(root, "train_uids.txt"),
            "--val_uid_location", os.path.join(root, "val_uids.txt"),
        ],
        root,
    )
    assert rc == 0
    trained = out / "best_surv_model.npz"
    assert trained.exists()

    cfg_trained = str(tmp_path / "cfg_trained.yaml")
    with open(cohort_cfg["config"]) as f:
        base = f.read()
    with open(cfg_trained, "w") as f:
        f.write(base + f"\n  model_weights: '{trained}'\n")
    # (appends into the Hyperparameters section, which ends the file)

    common = [
        "--survival", "--preop",
        "--train_uid_location", os.path.join(root, "train_uids.txt"),
        "--val_uid_location", os.path.join(root, "val_uids.txt"),
        "--output_path", str(tmp_path),
    ]
    art_trained = tmp_path / "trained.stablehlo"
    rc = _run_cli(
        common + ["--config", cfg_trained, "--export_path", str(art_trained)],
        root,
    )
    assert rc == 0
    art_init = tmp_path / "init.stablehlo"
    rc = _run_cli(
        common + ["--config", cohort_cfg["config"],
                  "--export_path", str(art_init)],
        root,
    )
    assert rc == 0

    x = np.linspace(-1.0, 1.0, 11 * 3, dtype=np.float32).reshape(3, 11)
    p_trained = np.asarray(load_exported(str(art_trained))(x))
    p_init = np.asarray(load_exported(str(art_init))(x))
    assert p_trained.shape == p_init.shape == (3, 2)
    # trained weights differ from the seed-42 random init after 2 epochs
    assert not np.allclose(p_trained, p_init)
