"""Data-layer tests: clinical cleaning, splits, NIfTI, image cohort."""

from pathlib import Path

import numpy as np
import pytest

from mmnn_sts_tpu import constants as C
from mmnn_sts_tpu.data.images import apply_mask, build_image_cohort, resize_volume
from mmnn_sts_tpu.data.nifti import load_nifti, save_nifti
from mmnn_sts_tpu.data.split import (
    iterative_stratified_split,
    load_uids,
    stratified_split,
)
from mmnn_sts_tpu.data.tabular import add_cutoffs, load_clinical_arrays

from fixtures import make_full_cohort


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("cohort")
    return make_full_cohort(str(root), n=24)


def test_clinical_cleaning(cohort):
    paths, uids = cohort
    arrays = load_clinical_arrays(paths["clinical"], preop=True)
    assert arrays.predictors.shape == (24, len(C.PRE_OP_PREDICTORS))
    assert arrays.events.shape == (24, 2)
    assert arrays.durations.shape == (24, 2)
    assert arrays.predictors.dtype == np.float32
    # categorical columns got index-encoded: small integer range
    sex_col = arrays.predictors[:, C.PRE_OP_PREDICTORS.index("Sex")]
    assert set(np.unique(sex_col)) <= {0.0, 1.0}
    # DM durations: event rows use days-since-surgery, censored rows FUtime
    raw = arrays.raw
    dm = raw["Distant metastasis"].to_numpy().astype(bool)
    fu = raw["FUtime"].to_numpy()
    assert np.all(arrays.durations[~dm, 1] == fu[~dm])


def test_postop_predictors(cohort):
    paths, _ = cohort
    arrays = load_clinical_arrays(paths["clinical"], preop=False, postop=True)
    assert arrays.predictors.shape[1] == len(C.POST_OP_PREDICTORS)
    # necrosis % strings became floats (NaN allowed)
    nec = arrays.predictors[:, C.POST_OP_PREDICTORS.index(C.NECROSIS_COLUMN)]
    finite = nec[np.isfinite(nec)]
    assert len(finite) > 0 and np.all((finite >= 0) & (finite <= 100))


def test_add_cutoffs(cohort):
    paths, _ = cohort
    arrays = load_clinical_arrays(paths["clinical"])
    out = add_cutoffs(arrays.raw)
    vol = out[C.TUMOR_VOLUME_COLUMN]
    assert np.all(out.loc[vol < 500, "VolumeCutoff"] == 0)
    assert np.all(out.loc[(vol >= 500) & (vol <= 1000), "VolumeCutoff"] == 1)
    assert np.all(out.loc[vol > 1000, "VolumeCutoff"] == 2)


def test_iterative_split_balance(rng):
    n = 200
    labels = (rng.random((n, 4)) < [0.5, 0.3, 0.1, 0.7]).astype(np.int8)
    tr, te = iterative_stratified_split(labels, 0.3, seed=0)
    assert len(tr) + len(te) == n
    assert len(set(tr) & set(te)) == 0
    # fold sizes near 70/30
    assert abs(len(te) / n - 0.3) < 0.05
    # label proportions preserved within tolerance
    for j in range(4):
        p_all = labels[:, j].mean()
        p_te = labels[te, j].mean()
        assert abs(p_te - p_all) < 0.1


def test_stratified_split_files(cohort, tmp_path):
    paths, uids = cohort
    arrays = load_clinical_arrays(paths["clinical"])
    tr, va, te = stratified_split(
        arrays.raw, uids, seed=42, output_dir=str(tmp_path)
    )
    assert sorted(tr + va + te) == sorted(int(u) for u in uids)
    assert load_uids(str(tmp_path / "train_uids.txt")) == tr
    # 70/15/15-ish
    assert len(tr) > len(va) and len(tr) > len(te)


def test_split_deterministic(cohort):
    paths, uids = cohort
    arrays = load_clinical_arrays(paths["clinical"])
    a = stratified_split(arrays.raw, uids, seed=7, write_files=False)
    b = stratified_split(arrays.raw, uids, seed=7, write_files=False)
    assert a == b


def test_nifti_scaling_and_endianness(tmp_path):
    arr = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    p = str(tmp_path / "x.nii")
    save_nifti(p, arr)
    back = load_nifti(p)
    np.testing.assert_allclose(back, arr)
    # fortran-order on disk: first axis fastest
    raw = open(p, "rb").read()
    vox = np.frombuffer(raw, dtype="<f4", offset=352)
    assert vox[1] == arr[1, 0, 0]


def test_resize_volume_matches_jax(rng):
    import jax.numpy as jnp
    import jax

    vol = rng.normal(size=(9, 12, 7)).astype(np.float32)
    ours = resize_volume(vol, (16, 16, 16))
    theirs = np.asarray(
        jax.image.resize(jnp.asarray(vol), (16, 16, 16), method="linear")
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_build_image_cohort(cohort):
    paths, uids = cohort
    cohort_arr = build_image_cohort(
        (paths["t1"], paths["t2"]),
        paths["key"],
        spatial_size=(12, 12, 12),
        zero_slices="fill",
    )
    assert cohort_arr.volumes.shape == (24, 12, 12, 12, 2)
    assert sorted(cohort_arr.uids.tolist()) == sorted(int(u) for u in uids)
    assert np.isfinite(cohort_arr.volumes).all()


def test_standardize_bundle_train_stats_only(cohort):
    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.pipeline import TaskFlags, load_cohort, standardize_bundle

    paths, uids = cohort
    cfg = Config()
    cfg.data.data_loc = paths["clinical"]
    flags = TaskFlags(preop=True, survival=True)
    bundle = load_cohort(cfg, flags)
    train_uids = [int(u) for u in uids[:16]]
    standardize_bundle(bundle, train_uids)
    preds = bundle.clinical.predictors
    assert np.isfinite(preds).all()
    train_rows = [i for i, u in enumerate(bundle.clinical.uids)
                  if int(u) in set(train_uids)]
    # train rows have ~zero mean / unit std per non-constant column
    mu = preds[train_rows].mean(axis=0)
    assert np.abs(mu).max() < 0.3  # NaN-imputed columns shift slightly


def test_build_manifest_s3_with_fake_lister(cohort, tmp_path):
    """S3 manifest parity using injected lister/fetcher (offline)."""
    from mmnn_sts_tpu.data.images import build_manifest_s3

    paths, uids = cohort
    import os

    local_files = {}
    keys = []
    for name in sorted(os.listdir(paths["t1"])):
        pdir = os.path.join(paths["t1"], name)
        for f in os.listdir(pdir):
            key = f"cohort/t1/{f}"
            keys.append(key)
            local_files[key] = os.path.join(pdir, f)

    records = build_manifest_s3(
        "cohort/t1",
        paths["key"],
        lister=lambda p: keys,
        fetcher=lambda k: local_files[k],
    )
    assert len(records) == 24
    assert all(r.image_path.endswith(".nii.gz") for r in records)
    assert sorted(r.uid for r in records) == sorted(int(u) for u in uids)


def test_example_config_template_parses():
    """The shipped config.example.yaml must stay in sync with the parser:
    every section parses, validation passes, and the values it documents
    (flagship model, t1t2, bf16) round-trip into the typed Config."""
    from mmnn_sts_tpu.config import parse_config

    template = Path(__file__).resolve().parent.parent / "config.example.yaml"
    cfg = parse_config(str(template))
    assert cfg.image_model.name == "densenet121"
    assert cfg.image_model.modality == "t1t2"
    assert cfg.image_model.in_channels == 2
    assert cfg.tpu.compute_dtype == "bfloat16"
    assert cfg.hyperparameters.cox_ties == "breslow"
    assert cfg.data.image_format == "nifti"
