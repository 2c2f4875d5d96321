"""DICOM end-to-end: manifests (local + S3), cohort build, CLI training.

Parity targets: S3DicomDataset (/root/reference/data/ImageDatasets.py:101-196),
parseS3ImageFolder / getDicomFilenames (/root/reference/data/s3utils.py:25-154),
readSitk 4D-squeeze (s3utils.py:244-265).
"""

import os

import numpy as np
import pytest

from mmnn_sts_tpu.data.dicom import load_dicom_series
from mmnn_sts_tpu.data.images import (
    build_image_cohort,
    build_manifest_dicom,
    build_manifest_dicom_s3,
    load_patient_volume,
)
from mmnn_sts_tpu.exceptions import InitializationError

from fixtures import (
    make_clinical_csv,
    make_dicom_cohort,
    make_dicom_tree,
    make_patient_key,
    write_dicom_multiframe,
    write_dicom_slice,
)


def test_multiframe_mask_roundtrip(tmp_path):
    """A single multi-frame file loads as the full (frames, rows, cols)
    volume — the DicomRT mask path."""
    mask = np.zeros((5, 6, 7), dtype=np.int16)
    mask[1:4, 2:5, 3:6] = 255
    p = str(tmp_path / "mask.dcm")
    write_dicom_multiframe(p, mask)
    vol = load_dicom_series(p)
    np.testing.assert_array_equal(vol, mask.astype(np.float32))
    # directory containing only the multi-frame file loads identically
    vol2 = load_dicom_series(str(tmp_path))
    np.testing.assert_array_equal(vol2, mask.astype(np.float32))


def test_local_dicom_manifest_and_volume(tmp_path):
    uids = make_clinical_csv(str(tmp_path / "c.csv"), n=3)
    anon = make_patient_key(str(tmp_path / "key.csv"), uids)
    make_dicom_tree(str(tmp_path / "t1"), anon, shape=(10, 12, 10))

    records = build_manifest_dicom(str(tmp_path / "t1"), str(tmp_path / "key.csv"))
    assert [r.anon_id for r in records] == sorted(anon)
    assert all(r.format == "dicom" for r in records)
    assert sorted(r.uid for r in records) == sorted(uids)

    vol = load_patient_volume(records[0], spatial_size=(8, 8, 8),
                              zero_slices="crop")
    assert vol.shape == (8, 8, 8)
    assert np.isfinite(vol).all()
    assert vol.max() > 0  # masked region survives


def test_dicom_mask_semantics(tmp_path):
    """Mask multiplies the image and the >128 rebinarization holds
    (ImageDatasets.py:146-155): values at exactly 128 are excluded."""
    img = np.full((6, 6, 6), 100.0, dtype=np.int16)
    mask = np.zeros((6, 6, 6), dtype=np.int16)
    mask[2:4, 2:4, 2:4] = 255
    mask[0, 0, 0] = 128  # boundary: NOT > 128, must be excluded
    pdir = tmp_path / "P-001"
    (pdir / "image").mkdir(parents=True)
    (pdir / "mask").mkdir()
    for z in range(6):
        write_dicom_slice(str(pdir / "image" / f"s{z}.dcm"), img[z],
                          instance=z + 1, z=float(z))
    write_dicom_multiframe(str(pdir / "mask" / "m.dcm"), mask)

    import pandas as pd

    from mmnn_sts_tpu import constants as C

    pd.DataFrame({C.ANON_UID: ["P-001"], C.UID: [7]}).to_csv(
        str(tmp_path / "key.csv"), index=False
    )
    records = build_manifest_dicom(str(tmp_path), str(tmp_path / "key.csv"))
    assert len(records) == 1
    from mmnn_sts_tpu.data.images import _load_dicom_pair

    image, maskb = _load_dicom_pair(records[0])
    assert maskb[0, 0, 0] == 0.0  # 128 excluded
    assert maskb[2, 2, 2] == 1.0
    assert (image * maskb).max() == 100.0


def test_dicom_mask_resampled_to_image_grid(tmp_path):
    """A mask on a coarser grid is resampled to the image grid before
    binarization (sitk.Resample(mask, image) role)."""
    img = np.full((8, 8, 8), 50.0, dtype=np.int16)
    mask = np.zeros((4, 4, 4), dtype=np.int16)
    mask[1:3, 1:3, 1:3] = 255
    pdir = tmp_path / "P-002"
    (pdir / "image").mkdir(parents=True)
    (pdir / "mask").mkdir()
    for z in range(8):
        write_dicom_slice(str(pdir / "image" / f"s{z}.dcm"), img[z],
                          instance=z + 1, z=float(z))
    write_dicom_multiframe(str(pdir / "mask" / "m.dcm"), mask)

    import pandas as pd

    from mmnn_sts_tpu import constants as C

    pd.DataFrame({C.ANON_UID: ["P-002"], C.UID: [9]}).to_csv(
        str(tmp_path / "key.csv"), index=False
    )
    (rec,) = build_manifest_dicom(str(tmp_path), str(tmp_path / "key.csv"))
    from mmnn_sts_tpu.data.images import _load_dicom_pair

    image, maskb = _load_dicom_pair(rec)
    assert maskb.shape == image.shape == (8, 8, 8)
    assert set(np.unique(maskb)) <= {0.0, 1.0}
    assert maskb.sum() > 0


def test_dicom_cohort_t1t2(tmp_path):
    paths, uids = make_dicom_cohort(str(tmp_path), n=4)
    cohort = build_image_cohort(
        (paths["t1"], paths["t2"]),
        paths["key"],
        spatial_size=(8, 8, 8),
        zero_slices="fill",
        image_format="dicom",
    )
    assert cohort.volumes.shape == (4, 8, 8, 8, 2)
    assert sorted(cohort.uids.tolist()) == sorted(uids)
    assert np.isfinite(cohort.volumes).all()


def test_s3_dicom_manifest(tmp_path):
    """parseS3ImageFolder semantics with injected lister/fetcher: keys group
    per anon MRN into image/mask lists; fetched objects land in per-patient
    series directories; unparseable keys raise."""
    uids = make_clinical_csv(str(tmp_path / "c.csv"), n=2)
    anon = make_patient_key(str(tmp_path / "key.csv"), uids)
    src = str(tmp_path / "src")
    make_dicom_tree(src, anon, shape=(6, 8, 6))

    prefix = "images/T1/"
    key_to_path = {}
    for a in anon:
        for fname in sorted(os.listdir(os.path.join(src, a, "image"))):
            key_to_path[f"{prefix}{a}/image/{fname}"] = os.path.join(
                src, a, "image", fname
            )
        key_to_path[f"{prefix}{a}/mask/mask.dcm"] = os.path.join(
            src, a, "mask", "mask.dcm"
        )

    def lister(p):
        assert p == prefix
        return sorted(key_to_path)

    def fetcher(uri):
        # copy so the manifest's move doesn't consume the source
        import shutil
        import tempfile

        fd, tmp = tempfile.mkstemp(suffix=".dcm")
        os.close(fd)
        shutil.copy(key_to_path[uri], tmp)
        return tmp

    records = build_manifest_dicom_s3(
        prefix, str(tmp_path / "key.csv"), lister=lister, fetcher=fetcher
    )
    assert [r.anon_id for r in records] == sorted(anon)
    for r in records:
        vol = load_patient_volume(r, spatial_size=(6, 6, 6), zero_slices="crop")
        assert vol.shape == (6, 6, 6)

    # a key that is neither image nor mask raises (s3utils.py:151-153)
    def bad_lister(p):
        return [f"{prefix}{anon[0]}/stray/file.dcm"]

    with pytest.raises(InitializationError, match="Unable to parse"):
        build_manifest_dicom_s3(
            prefix, str(tmp_path / "key.csv"), lister=bad_lister,
            fetcher=fetcher,
        )


def test_cli_dicom_survival_end_to_end(tmp_path):
    """--images --preop --survival trains from a DICOM tree via
    Data.image_format: dicom (VERDICT r1 item 1 done-criterion)."""
    paths, uids = make_dicom_cohort(str(tmp_path), n=12)
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            f"""
Data:
  data_loc: '{paths["clinical"]}'
  image_loc: '{paths["root"]}'
  key_loc: '{paths["key"]}'
  t1_path: 't1'
  t2_path: 't2'
  image_format: 'dicom'
ImageModel:
  name: 'tinycnn'
  modality: 't1t2'
  feature_layers: 12
  num_classes: 2
  spatial_dims: 3
  in_channels: 2
  dropout_prob: 0.0
  spatial_size: [16, 16, 16]
Hyperparameters:
  epochs: 1
  learning_rate: 0.0005
  train_batch_size: 4
  test_batch_size: 4
  seed: 42
"""
        )
    from mmnn_sts_tpu.cli import main

    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        rc = main(
            [
                "--images", "--preop", "--survival", "--split",
                "--config", cfg_path,
                "--output_path", str(tmp_path / "out"),
                "--epochs", "1",
            ]
        )
    finally:
        os.chdir(cwd)
    assert rc == 0
    assert (tmp_path / "out" / "train_val_c_score.png").exists()
