"""Image manifest building + host-side volume preprocessing.

Re-designs the reference's lazy per-item Dataset classes
(/root/reference/data/ImageDatasets.py) into an eager, cache-friendly
pipeline that produces ONE fixed-shape device-resident array:

    manifest (patient dirs / files)                 [host, pandas+os]
      -> decode NIfTI image+mask                    [host, data/nifti.py]
      -> mask multiply + zero-slice crop or fill    [host, numpy]
      -> resize each modality to 64^3               [host, numpy trilinear]
      -> stack T1/T2 channels                       [host]
      -> (N, 64, 64, 64, C) float32 cohort array    [device, one transfer]

After this, training never touches the host again: per-step batches are
device-side gathers by index, and all augmentation runs in the jitted train
step (ops/augment.py).

Behavioral parity:
  * masking + "remove all all-zero slices in every plane" crop:
    /root/reference/data/ImageDatasets.py:398-403 (Nifti*Dataset);
  * the S3NiftiSurvivalDataset variant FILLS all-zero slices with
    image_max/2 instead of cropping (ImageDatasets.py:489-501) — selected
    with zero_slices="fill"; the T1/T2 survival path uses this variant;
  * per-modality resize to 64^3 before channel concat
    (sub_transforms, ImageDatasets.py:599-602);
  * anon-id <-> UID mapping via the patient-key CSV with 'Anon MRN' and
    'MRN' columns (ImageDatasets.py:42-56);
  * patient folder name -> anon id: '-'.join(name.split('-')[:2]), with
    'scan_' prefix / '.nii.gz' suffix stripping (ImageDatasets.py:63-68, 330).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .. import constants as C
from ..exceptions import InitializationError
from .nifti import load_nifti


def resize_volume(vol: np.ndarray, out_shape) -> np.ndarray:
    """Trilinear resize with half-pixel sampling (align_corners=False
    semantics, matching jax.image.resize(method='linear'))."""
    vol = np.asarray(vol, dtype=np.float32)
    out = vol
    for axis, new in enumerate(out_shape):
        old = out.shape[axis]
        if old == new:
            continue
        scale = old / new
        centers = (np.arange(new) + 0.5) * scale - 0.5
        lo = np.floor(centers).astype(np.int64)
        frac = (centers - lo).astype(np.float32)
        lo_c = np.clip(lo, 0, old - 1)
        hi_c = np.clip(lo + 1, 0, old - 1)
        a = np.take(out, lo_c, axis=axis)
        b = np.take(out, hi_c, axis=axis)
        shape = [1] * out.ndim
        shape[axis] = new
        w = frac.reshape(shape)
        out = a * (1.0 - w) + b * w
    return out


def apply_mask(
    image: np.ndarray, mask: np.ndarray, zero_slices: str = "crop"
) -> np.ndarray:
    """Multiply by the segmentation mask, then crop or fill all-zero planes.

    zero_slices:
      "crop": drop any plane (in all three axes) that is entirely zero
        (ImageDatasets.py:398-403);
      "fill": set those planes to image_max/2 (ImageDatasets.py:489-501);
      "none": leave as-is.
    """
    masked = np.asarray(image, dtype=np.float32) * np.asarray(mask, dtype=np.float32)
    if zero_slices == "none":
        return masked
    ax2 = np.all(masked == 0, axis=(0, 1))
    ax0 = np.all(masked == 0, axis=(1, 2))
    ax1 = np.all(masked == 0, axis=(0, 2))
    if zero_slices == "crop":
        masked = masked[:, :, ~ax2][~ax0, :, :][:, ~ax1, :]
        return masked
    if zero_slices == "fill":
        fill = masked.max() / 2.0
        masked[:, :, ax2] = fill
        masked[ax0, :, :] = fill
        masked[:, ax1, :] = fill
        return masked
    raise ValueError(f"Unknown zero_slices mode: {zero_slices}")


@dataclass
class PatientRecord:
    anon_id: str
    uid: int
    image_path: str
    mask_path: str
    format: str = "nifti"  # "nifti" (paths are files) | "dicom" (paths are
    # series directories or single multi-frame files)


def _anon_id_from_dirname(name: str) -> str:
    anon = "-".join(name.split("-")[:2])
    return anon.replace("scan_", "").replace(".nii.gz", "")


def _uid_for_anon(key_df: pd.DataFrame, anon: str) -> int:
    """Patient-key lookup: raw folder name first (the DICOM datasets use it
    verbatim, /root/reference/data/ImageDatasets.py:90-99), then the
    two-segment truncation the NIfTI datasets apply (ImageDatasets.py:63-68).
    """
    for candidate in (anon, _anon_id_from_dirname(anon)):
        row = key_df.loc[key_df[C.ANON_UID] == candidate]
        if len(row) == 1:
            return int(row[C.UID].item())
    raise InitializationError(
        f"Could not find UID for patient {anon} - Ensure uid is in the "
        "patient key"
    )


def build_manifest_s3(
    prefix: str,
    patient_key_csv: str,
    lister=None,
    fetcher=None,
) -> list[PatientRecord]:
    """Manifest from an s3:// NIfTI prefix.

    Parity with getNiftiFilenames (/root/reference/data/s3utils.py:190-226):
    objects under the prefix pair up per patient as (scan_*.nii.gz image,
    other .nii.gz mask); the anon id is the scan filename minus the 'scan_'
    prefix/extension, truncated to its first two '-'-separated segments
    (ImageDatasets.py:63-68). Remote objects are fetched to local temp files
    so decode goes through the same (C++/numpy) path.

    lister/fetcher are injectable for tests; defaults use utils.store
    (boto3-gated).
    """
    from ..utils.store import fetch_to_local, list_prefix, read_csv_any

    lister = lister or list_prefix
    fetcher = fetcher or fetch_to_local
    keys = [k for k in lister(prefix) if k.endswith((".nii", ".nii.gz"))]

    groups: dict[str, dict] = {}
    for key in keys:
        fname = key.split("/")[-1]
        if fname.startswith("scan"):
            anon = _anon_id_from_dirname(fname)
            groups.setdefault(anon, {})["image"] = key
        else:
            anon = _anon_id_from_dirname(fname.replace("mask_", ""))
            groups.setdefault(anon, {})["mask"] = key

    key_df = read_csv_any(patient_key_csv)
    records = []
    for anon in sorted(groups):
        pair = groups[anon]
        if "image" not in pair or "mask" not in pair:
            continue
        row = key_df.loc[key_df[C.ANON_UID] == anon]
        if len(row) != 1:
            raise InitializationError(
                f"Could not find UID for patient {anon} - Ensure uid is in "
                "the patient key"
            )
        bucket_root = prefix.split("//")[0] + "//" + prefix.split("//")[1].split("/")[0] if "//" in prefix else ""
        records.append(
            PatientRecord(
                anon_id=anon,
                uid=int(row[C.UID].item()),
                image_path=fetcher(f"{bucket_root}/{pair['image']}" if bucket_root else pair["image"]),
                mask_path=fetcher(f"{bucket_root}/{pair['mask']}" if bucket_root else pair["mask"]),
            )
        )
    return records


def build_manifest(patient_directory: str, patient_key_csv: str) -> list[PatientRecord]:
    """Scan a local patient directory tree into (uid, image, mask) records.

    Layout (parity with NiftiSurvivalDataset, ImageDatasets.py:422-473): one
    folder per patient; inside, the file starting with 'scan' is the image
    and any other NIfTI is the mask.
    """
    from ..utils.store import read_csv_any

    key = read_csv_any(patient_key_csv)
    records = []
    for name in sorted(os.listdir(patient_directory)):
        if name.startswith("."):
            continue
        pdir = os.path.join(patient_directory, name)
        if not os.path.isdir(pdir):
            continue
        image_path, mask_path = None, None
        for fname in sorted(os.listdir(pdir)):
            full = os.path.join(pdir, fname)
            if fname.startswith("scan"):
                image_path = full
            elif fname.endswith((".nii", ".nii.gz")):
                mask_path = full
        if image_path is None or mask_path is None:
            continue
        anon = _anon_id_from_dirname(name)
        row = key.loc[key[C.ANON_UID] == anon]
        if len(row) != 1:
            raise InitializationError(
                f"Could not find UID for patient {anon} - Ensure uid is in the "
                "patient key"
            )
        records.append(
            PatientRecord(
                anon_id=anon,
                uid=int(row[C.UID].item()),
                image_path=image_path,
                mask_path=mask_path,
            )
        )
    return records


def build_manifest_dicom(
    patient_directory: str, patient_key_csv: str
) -> list[PatientRecord]:
    """Manifest from a local DICOM tree.

    Layout (parity with S3DicomDataset's expected structure,
    /root/reference/data/ImageDatasets.py:101-126): one folder per patient
    (named by anon MRN) containing an `image` subdirectory (one .dcm per
    slice) and a `mask` subdirectory (single DicomRT .dcm). A bare
    image/mask pair of files or differently-named subdirs containing
    'image'/'mask' also resolve.
    """
    from ..utils.store import read_csv_any

    key = read_csv_any(patient_key_csv)
    records = []
    for name in sorted(os.listdir(patient_directory)):
        if name.startswith("."):
            continue
        pdir = os.path.join(patient_directory, name)
        if not os.path.isdir(pdir):
            continue
        image_path = mask_path = None
        for entry in sorted(os.listdir(pdir)):
            full = os.path.join(pdir, entry)
            low = entry.lower()
            if "image" in low:
                image_path = full
            elif "mask" in low:
                mask_path = full
        if image_path is None or mask_path is None:
            continue
        records.append(
            PatientRecord(
                anon_id=name,
                uid=_uid_for_anon(key, name),
                image_path=image_path,
                mask_path=mask_path,
                format="dicom",
            )
        )
    return records


def build_manifest_dicom_s3(
    prefix: str,
    patient_key_csv: str,
    lister=None,
    fetcher=None,
) -> list[PatientRecord]:
    """Manifest from an s3:// DICOM prefix.

    Parity with parseS3ImageFolder + getDicomFilenames
    (/root/reference/data/s3utils.py:25-70, 106-154): list all keys under the
    prefix; the path segment after the prefix is the patient's anon MRN;
    keys whose remainder contains 'image' are the per-slice files, 'mask'
    the DicomRT mask; anything else raises (s3utils.py:151-153). Each
    patient's objects are fetched into local per-patient image/mask
    directories so decode goes through load_dicom_series. All per-patient
    directories live under one run-scoped temp root that is removed at
    interpreter exit (atexit), so a cohort's imaging data no longer leaks
    onto the temp filesystem across runs.
    """
    import atexit
    import shutil
    import tempfile

    from ..utils.store import fetch_to_local, list_prefix, read_csv_any

    lister = lister or list_prefix
    fetcher = fetcher or fetch_to_local

    bare = prefix.split("//", 1)[-1].split("/", 1)
    bucket_root = (
        prefix.split("//")[0] + "//" + bare[0] if "//" in prefix else ""
    )
    rel_prefix = bare[1] if "//" in prefix and len(bare) > 1 else prefix

    dcm_dict: dict[str, dict[str, list[str]]] = {}
    for key in lister(prefix):
        trunc = key[len(rel_prefix):] if key.startswith(rel_prefix) else key
        parts = [p for p in trunc.split("/") if p]
        if not parts:
            continue
        anon = parts[0]
        entry = dcm_dict.setdefault(anon, {"image": [], "mask": []})
        if "image" in trunc:
            entry["image"].append(key)
        elif "mask" in trunc:
            entry["mask"].append(key)
        else:
            raise InitializationError(
                f"Could not initialize S3 DICOM dataset - Unable to parse S3 "
                f"key {key}"
            )

    key_df = read_csv_any(patient_key_csv)
    records = []
    run_root = None
    for anon in sorted(dcm_dict):
        pair = dcm_dict[anon]
        if not pair["image"] or not pair["mask"]:
            continue
        if run_root is None:
            run_root = tempfile.mkdtemp(prefix="dicom_cohort_")
            atexit.register(shutil.rmtree, run_root, ignore_errors=True)
        pdir = tempfile.mkdtemp(prefix=f"dicom_{anon}_", dir=run_root)
        img_dir = os.path.join(pdir, "image")
        mask_dir = os.path.join(pdir, "mask")
        os.makedirs(img_dir)
        os.makedirs(mask_dir)
        for bucket_keys, dest in ((pair["image"], img_dir),
                                  (pair["mask"], mask_dir)):
            for k in bucket_keys:
                uri = f"{bucket_root}/{k}" if bucket_root else k
                local = fetcher(uri)
                shutil.move(local, os.path.join(dest, os.path.basename(k)))
        records.append(
            PatientRecord(
                anon_id=anon,
                uid=_uid_for_anon(key_df, anon),
                image_path=img_dir,
                mask_path=mask_dir,
                format="dicom",
            )
        )
    return records


def _load_dicom_pair(rec: PatientRecord) -> tuple[np.ndarray, np.ndarray]:
    """Decode a DICOM patient into (image, binary mask) in image space.

    Parity with S3DicomDataset.__getitem__
    (/root/reference/data/ImageDatasets.py:136-162): the DicomRT mask is
    resampled onto the image grid exactly as `sitk.Resample(mask, image)`
    does — through PHYSICAL space (origin/spacing/orientation/per-frame z
    offsets, dicom.resample_to_grid), so a mask with a shifted origin,
    different spacing, or z-reversed stored frame order lands on the
    correct voxels — then rebinarized at >128 because interpolation makes
    the nominally 0/255 mask non-binary. When either series lacks geometry
    tags, falls back to the array-space rule (same shape = same grid, else
    trilinear array resize); that same-grid assumption is recorded in
    PARITY.md ("DICOM mask geometry").
    """
    from .dicom import load_dicom_series, resample_to_grid

    image, igeom = load_dicom_series(rec.image_path, with_geometry=True)
    mask, mgeom = load_dicom_series(rec.mask_path, with_geometry=True)
    image = image.astype(np.float32)
    mask = mask.astype(np.float32)
    if igeom is not None and mgeom is not None:
        mask = resample_to_grid(mask, mgeom, image.shape, igeom)
    elif mask.shape != image.shape:
        mask = resize_volume(mask, image.shape)
    return image, (mask > 128).astype(np.float32)


def load_patient_volume(
    rec: PatientRecord,
    spatial_size=C.SPATIAL_SIZE,
    zero_slices: str = "fill",
    use_native: bool = True,
) -> np.ndarray:
    """Decode + mask + crop/fill + resize one patient to (64,64,64).

    Uses the C++ fused decode/preprocess (data/native.py) when built; the
    numpy path below is the reference implementation it is tested against.
    DICOM patients decode through the pure-python reader (data/dicom.py).
    """
    if rec.format == "dicom":
        image, mask = _load_dicom_pair(rec)
    else:
        if use_native:
            from .native import preprocess_patient_native

            try:
                out = preprocess_patient_native(
                    rec.image_path, rec.mask_path, zero_slices, spatial_size
                )
                if out is not None:
                    return out
            except IOError:
                pass  # fall back to the numpy path for unsupported inputs
        image = load_nifti(rec.image_path, dtype=np.float32)
        mask = load_nifti(rec.mask_path, dtype=np.float32)
    masked = apply_mask(image, mask, zero_slices=zero_slices)
    if any(s == 0 for s in masked.shape):
        # Fully-masked-out volume after cropping; fall back to zeros.
        return np.zeros(spatial_size, dtype=np.float32)
    return resize_volume(masked, spatial_size)


@dataclass
class ImageCohort:
    """All image volumes for a cohort, as one host array ready for device."""

    uids: np.ndarray  # (N,)
    volumes: np.ndarray  # (N, D, H, W, C) float32

    def index_of(self, uid: int) -> int:
        idx = np.where(self.uids == uid)[0]
        if len(idx) != 1:
            raise KeyError(f"uid {uid} not in image cohort")
        return int(idx[0])


def build_segmentation_cohort(
    patient_directory: str,
    patient_key_csv: str,
    spatial_size=C.SPATIAL_SIZE,
) -> tuple[ImageCohort, ImageCohort]:
    """(images, masks) cohorts for segmentation.

    Parity note: the reference's ImageSegmentationDataset
    (/root/reference/data/ImageDatasets.py:295-308) returns raw
    (image, mask) SimpleITK pairs and its __init__ drops the required
    patient_key argument (latent TypeError); no segmentation training loop
    exists in the reference. Here the pairs are decoded and resized into
    aligned cohort arrays ready for a segmentation model.
    """
    records = build_manifest(patient_directory, patient_key_csv)
    imgs, masks, uids = [], [], []
    for rec in records:
        image = load_nifti(rec.image_path, dtype=np.float32)
        mask = load_nifti(rec.mask_path, dtype=np.float32)
        imgs.append(resize_volume(image, spatial_size)[..., None])
        # nearest-equivalent for the binary mask: resize + re-binarize
        masks.append((resize_volume(mask, spatial_size) > 0.5).astype(
            np.float32)[..., None])
        uids.append(rec.uid)
    uids = np.asarray(uids, dtype=np.int64)
    return (
        ImageCohort(uids=uids, volumes=np.stack(imgs).astype(np.float32)),
        ImageCohort(uids=uids, volumes=np.stack(masks).astype(np.float32)),
    )


def build_manifest_any(
    directory: str, patient_key_csv: str, image_format: str = "nifti"
) -> list[PatientRecord]:
    """Manifest dispatch: {nifti, dicom} x {local, s3://} -> records."""
    from ..utils.store import is_remote

    if image_format == "dicom":
        if is_remote(directory):
            return build_manifest_dicom_s3(directory, patient_key_csv)
        return build_manifest_dicom(directory, patient_key_csv)
    if is_remote(directory):
        return build_manifest_s3(directory, patient_key_csv)
    return build_manifest(directory, patient_key_csv)


def build_image_cohort(
    directories,
    patient_key_csv: str,
    spatial_size=C.SPATIAL_SIZE,
    zero_slices: str = "fill",
    image_format: str = "nifti",
) -> ImageCohort:
    """Build the (N, *spatial, C) cohort array.

    directories: a single path (one modality) or a (t1_dir, t2_dir) tuple —
    T1/T2 are resized independently then stacked on the channel axis
    (parity: T1T2SurvivalDataset, ImageDatasets.py:578-640).
    Patients are restricted to the intersection of modalities' anon ids
    (ImageDatasets.py:616). Each directory may be local or s3://, NIfTI
    patient folders or DICOM series trees (image_format).
    """
    if isinstance(directories, (str, os.PathLike)):
        directories = [directories]
    manifests = [
        build_manifest_any(d, patient_key_csv, image_format)
        for d in directories
    ]

    common = set.intersection(*[{r.anon_id for r in m} for m in manifests])
    by_anon = [{r.anon_id: r for r in m} for m in manifests]
    anon_ids = sorted(common)

    per_modality = [
        _load_modality_volumes(
            [by_anon[m][anon] for anon in anon_ids], spatial_size, zero_slices
        )
        for m in range(len(manifests))
    ]
    return ImageCohort(
        uids=np.asarray([by_anon[0][a].uid for a in anon_ids], dtype=np.int64),
        volumes=np.stack(per_modality, axis=-1).astype(np.float32),
    )


def _load_modality_volumes(records, spatial_size, zero_slices) -> np.ndarray:
    """Decode one modality's records into an (N, *spatial) array.

    Host-side cohort build is the startup bottleneck at scale (the per-step
    path never touches the host): NIfTI records go through the C++ threaded
    pool (native/mmnn_native.cpp:mmnn_preprocess_cohort — GIL-free fused
    decode/mask/resize across std::thread workers); any patient the native
    path rejects (exotic NIfTI variants) is re-decoded through the numpy
    fallback, preserving load_patient_volume's semantics exactly
    (tests/test_native.py::test_cohort_build_uses_native_pool). DICOM
    records decode through the pure-python reader on a host thread pool
    (numpy resize/interp release the GIL between slices).
    """
    out: list = [None] * len(records)

    nifti_idx = [i for i, r in enumerate(records) if r.format != "dicom"]
    if nifti_idx:
        from .native import preprocess_cohort_native

        vols, errors = preprocess_cohort_native(
            [records[i].image_path for i in nifti_idx],
            [records[i].mask_path for i in nifti_idx],
            zero_slices, spatial_size, return_errors=True,
        )
        if vols is not None:
            for j, i in enumerate(nifti_idx):
                if errors[j] == 0:
                    out[i] = vols[j]

    dicom_idx = [i for i, r in enumerate(records) if r.format == "dicom"]
    if len(dicom_idx) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor() as ex:
            for i, v in zip(
                dicom_idx,
                ex.map(
                    lambda i: load_patient_volume(
                        records[i], spatial_size, zero_slices
                    ),
                    dicom_idx,
                ),
            ):
                out[i] = v

    for i, v in enumerate(out):  # numpy fallback / serial remainder
        if v is None:
            out[i] = load_patient_volume(records[i], spatial_size, zero_slices)
    return np.stack(out, axis=0)
