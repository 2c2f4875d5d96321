"""Synthetic cohort fixtures: clinical CSV, patient key, T1/T2 NIfTI trees.

Mirrors the schemas the reference expects (clinical columns from
data/constants.py, patient-folder layout from ImageDatasets.py) so the full
pipeline can run hermetically.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from mmnn_sts_tpu import constants as C
from mmnn_sts_tpu.data.dicom import EXPLICIT_LE, IMPLICIT_LE
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


# --- synthetic DICOM writers (explicit/implicit LE, uncompressed) ----------


def dicom_el_explicit(group, element, vr, value: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"UT", b"UN"):
        return struct.pack("<HH2sHI", group, element, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, element, vr, len(value)) + value


def dicom_el_implicit(group, element, value: bytes) -> bytes:
    return struct.pack("<HHI", group, element, len(value)) + value


def dicom_meta(transfer_syntax: str) -> bytes:
    ts = transfer_syntax.encode()
    if len(ts) % 2:
        ts += b"\x00"
    return b"\x00" * 128 + b"DICM" + dicom_el_explicit(0x0002, 0x0010, b"UI", ts)


def write_dicom_slice(path, pixel: np.ndarray, explicit=True, instance=1,
                      z=0.0, slope=1.0, inter=0.0, origin_xy=(0.0, 0.0),
                      pixel_spacing=None):
    """One single-frame .dcm slice file (int16 pixels).

    pixel_spacing=(row, col) adds the (0028,0030) tag, completing the
    series geometry (data/dicom.SeriesGeometry); None omits it (legacy
    array-space fixtures)."""
    rows, cols = pixel.shape
    parts = [dicom_meta(EXPLICIT_LE if explicit else IMPLICIT_LE)]
    el = dicom_el_explicit if explicit else (
        lambda g, e, vr, v: dicom_el_implicit(g, e, v)
    )
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(
        0x0020, 0x0032, b"DS",
        f"{origin_xy[0]}\\{origin_xy[1]}\\{z}".encode(),
    ))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", 16)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 1)))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))
    if slope != 1.0 or inter != 0.0:
        parts.append(el(0x0028, 0x1052, b"DS", str(inter).encode()))
        parts.append(el(0x0028, 0x1053, b"DS", str(slope).encode()))
    parts.append(el(0x7FE0, 0x0010, b"OW", pixel.astype("<i2").tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def write_dicom_multiframe(path, volume: np.ndarray, position=None,
                           pixel_spacing=None, grid_offsets=None):
    """One multi-frame .dcm file (the DicomRT-mask shape: 0/255 values).

    position/pixel_spacing/grid_offsets add the geometry tags
    (ImagePositionPatient, PixelSpacing, GridFrameOffsetVector) so the
    physical-space resample path activates; omitted = legacy no-geometry
    fixture."""
    frames, rows, cols = volume.shape
    el = dicom_el_explicit
    parts = [dicom_meta(EXPLICIT_LE)]
    parts.append(el(0x0028, 0x0008, b"IS", str(frames).encode()))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", 16)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 1)))
    if position is not None:
        parts.append(el(
            0x0020, 0x0032, b"DS",
            "\\".join(str(p) for p in position).encode(),
        ))
        parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))
    if grid_offsets is not None:
        parts.append(el(
            0x3004, 0x000C, b"DS",
            "\\".join(str(o) for o in grid_offsets).encode(),
        ))
    parts.append(el(0x7FE0, 0x0010, b"OW", volume.astype("<i2").tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def write_dicom_jpeg_lossless(path, pixel: np.ndarray, instance=1, z=0.0,
                              signed=False, n_fragments=1, frames=None,
                              predictor=1, pixel_spacing=None):
    """A JPEG-Lossless (1.2.840.10008.1.2.4.70) .dcm file with encapsulated
    pixel data. pixel: (rows, cols) single frame, or (frames, rows, cols)
    multi-frame when `frames` is truthy; n_fragments>1 splits the (single)
    frame's stream across fragments."""
    from mmnn_sts_tpu.data.dicom import JPEG_LOSSLESS_SV1
    from mmnn_sts_tpu.data.jpeg_lossless import encode_jpeg_lossless_sv1

    el = dicom_el_explicit
    parts = [dicom_meta(JPEG_LOSSLESS_SV1)]
    if frames:
        nframes, rows, cols = pixel.shape
        parts.append(el(0x0028, 0x0008, b"IS", str(nframes).encode()))
        streams = [
            encode_jpeg_lossless_sv1(pixel[k].astype(np.uint16), 16,
                                     predictor=predictor)
            for k in range(nframes)
        ]
    else:
        rows, cols = pixel.shape
        streams = [encode_jpeg_lossless_sv1(pixel.astype(np.uint16), 16,
                                            predictor=predictor)]
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", 16)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0)))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))

    # encapsulated pixel data: undefined length + item sequence (PS3.5 A.4)
    parts.append(struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF))
    fragments = []
    for st in streams:
        if n_fragments > 1:
            cut = (len(st) // n_fragments + 1) & ~1  # even split points
            fragments += [st[i:i + cut] for i in range(0, len(st), cut)]
        else:
            fragments.append(st)
    fragments = [f + (b"\x00" if len(f) % 2 else b"") for f in fragments]
    bot = b""  # empty Basic Offset Table item (1 fragment per frame, or
    # a single frame split across fragments — both BOT-free mappings)
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, len(bot)) + bot)
    for f in fragments:
        parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, len(f)) + f)
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def write_dicom_rle(path, pixel: np.ndarray, instance=1, z=0.0,
                    signed=False, frames=None, bits=16, pixel_spacing=None):
    """An RLE Lossless (1.2.840.10008.1.2.5) .dcm file with encapsulated
    pixel data — one fragment per frame, as PS3.5 Annex G requires.
    pixel: (rows, cols) single frame, or (frames, rows, cols) multi-frame
    when `frames` is truthy."""
    from mmnn_sts_tpu.data.dicom import RLE_LOSSLESS
    from mmnn_sts_tpu.data.dicom_rle import encode_rle_frame

    el = dicom_el_explicit
    parts = [dicom_meta(RLE_LOSSLESS)]
    if frames:
        nframes, rows, cols = pixel.shape
        parts.append(el(0x0028, 0x0008, b"IS", str(nframes).encode()))
        streams = [encode_rle_frame(pixel[k], bits) for k in range(nframes)]
    else:
        rows, cols = pixel.shape
        streams = [encode_rle_frame(pixel, bits)]
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", bits)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0)))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))
    parts.append(struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF))
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, 0))  # empty BOT
    for st in streams:
        st += b"\x00" if len(st) % 2 else b""
        parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, len(st)) + st)
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def write_dicom_jpeg_ls(path, pixel: np.ndarray, instance=1, z=0.0,
                        signed=False, frames=None, bits=16, near=0,
                        pixel_spacing=None):
    """A JPEG-LS (1.2.840.10008.1.2.4.80/.81) .dcm file with encapsulated
    pixel data — one fragment per frame. near>0 selects the near-lossless
    transfer syntax UID."""
    from mmnn_sts_tpu.data.dicom import JPEG_LS_LOSSLESS, JPEG_LS_NEAR
    from mmnn_sts_tpu.data.jpeg_ls import encode_jpeg_ls

    el = dicom_el_explicit
    parts = [dicom_meta(JPEG_LS_NEAR if near else JPEG_LS_LOSSLESS)]
    if frames:
        nframes, rows, cols = pixel.shape
        parts.append(el(0x0028, 0x0008, b"IS", str(nframes).encode()))
        streams = [encode_jpeg_ls(pixel[k], bits, near=near)
                   for k in range(nframes)]
    else:
        rows, cols = pixel.shape
        streams = [encode_jpeg_ls(pixel, bits, near=near)]
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", bits)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0)))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))
    parts.append(struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF))
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, 0))  # empty BOT
    for st in streams:
        st += b"\x00" if len(st) % 2 else b""
        parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, len(st)) + st)
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def make_dicom_tree(root: str, anon_ids, shape=(12, 14, 12), seed: int = 0):
    """Per-patient DICOM layout (S3DicomDataset's expected structure,
    /root/reference/data/ImageDatasets.py:101-126): <anon>/image/*.dcm
    single-frame slices + <anon>/mask/mask.dcm multi-frame 0/255 DicomRT."""
    rng = np.random.default_rng(seed)
    for anon in anon_ids:
        img_dir = os.path.join(root, anon, "image")
        mask_dir = os.path.join(root, anon, "mask")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        vol = (rng.normal(size=shape) ** 2 * 500).astype(np.int16)
        for z in range(shape[0]):
            write_dicom_slice(
                os.path.join(img_dir, f"s{z:03d}.dcm"), vol[z],
                instance=z + 1, z=float(z) * 2.0,
            )
        mask = np.zeros(shape, dtype=np.int16)
        mask[2:-2, 3:-3, 2:-2] = 255
        write_dicom_multiframe(os.path.join(mask_dir, "mask.dcm"), mask)


def make_dicom_cohort(root: str, n: int = 24, seed: int = 0):
    """clinical.csv + key.csv + t1/ t2/ DICOM trees (image_format: dicom)."""
    os.makedirs(root, exist_ok=True)
    clin = os.path.join(root, "clinical.csv")
    key = os.path.join(root, "key.csv")
    uids = make_clinical_csv(clin, n, seed)
    anon = make_patient_key(key, uids)
    t1 = os.path.join(root, "t1")
    t2 = os.path.join(root, "t2")
    make_dicom_tree(t1, anon, seed=seed + 1)
    make_dicom_tree(t2, anon, seed=seed + 2)
    return {"clinical": clin, "key": key, "t1": t1, "t2": t2, "root": root}, uids


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


def write_dicom_j2k(path, pixel: np.ndarray, instance=1, z=0.0,
                    signed=False, frames=None, bits=16,
                    pixel_spacing=None, jp2=False, encoder=None,
                    syntax=None, irreversible=False, qdrop=0):
    """A JPEG 2000 .dcm file — 1.2.840.10008.1.2.4.90 (lossless) by
    default, or any J2K syntax via `syntax` — with encapsulated pixel
    data, one fragment per frame. jp2=True wraps each codestream in a JP2
    container (non-conformant but seen in the wild). irreversible=True
    encodes 9/7-quantized codestreams (pass syntax=J2K for a conformant
    .91 file). encoder: optional frame->codestream callable (e.g. an
    independent OpenJPEG encode for conformance tests)."""
    from mmnn_sts_tpu.data.dicom import J2K_LOSSLESS
    from mmnn_sts_tpu.data.jpeg2000 import encode_j2k

    if syntax is None:
        syntax = J2K_LOSSLESS

    def enc(frame):
        if encoder is not None:
            blob = encoder(frame)
        else:
            blob = encode_j2k(frame, bits, signed=signed,
                              irreversible=irreversible, qdrop=qdrop)
        if jp2:
            sig = bytes.fromhex("0000000C6A5020200D0A870A")
            ftyp = struct.pack(">I", 20) + b"ftypjp2 " + struct.pack(">I", 0) + b"jp2 "
            jp2c = struct.pack(">I", 8 + len(blob)) + b"jp2c" + blob
            blob = sig + ftyp + jp2c
        return blob

    el = dicom_el_explicit
    parts = [dicom_meta(syntax)]
    if frames:
        nframes, rows, cols = pixel.shape
        parts.append(el(0x0028, 0x0008, b"IS", str(nframes).encode()))
        streams = [enc(pixel[k]) for k in range(nframes)]
    else:
        rows, cols = pixel.shape
        streams = [enc(pixel)]
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", bits)))
    parts.append(el(0x0028, 0x0103, b"US",
                    struct.pack("<H", 1 if signed else 0)))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))
    parts.append(struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF))
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, 0))  # empty BOT
    for st in streams:
        st += b"\x00" if len(st) % 2 else b""
        parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, len(st)) + st)
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def write_dicom_jpeg_baseline(path, pixel: np.ndarray, instance=1, z=0.0,
                              frames=None, bits=8, quant=1,
                              pixel_spacing=None):
    """A lossy JPEG .dcm file — 1.2.840.10008.1.2.4.50 (baseline, 8-bit)
    or .51 (extended sequential, 12-bit) chosen from `bits`."""
    from mmnn_sts_tpu.data.dicom import JPEG_BASELINE, JPEG_EXTENDED
    from mmnn_sts_tpu.data.jpeg_baseline import encode_jpeg_baseline

    uid = JPEG_BASELINE if bits == 8 else JPEG_EXTENDED
    alloc = 8 if bits == 8 else 16
    el = dicom_el_explicit
    parts = [dicom_meta(uid)]
    if frames:
        nframes, rows, cols = pixel.shape
        parts.append(el(0x0028, 0x0008, b"IS", str(nframes).encode()))
        streams = [encode_jpeg_baseline(pixel[k], bits, quant=quant)
                   for k in range(nframes)]
    else:
        rows, cols = pixel.shape
        streams = [encode_jpeg_baseline(pixel, bits, quant=quant)]
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", alloc)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 0)))
    if pixel_spacing is not None:
        parts.append(el(
            0x0028, 0x0030, b"DS",
            f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode(),
        ))
    parts.append(struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF))
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, 0))  # empty BOT
    for st in streams:
        st += b"\x00" if len(st) % 2 else b""
        parts.append(struct.pack("<HHI", 0xFFFE, 0xE000, len(st)) + st)
    parts.append(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def write_dicom_deflated(path, pixel: np.ndarray, instance=1, z=0.0,
                         pixel_spacing=None):
    """A Deflated Explicit VR LE (1.2.840.10008.1.2.1.99) .dcm file: the
    dataset after the meta group is one raw-deflate stream (PS3.5 A.5)."""
    import zlib

    from mmnn_sts_tpu.data.dicom import DEFLATED_LE

    rows, cols = pixel.shape
    el = dicom_el_explicit
    ds = [
        el(0x0020, 0x0013, b"IS", str(instance).encode()),
        el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()),
        el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"),
        el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
    ]
    if pixel_spacing is not None:
        ds.append(el(0x0028, 0x0030, b"DS",
                     f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode()))
    ds.append(el(0x7FE0, 0x0010, b"OW", pixel.astype("<i2").tobytes()))
    comp = zlib.compressobj(wbits=-15)
    deflated = comp.compress(b"".join(ds)) + comp.flush()
    with open(path, "wb") as f:
        f.write(dicom_meta(DEFLATED_LE) + deflated)


def _dicom_el_explicit_be(group, element, vr, value: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"UT", b"UN"):
        return struct.pack(">HH2sHI", group, element, vr, 0,
                           len(value)) + value
    return struct.pack(">HH2sH", group, element, vr, len(value)) + value


def write_dicom_big_endian(path, pixel: np.ndarray, instance=1, z=0.0,
                           pixel_spacing=None):
    """A retired Explicit VR Big Endian (1.2.840.10008.1.2.2) .dcm file —
    big-endian tags, lengths, US values, and 16-bit pixel words (the meta
    group itself stays little-endian per PS3.5 7.3)."""
    from mmnn_sts_tpu.data.dicom import EXPLICIT_BE

    rows, cols = pixel.shape
    el = _dicom_el_explicit_be
    parts = [dicom_meta(EXPLICIT_BE)]
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack(">H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack(">H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack(">H", 16)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack(">H", 1)))
    if pixel_spacing is not None:
        parts.append(el(0x0028, 0x0030, b"DS",
                        f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode()))
    parts.append(el(0x7FE0, 0x0010, b"OW", pixel.astype(">i2").tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(parts))
