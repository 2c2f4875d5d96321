"""Minimal DICOM series reader (pure python, no GDCM/SimpleITK).

Covers the role SimpleITK's C++ GDCM stack plays in the reference
(/root/reference/data/utils.py:16-37 loadImage/loadMask and
s3utils.py:244-265 readSitk): read a directory of single-frame .dcm slice
files, sort them into a volume, and apply rescale slope/intercept.

Supported transfer syntaxes: Implicit VR Little Endian (1.2.840.10008.1.2)
and Explicit VR Little Endian (1.2.840.10008.1.2.1) with uncompressed
8/16-bit pixel data — the common export format for the MRI/DicomRT data the
reference handles. Compressed syntaxes raise with a clear message.

Slice ordering: by ImagePositionPatient projected on the slice normal when
available, else InstanceNumber — matching GDCM's series sorting behavior.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np

IMPLICIT_LE = "1.2.840.10008.1.2"
EXPLICIT_LE = "1.2.840.10008.1.2.1"

# VRs with 4-byte length (explicit VR encoding)
_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN", b"UC", b"UR", b"OD", b"OL"}


@dataclass
class DicomSlice:
    rows: int = 0
    cols: int = 0
    bits_allocated: int = 16
    pixel_representation: int = 0
    rescale_slope: float = 1.0
    rescale_intercept: float = 0.0
    instance_number: int = 0
    number_of_frames: int = 1  # >1: multi-frame file (e.g. DicomRT masks)
    position: tuple | None = None
    orientation: tuple | None = None
    pixel_data: bytes = b""
    extra: dict = field(default_factory=dict)


def _parse_elements(buf: bytes, offset: int, explicit: bool, stop_at_pixels=True):
    """Yield (group, element, value_bytes) until exhaustion."""
    n = len(buf)
    while offset + 8 <= n:
        group, element = struct.unpack_from("<HH", buf, offset)
        offset += 4
        if explicit or group == 0x0002:
            vr = buf[offset : offset + 2]
            if vr in _LONG_VRS:
                (length,) = struct.unpack_from("<I", buf, offset + 4)
                offset += 8
            elif vr.isalpha() and vr.isupper():
                (length,) = struct.unpack_from("<H", buf, offset + 2)
                offset += 4
            else:  # implicit element inside an explicit stream (rare)
                (length,) = struct.unpack_from("<I", buf, offset - 4 + 4)
                offset += 4
        else:
            (length,) = struct.unpack_from("<I", buf, offset)
            offset += 4
        if length == 0xFFFFFFFF:
            raise ValueError(
                "Undefined-length element (compressed/sequence pixel data?) "
                "— only uncompressed LE transfer syntaxes are supported"
            )
        value = buf[offset : offset + length]
        offset += length
        yield group, element, value
        if stop_at_pixels and (group, element) == (0x7FE0, 0x0010):
            return


def _read_meta(buf: bytes):
    """Parse the file-meta group; returns (transfer_syntax, dataset_offset)."""
    if buf[128:132] != b"DICM":
        # Some files omit the preamble; try from byte 0 as implicit LE.
        return IMPLICIT_LE, 0
    transfer_syntax = EXPLICIT_LE
    pos = 132
    n = len(buf)
    while pos + 8 <= n:
        group, element = struct.unpack_from("<HH", buf, pos)
        if group != 0x0002:
            break
        vr = buf[pos + 4 : pos + 6]
        if vr in _LONG_VRS:
            (length,) = struct.unpack_from("<I", buf, pos + 8)
            value = buf[pos + 12 : pos + 12 + length]
            pos += 12 + length
        else:
            (length,) = struct.unpack_from("<H", buf, pos + 6)
            value = buf[pos + 8 : pos + 8 + length]
            pos += 8 + length
        if element == 0x0010:
            transfer_syntax = value.decode("ascii", "ignore").strip("\x00 ")
    return transfer_syntax, pos


def read_dicom_file(path: str) -> DicomSlice:
    with open(path, "rb") as f:
        buf = f.read()
    syntax, offset = _read_meta(buf)
    if syntax not in (IMPLICIT_LE, EXPLICIT_LE):
        raise ValueError(
            f"{path}: unsupported transfer syntax {syntax} (compressed DICOM "
            "is out of scope; convert to uncompressed or NIfTI)"
        )
    explicit = syntax == EXPLICIT_LE

    s = DicomSlice()
    for group, element, value in _parse_elements(buf, offset, explicit):
        tag = (group, element)
        if tag == (0x0028, 0x0010):
            s.rows = struct.unpack("<H", value[:2])[0]
        elif tag == (0x0028, 0x0011):
            s.cols = struct.unpack("<H", value[:2])[0]
        elif tag == (0x0028, 0x0100):
            s.bits_allocated = struct.unpack("<H", value[:2])[0]
        elif tag == (0x0028, 0x0103):
            s.pixel_representation = struct.unpack("<H", value[:2])[0]
        elif tag == (0x0028, 0x1052):
            s.rescale_intercept = float(value.decode("ascii", "ignore").strip() or 0)
        elif tag == (0x0028, 0x1053):
            s.rescale_slope = float(value.decode("ascii", "ignore").strip() or 1)
        elif tag == (0x0020, 0x0013):
            try:
                s.instance_number = int(value.decode("ascii", "ignore").strip())
            except ValueError:
                pass
        elif tag == (0x0028, 0x0008):
            try:
                s.number_of_frames = int(value.decode("ascii", "ignore").strip())
            except ValueError:
                pass
        elif tag == (0x0020, 0x0032):
            parts = value.decode("ascii", "ignore").strip().split("\\")
            if len(parts) == 3:
                s.position = tuple(float(p) for p in parts)
        elif tag == (0x0020, 0x0037):
            parts = value.decode("ascii", "ignore").strip().split("\\")
            if len(parts) == 6:
                s.orientation = tuple(float(p) for p in parts)
        elif tag == (0x7FE0, 0x0010):
            s.pixel_data = value
    if not s.pixel_data or not s.rows:
        raise ValueError(f"{path}: no pixel data found")
    return s


def _slice_array(s: DicomSlice) -> np.ndarray:
    """Pixel data -> (rows, cols) or, for multi-frame files (e.g. DicomRT
    segmentation masks, which GDCM surfaced as 4D-with-singleton to the
    reference — /root/reference/data/s3utils.py:261-265), (frames, rows, cols).
    """
    if s.bits_allocated == 16:
        dtype = np.int16 if s.pixel_representation else np.uint16
    elif s.bits_allocated == 8:
        dtype = np.int8 if s.pixel_representation else np.uint8
    else:
        raise ValueError(f"unsupported BitsAllocated {s.bits_allocated}")
    frames = max(1, s.number_of_frames)
    arr = np.frombuffer(s.pixel_data, dtype=dtype, count=frames * s.rows * s.cols)
    if frames > 1:
        arr = arr.reshape(frames, s.rows, s.cols).astype(np.float32)
    else:
        arr = arr.reshape(s.rows, s.cols).astype(np.float32)
    if s.rescale_slope != 1.0 or s.rescale_intercept != 0.0:
        arr = arr * s.rescale_slope + s.rescale_intercept
    return arr


def load_dicom_series(path: str) -> np.ndarray:
    """Read a DICOM series into a (slices, rows, cols) float32 volume.

    `path` is a directory of single-frame slice files (sorted into a volume),
    a directory containing one multi-frame file, or a single .dcm file
    (multi-frame masks load as (frames, rows, cols); single-frame as
    (1, rows, cols)). Covers readSitk's role
    (/root/reference/data/s3utils.py:244-265) including the 4D-singleton
    squeeze for DicomRT masks.
    """
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".") and f.lower().endswith((".dcm", ".ima"))
        )
        if not files:
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith(".") and os.path.isfile(os.path.join(path, f))
            )
    slices = [read_dicom_file(f) for f in files]
    if not slices:
        raise ValueError(f"no DICOM slices found in {path}")

    if len(slices) == 1 and slices[0].number_of_frames > 1:
        return _slice_array(slices[0])  # multi-frame file IS the volume

    if all(s.position is not None and s.orientation is not None for s in slices):
        normal = np.cross(
            np.asarray(slices[0].orientation[:3]),
            np.asarray(slices[0].orientation[3:]),
        )
        slices.sort(key=lambda s: float(np.dot(normal, np.asarray(s.position))))
    else:
        slices.sort(key=lambda s: s.instance_number)

    arrs = [_slice_array(s) for s in slices]
    return np.concatenate(
        [a[None] if a.ndim == 2 else a for a in arrs], axis=0
    )
