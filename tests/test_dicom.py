"""DICOM reader tests against hand-built explicit/implicit-LE files."""

import os
import struct

import numpy as np
import pytest

from mmnn_sts_tpu.data.dicom import (
    EXPLICIT_LE,
    IMPLICIT_LE,
    load_dicom_series,
    read_dicom_file,
)


def _el_explicit(group, element, vr, value: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"UT", b"UN"):
        return struct.pack("<HH2sHI", group, element, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, element, vr, len(value)) + value


def _el_implicit(group, element, value: bytes) -> bytes:
    return struct.pack("<HHI", group, element, len(value)) + value


def _meta(transfer_syntax: str) -> bytes:
    ts = transfer_syntax.encode()
    if len(ts) % 2:
        ts += b"\x00"
    return b"\x00" * 128 + b"DICM" + _el_explicit(0x0002, 0x0010, b"UI", ts)


def _write_slice(path, pixel: np.ndarray, explicit: bool, instance: int,
                 z: float, slope=1.0, inter=0.0):
    rows, cols = pixel.shape
    parts = [_meta(EXPLICIT_LE if explicit else IMPLICIT_LE)]
    el = (lambda g, e, vr, v: _el_explicit(g, e, vr, v)) if explicit else (
        lambda g, e, vr, v: _el_implicit(g, e, v)
    )
    parts.append(el(0x0020, 0x0013, b"IS", str(instance).encode()))
    parts.append(el(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode()))
    parts.append(el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    parts.append(el(0x0028, 0x0010, b"US", struct.pack("<H", rows)))
    parts.append(el(0x0028, 0x0011, b"US", struct.pack("<H", cols)))
    parts.append(el(0x0028, 0x0100, b"US", struct.pack("<H", 16)))
    parts.append(el(0x0028, 0x0103, b"US", struct.pack("<H", 1)))
    if slope != 1.0 or inter != 0.0:
        parts.append(el(0x0028, 0x1052, b"DS", str(inter).encode()))
        parts.append(el(0x0028, 0x1053, b"DS", str(slope).encode()))
    parts.append(el(0x7FE0, 0x0010, b"OW", pixel.astype("<i2").tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(parts))


@pytest.mark.parametrize("explicit", [True, False])
def test_series_roundtrip(tmp_path, rng, explicit):
    vols = []
    for i in range(4):
        sl = rng.integers(-300, 300, size=(6, 8)).astype(np.int16)
        vols.append(sl)
        # write out of order; z increases with instance
        _write_slice(str(tmp_path / f"s{3 - i}.dcm"), sl, explicit,
                     instance=i + 1, z=float(i) * 2.5)
    vol = load_dicom_series(str(tmp_path))
    assert vol.shape == (4, 6, 8)
    np.testing.assert_allclose(vol, np.stack(vols).astype(np.float32))


def test_rescale_applied(tmp_path, rng):
    sl = rng.integers(0, 100, size=(4, 4)).astype(np.int16)
    p = str(tmp_path / "s.dcm")
    _write_slice(p, sl, True, 1, 0.0, slope=2.0, inter=-100.0)
    s = read_dicom_file(p)
    from mmnn_sts_tpu.data.dicom import _slice_array

    np.testing.assert_allclose(
        _slice_array(s), sl.astype(np.float32) * 2.0 - 100.0
    )


def test_unsupported_syntax_raises(tmp_path):
    blob = _meta("1.2.840.10008.1.2.4.70")  # JPEG lossless
    p = str(tmp_path / "bad.dcm")
    with open(p, "wb") as f:
        f.write(blob)
    with pytest.raises(ValueError, match="unsupported transfer syntax"):
        read_dicom_file(p)
