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

from fixtures import dicom_meta as _meta, write_dicom_slice as _write_slice


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
