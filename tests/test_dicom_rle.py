"""RLE Lossless (1.2.840.10008.1.2.5) codec + DICOM integration tests.

The reference decoded RLE implicitly through SimpleITK/GDCM
(/root/reference/data/s3utils.py:244-265); data/dicom_rle.py implements
it from the public PS3.5 Annex G spec. Round-trips go through a
from-scratch encoder (also dicom_rle.py), so decoder and encoder check
each other; the worst-case/no-run streams pin the PackBits control-byte
semantics directly.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fixtures import write_dicom_rle  # noqa: E402

from mmnn_sts_tpu.data.dicom import load_dicom_series, read_dicom_file  # noqa: E402
from mmnn_sts_tpu.data.dicom_rle import (  # noqa: E402
    decode_rle_frame,
    encode_rle_frame,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("bits", [8, 16])
def test_codec_roundtrip_random(rng, bits):
    img = rng.integers(0, 2 ** bits, size=(21, 17)).astype(
        np.uint8 if bits == 8 else np.uint16
    )
    out = decode_rle_frame(encode_rle_frame(img, bits), 21, 17, bits)
    np.testing.assert_array_equal(out, img)


def test_codec_roundtrip_runs(rng):
    """Long replicate runs (a masky image) exercise the 128-byte run cap."""
    img = np.zeros((40, 50), np.uint16)
    img[10:30, 5:45] = 255
    img[15, :] = rng.integers(0, 65536, 50)  # one noisy literal row
    frame = encode_rle_frame(img, 16)
    assert len(frame) < img.nbytes // 2  # actually compresses
    np.testing.assert_array_equal(decode_rle_frame(frame, 40, 50, 16), img)


def test_codec_worst_case_alternating():
    """Alternating bytes produce pure literal runs (no compression)."""
    img = np.tile(np.array([[0, 65535]], np.uint16), (8, 64))[:, :127]
    frame = encode_rle_frame(img, 16)
    np.testing.assert_array_equal(decode_rle_frame(frame, 8, 127, 16), img)


def test_decoder_rejects_truncated_segment():
    img = np.full((6, 6), 7, np.uint16)
    frame = bytearray(encode_rle_frame(img, 16))
    with pytest.raises(ValueError, match="RLE"):
        decode_rle_frame(bytes(frame[:-3]), 6, 6, 16)


def test_decoder_rejects_wrong_segment_count():
    img = np.full((4, 4), 3, np.uint8)
    frame = encode_rle_frame(img, 8)  # 1 segment
    with pytest.raises(ValueError, match="segments"):
        decode_rle_frame(frame, 4, 4, 16)  # 16-bit expects 2


def test_single_frame_rle_dicom(tmp_path, rng):
    img = rng.integers(0, 4096, size=(20, 24)).astype(np.uint16)
    p = str(tmp_path / "r.dcm")
    write_dicom_rle(p, img)
    s = read_dicom_file(p)
    assert s.fragments is not None
    np.testing.assert_array_equal(
        load_dicom_series(p), img.astype(np.float32)[None]
    )


def test_signed_rle_pixels(tmp_path, rng):
    img16 = rng.integers(-2048, 2048, size=(12, 12)).astype(np.int16)
    p = str(tmp_path / "s.dcm")
    write_dicom_rle(p, img16.view(np.uint16), signed=True)
    np.testing.assert_array_equal(
        load_dicom_series(p), img16.astype(np.float32)[None]
    )


def test_multiframe_rle_mask(tmp_path):
    """Multi-frame DicomRT-style mask: one fragment per frame (PS3.5 G)."""
    vol = np.zeros((4, 10, 10), np.uint16)
    vol[1:3, 2:7, 3:8] = 255
    p = str(tmp_path / "m.dcm")
    write_dicom_rle(p, vol, frames=True)
    np.testing.assert_array_equal(load_dicom_series(p), vol.astype(np.float32))


def test_rle_series_in_pipeline(tmp_path, rng):
    """A directory of RLE slices sorts/stacks/georegisters like uncompressed."""
    imgs = rng.integers(0, 4096, size=(5, 10, 12)).astype(np.uint16)
    d = tmp_path / "series"
    os.makedirs(d)
    for k in range(5):
        write_dicom_rle(str(d / f"s{k}.dcm"), imgs[k], instance=k + 1,
                        z=2.0 * k, pixel_spacing=(1.0, 1.0))
    vol, geom = load_dicom_series(str(d), with_geometry=True)
    np.testing.assert_array_equal(vol, imgs.astype(np.float32))
    assert geom is not None
    np.testing.assert_allclose(geom.z_offsets, [0, 2, 4, 6, 8])


def test_eight_bit_rle_dicom(tmp_path, rng):
    img = rng.integers(0, 256, size=(9, 11)).astype(np.uint8)
    p = str(tmp_path / "b.dcm")
    write_dicom_rle(p, img, bits=8)
    np.testing.assert_array_equal(
        load_dicom_series(p), img.astype(np.float32)[None]
    )
