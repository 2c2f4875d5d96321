"""JPEG-LS (ITU-T T.87) codec + DICOM integration tests.

The reference decoded JPEG-LS implicitly through SimpleITK/GDCM+CharLS
(/root/reference/data/s3utils.py:244-265); data/jpeg_ls.py implements
LOCO-I from the public spec. Round-trips pin encoder and decoder against
each other across the coding modes (regular/run/interruption), bit
depths, NEAR values, and the 0xFF bit-stuffing boundary; structural
tests pin the header/LSE parse and the near-lossless error bound, which
hold independently of the encoder.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fixtures import write_dicom_jpeg_ls  # noqa: E402

from mmnn_sts_tpu.data.dicom import load_dicom_series, read_dicom_file  # noqa: E402
from mmnn_sts_tpu.data.jpeg_ls import (  # noqa: E402
    LSE,
    SOF55,
    decode_jpeg_ls,
    encode_jpeg_ls,
)


@pytest.fixture
def rng():
    return np.random.default_rng(5)


@pytest.mark.parametrize("bits", [2, 8, 12, 16])
def test_roundtrip_random(rng, bits):
    img = rng.integers(0, 1 << bits, size=(23, 19)).astype(np.uint16)
    np.testing.assert_array_equal(decode_jpeg_ls(encode_jpeg_ls(img, bits)), img)


def test_roundtrip_smooth_compresses(rng):
    """Smooth gradients exercise regular mode + bias correction and must
    beat raw size decisively (LOCO-I's whole point)."""
    x = np.linspace(0, 3000, 64)
    img = (x[None, :] + 2 * x[:48, None] / 3).astype(np.uint16)
    img += rng.integers(0, 3, size=img.shape).astype(np.uint16)
    blob = encode_jpeg_ls(img, 16)
    assert len(blob) < img.nbytes // 3
    np.testing.assert_array_equal(decode_jpeg_ls(blob), img)


def test_roundtrip_mask_runs(rng):
    """Flat regions exercise run mode, run-index adaptation, and
    run-interruption coding at the region borders."""
    img = np.zeros((50, 70), np.uint16)
    img[7:40, 10:60] = 255
    img[20, 15:55] = rng.integers(0, 65536, 40)  # literal row inside the run
    blob = encode_jpeg_ls(img, 16)
    assert len(blob) < img.nbytes // 8
    np.testing.assert_array_equal(decode_jpeg_ls(blob), img)


def test_roundtrip_worst_case_alternating():
    """Max-amplitude alternating pixels drive the Golomb escape path
    (LIMIT-coded values) and the 0xFF bit-stuffing in the dense stream."""
    img = np.tile(np.array([[0, 65535]], np.uint16), (9, 40))[:, :79]
    blob = encode_jpeg_ls(img, 16)
    np.testing.assert_array_equal(decode_jpeg_ls(blob), img)


def test_roundtrip_all_ff_values():
    """Constant 0xFFFF image: the entropy stream and padding interact with
    stuffed 0xFF bytes."""
    img = np.full((12, 17), 65535, np.uint16)
    np.testing.assert_array_equal(decode_jpeg_ls(encode_jpeg_ls(img, 16)), img)


def test_single_column_and_row(rng):
    for shape in ((1, 37), (37, 1), (1, 1)):
        img = rng.integers(0, 4096, size=shape).astype(np.uint16)
        np.testing.assert_array_equal(
            decode_jpeg_ls(encode_jpeg_ls(img, 12)), img
        )


@pytest.mark.parametrize("near", [1, 2, 5])
def test_near_lossless_error_bound(rng, near):
    """|reconstruction - original| <= NEAR everywhere — the T.87 guarantee,
    checked against the ORIGINAL samples (independent of decoder bugs that
    would still round-trip)."""
    img = (np.sin(np.arange(30 * 40) / 9.0).reshape(30, 40) * 1900
           + 2000).astype(np.uint16)
    img += rng.integers(0, 7, size=img.shape).astype(np.uint16)
    out = decode_jpeg_ls(encode_jpeg_ls(img, 12, near=near))
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= near
    # and near-lossless must compress harder than lossless
    assert len(encode_jpeg_ls(img, 12, near=near)) < len(encode_jpeg_ls(img, 12))


def test_lse_preset_parameters_roundtrip(rng):
    """An LSE segment with explicit spec-default values decodes identically
    to the implicit defaults (exercises the preset-parameter parse)."""
    img = rng.integers(0, 4096, size=(14, 14)).astype(np.uint16)
    blob = encode_jpeg_ls(img, 12)
    maxval = (1 << 12) - 1
    lse = bytes((0xFF, LSE)) + (13).to_bytes(2, "big") + bytes((1,)) + \
        maxval.to_bytes(2, "big") + \
        b"".join(v.to_bytes(2, "big") for v in (0, 0, 0, 64))
    # inject after the SOF55 segment
    sof_at = blob.index(bytes((0xFF, SOF55)))
    sof_len = int.from_bytes(blob[sof_at + 2 : sof_at + 4], "big")
    cut = sof_at + 2 + sof_len
    np.testing.assert_array_equal(
        decode_jpeg_ls(blob[:cut] + lse + blob[cut:]), img
    )


def test_rejects_multi_component():
    blob = bytearray(encode_jpeg_ls(np.zeros((4, 4), np.uint16), 8))
    sof_at = blob.index(bytes((0xFF, SOF55)))
    blob[sof_at + 9] = 3  # Nf: claim 3 components
    with pytest.raises(ValueError, match="components"):
        decode_jpeg_ls(bytes(blob))


def test_rejects_truncated_stream():
    with pytest.raises(ValueError, match="truncated|SOI"):
        decode_jpeg_ls(encode_jpeg_ls(np.zeros((4, 4), np.uint16), 8)[:10])


def test_fuzz_roundtrip_mixed_content():
    """Randomized sweep over shapes, bit depths, NEAR values, and content
    mixes (flat/noisy/gradient patches) — every stream must round-trip
    (NEAR=0) or respect the error bound (NEAR>0). Catches mode-transition
    and adaptation-state bugs that curated fixtures miss."""
    rng = np.random.default_rng(123)
    for trial in range(25):
        rows = int(rng.integers(1, 33))
        cols = int(rng.integers(1, 41))
        bits = int(rng.choice([8, 10, 12, 16]))
        near = int(rng.choice([0, 0, 0, 1, 3]))
        maxv = (1 << bits) - 1
        img = np.zeros((rows, cols), np.int64)
        for _ in range(int(rng.integers(1, 5))):
            r0, c0 = rng.integers(0, rows), rng.integers(0, cols)
            r1 = int(rng.integers(r0, rows)) + 1
            c1 = int(rng.integers(c0, cols)) + 1
            kind = rng.integers(0, 3)
            if kind == 0:  # flat patch (runs)
                img[r0:r1, c0:c1] = int(rng.integers(0, maxv + 1))
            elif kind == 1:  # noise patch (regular mode, escapes)
                img[r0:r1, c0:c1] = rng.integers(0, maxv + 1,
                                                 size=(r1 - r0, c1 - c0))
            else:  # gradient patch (bias correction)
                img[r0:r1, c0:c1] = np.linspace(
                    0, maxv, (r1 - r0) * (c1 - c0)
                ).reshape(r1 - r0, c1 - c0).astype(np.int64)
        img = img.astype(np.uint16)
        out = decode_jpeg_ls(encode_jpeg_ls(img, bits, near=near))
        err = np.max(np.abs(out.astype(int) - img.astype(int))) if img.size else 0
        assert err <= near, (trial, rows, cols, bits, near, err)


# --- DICOM integration ------------------------------------------------------


def test_single_frame_jpeg_ls_dicom(tmp_path, rng):
    img = rng.integers(0, 4096, size=(20, 24)).astype(np.uint16)
    p = str(tmp_path / "l.dcm")
    write_dicom_jpeg_ls(p, img)
    s = read_dicom_file(p)
    assert s.fragments is not None
    np.testing.assert_array_equal(
        load_dicom_series(p), img.astype(np.float32)[None]
    )


def test_signed_jpeg_ls_pixels(tmp_path, rng):
    img16 = rng.integers(-2048, 2048, size=(12, 12)).astype(np.int16)
    p = str(tmp_path / "s.dcm")
    write_dicom_jpeg_ls(p, img16.view(np.uint16), signed=True)
    np.testing.assert_array_equal(
        load_dicom_series(p), img16.astype(np.float32)[None]
    )


def test_signed_8bit_jpeg_ls_pixels(tmp_path, rng):
    """8-bit signed: the stored words are 8-bit two's complement, and the
    decoder hands them back in a uint16 array — sign extension must key on
    BitsAllocated, not the array dtype (0xFF is -1, not +255)."""
    img8 = rng.integers(-128, 128, size=(12, 12)).astype(np.int8)
    p = str(tmp_path / "s8.dcm")
    write_dicom_jpeg_ls(p, img8.view(np.uint8), signed=True, bits=8)
    np.testing.assert_array_equal(
        load_dicom_series(p), img8.astype(np.float32)[None]
    )


def test_multiframe_jpeg_ls_mask(tmp_path):
    vol = np.zeros((4, 10, 10), np.uint16)
    vol[1:3, 2:7, 3:8] = 255
    p = str(tmp_path / "m.dcm")
    write_dicom_jpeg_ls(p, vol, frames=True)
    np.testing.assert_array_equal(load_dicom_series(p), vol.astype(np.float32))


def test_jpeg_ls_series_in_pipeline(tmp_path, rng):
    imgs = rng.integers(0, 4096, size=(5, 10, 12)).astype(np.uint16)
    d = tmp_path / "series"
    os.makedirs(d)
    for k in range(5):
        write_dicom_jpeg_ls(str(d / f"s{k}.dcm"), imgs[k], instance=k + 1,
                            z=2.0 * k, pixel_spacing=(1.0, 1.0))
    vol, geom = load_dicom_series(str(d), with_geometry=True)
    np.testing.assert_array_equal(vol, imgs.astype(np.float32))
    np.testing.assert_allclose(geom.z_offsets, [0, 2, 4, 6, 8])


def test_near_lossless_dicom_syntax(tmp_path, rng):
    """The .81 near-lossless UID decodes with the NEAR bound honored."""
    img = rng.integers(0, 4096, size=(16, 16)).astype(np.uint16)
    p = str(tmp_path / "n.dcm")
    write_dicom_jpeg_ls(p, img, near=3)
    out = np.asarray(load_dicom_series(p))[0]
    assert np.max(np.abs(out - img.astype(np.float32))) <= 3


# ---------------------------------------------------------------------------
# Native (C++) fast path: mmnn_jpeg_ls_decode (native/mmnn_native.cpp) must
# agree sample-for-sample with the python decoder and return None (python
# fallback) for anything it does not handle.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def native_mod():
    import subprocess

    from mmnn_sts_tpu.data import native

    if not native.available():
        ndir = str(Path(__file__).resolve().parent.parent / "native")
        rc = subprocess.run(["make", "-C", ndir], capture_output=True)
        assert rc.returncode == 0, rc.stderr.decode()
        native._TRIED = False  # re-probe
    assert native.available(), "libmmnn_native.so missing"
    return native


def _content_cases(rng):
    flat = np.zeros((50, 70), np.uint16)
    flat[7:40, 10:60] = 255
    flat[20, 15:55] = rng.integers(0, 65536, 40)
    x = np.linspace(0, 3000, 64)
    smooth = (x[None, :] + 2 * x[:48, None] / 3).astype(np.uint16)
    return [
        (rng.integers(0, 4, size=(23, 19)).astype(np.uint16), 2, 0),
        (rng.integers(0, 256, size=(23, 19)).astype(np.uint16), 8, 0),
        (rng.integers(0, 65536, size=(23, 19)).astype(np.uint16), 16, 0),
        (flat, 16, 0),  # run mode + interruption coding
        (smooth, 16, 0),  # regular mode + bias correction
        (rng.integers(0, 4096, size=(31, 17)).astype(np.uint16), 12, 2),
        (np.full((9, 9), 65535, np.uint16), 16, 0),  # 0xFF bit stuffing
        (rng.integers(0, 256, size=(40, 1)).astype(np.uint16), 8, 0),
        (rng.integers(0, 256, size=(1, 40)).astype(np.uint16), 8, 0),
    ]


def test_native_matches_python_decoder(native_mod, rng):
    for img, bits, near in _content_cases(rng):
        blob = encode_jpeg_ls(img, bits, near)
        py = decode_jpeg_ls(blob)
        nat = native_mod.jpeg_ls_decode_native(blob, *py.shape)
        assert nat is not None
        np.testing.assert_array_equal(nat, py)


def test_native_lse_presets(native_mod, rng):
    img = rng.integers(0, 4096, size=(14, 14)).astype(np.uint16)
    blob = encode_jpeg_ls(img, 12)
    maxval = (1 << 12) - 1
    lse = bytes((0xFF, LSE)) + (13).to_bytes(2, "big") + bytes((1,)) + \
        maxval.to_bytes(2, "big") + \
        b"".join(v.to_bytes(2, "big") for v in (0, 0, 0, 64))
    sof_at = blob.index(bytes((0xFF, SOF55)))
    cut = sof_at + 2 + int.from_bytes(blob[sof_at + 2 : sof_at + 4], "big")
    nat = native_mod.jpeg_ls_decode_native(blob[:cut] + lse + blob[cut:],
                                           14, 14)
    assert nat is not None
    np.testing.assert_array_equal(nat, img)


def test_native_falls_back_to_python(native_mod):
    """Streams the native decoder does not handle return None so the caller
    re-decodes (and gets the precise error) through data/jpeg_ls.py."""
    blob = encode_jpeg_ls(np.zeros((4, 4), np.uint16), 8)
    assert native_mod.jpeg_ls_decode_native(blob[:10], 4, 4) is None
    bad = bytearray(blob)
    bad[bad.index(bytes((0xFF, SOF55))) + 9] = 3  # claim 3 components
    assert native_mod.jpeg_ls_decode_native(bytes(bad), 4, 4) is None


def test_native_shape_mismatch_raises(native_mod, rng):
    img = rng.integers(0, 256, size=(6, 8)).astype(np.uint16)
    blob = encode_jpeg_ls(img, 8)
    with pytest.raises(ValueError, match="DICOM says"):
        native_mod.jpeg_ls_decode_native(blob, 8, 6)
