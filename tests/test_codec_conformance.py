"""Cross-codec conformance: our JPEG/JPEG-2000 codecs vs independent ones.

The round-trip suites (test_jpeg2000.py, test_jpeg_baseline.py, ...) pin our
encoder and decoder against each other, which cannot catch a shared wrong
assumption. These tests close that hole with implementations we did not
write: OpenJPEG (via OpenCV's .jp2 codec) and libjpeg (via Pillow/OpenCV).

- JPEG 2000 Part-1 lossless is bit-exact by construction, so both directions
  assert EXACT equality: OpenJPEG-encoded codestreams decode exactly with
  decode_j2k, and encode_j2k output decodes exactly with OpenJPEG.
- Baseline JPEG (T.81 §A) decoding is exact through entropy decode +
  dequantization; only the IDCT is implementation-defined (T.81 Annex A
  accuracy bounds), so decoder agreement is asserted to ±1 per sample.

The reference inherited all of this behavior from GDCM inside SimpleITK
(/root/reference/data/s3utils.py:244-265); these tests are the evidence that
our from-scratch replacements interoperate with the same ecosystem.
"""

import io
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
PIL_Image = pytest.importorskip("PIL.Image")

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fixtures import write_dicom_j2k  # noqa: E402

from mmnn_sts_tpu.data.dicom import load_dicom_series  # noqa: E402
from mmnn_sts_tpu.data.jpeg2000 import decode_j2k, encode_j2k  # noqa: E402
from mmnn_sts_tpu.data.jpeg_baseline import (  # noqa: E402
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def _openjpeg_encode(img: np.ndarray) -> bytes:
    """Lossless JP2 via OpenCV's OpenJPEG backend (X1000=1000 => reversible)."""
    ok, buf = cv2.imencode(
        ".jp2", img, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000]
    )
    assert ok, "cv2 refused to encode the JP2 fixture"
    return bytes(buf)


@pytest.fixture
def rng():
    return np.random.default_rng(20)


# --------------------------- JPEG 2000 ------------------------------------


@pytest.mark.parametrize(
    "shape,dtype,hi",
    [
        ((32, 40), np.uint16, 4096),   # 12-bit range in a 16-bit container
        ((64, 64), np.uint16, 65536),  # full 16-bit, codeblock-aligned
        ((100, 37), np.uint16, 65536),  # odd dims (partial codeblocks)
        ((256, 200), np.uint16, 65536),  # many codeblocks + resolutions
        ((128, 96), np.uint8, 256),
    ],
)
def test_decodes_openjpeg_streams_exactly(rng, shape, dtype, hi):
    img = rng.integers(0, hi, shape).astype(dtype)
    dec = decode_j2k(_openjpeg_encode(img))
    np.testing.assert_array_equal(dec, img.astype(np.int64))


def test_decodes_openjpeg_smooth_image(rng):
    # Smooth content exercises long MQ runs / cleanup-pass RLC paths.
    x, y = np.meshgrid(np.arange(96), np.arange(80))
    img = (2000 + 1500 * np.sin(x / 11.0) * np.cos(y / 7.0)).astype(np.uint16)
    dec = decode_j2k(_openjpeg_encode(img))
    np.testing.assert_array_equal(dec, img.astype(np.int64))


@pytest.mark.parametrize("depth,hi", [(8, 256), (12, 4096), (16, 65536)])
def test_openjpeg_decodes_our_streams_exactly(rng, depth, hi):
    img = rng.integers(0, hi, (80, 56)).astype(np.int64)
    enc = encode_j2k(img, depth=depth, signed=False)
    dec = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_UNCHANGED)
    assert dec is not None, "OpenJPEG rejected our codestream"
    np.testing.assert_array_equal(dec.astype(np.int64), img)


def test_openjpeg_decodes_our_multilayer_stream(rng):
    img = rng.integers(0, 4096, (64, 72)).astype(np.int64)
    enc = encode_j2k(img, depth=12, signed=False, layers=3)
    dec = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_UNCHANGED)
    assert dec is not None, "OpenJPEG rejected our multi-layer codestream"
    np.testing.assert_array_equal(dec.astype(np.int64), img)


def test_dicom_series_with_openjpeg_pixeldata(tmp_path, rng):
    """End-to-end: a J2K DICOM series whose codestreams came from OpenJPEG
    (not our encoder) loads exactly through the production series reader."""
    # >=32-pixel dims: OpenJPEG refuses tiny frames at its default
    # resolution-level count
    vol = rng.integers(0, 3000, (3, 32, 36)).astype(np.uint16)
    for k in range(3):
        write_dicom_j2k(
            tmp_path / f"s{k}.dcm", vol[k], instance=k + 1, z=float(k),
            encoder=_openjpeg_encode,
        )
    out = load_dicom_series(str(tmp_path))
    np.testing.assert_array_equal(out.astype(np.int64), vol.astype(np.int64))


# --------------------------- baseline JPEG --------------------------------


def _smooth_u8(rng, h=40, w=48):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    img = 128 + 80 * np.sin(x / 7.0) * np.cos(y / 9.0)
    return (img + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [75, 90, 95])
def test_decodes_pil_jpeg_within_idct_tolerance(rng, quality):
    img = _smooth_u8(rng)
    b = io.BytesIO()
    PIL_Image.fromarray(img, "L").save(b, format="JPEG", quality=quality)
    buf = b.getvalue()
    pil_dec = np.asarray(PIL_Image.open(io.BytesIO(buf)))
    ours = decode_jpeg_baseline(buf)
    assert ours.shape == pil_dec.shape
    assert np.abs(ours.astype(int) - pil_dec.astype(int)).max() <= 1


def test_decodes_cv2_jpeg_within_idct_tolerance(rng):
    img = _smooth_u8(rng, h=56, w=64)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    assert ok
    cv_dec = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
    ours = decode_jpeg_baseline(bytes(buf))
    assert np.abs(ours.astype(int) - cv_dec.astype(int)).max() <= 1


def test_pil_decodes_our_jpeg_stream(rng):
    img = _smooth_u8(rng)
    enc = encode_jpeg_baseline(img.astype(np.int64))
    pil_dec = np.asarray(PIL_Image.open(io.BytesIO(enc)))
    ours = decode_jpeg_baseline(enc)
    assert pil_dec.shape == img.shape
    assert np.abs(ours.astype(int) - pil_dec.astype(int)).max() <= 1


# ------------------- JPEG 2000 irreversible (9/7) --------------------------
# Lossy decodes carry no bit-exactness mandate (T.800 leaves the real
# arithmetic implementation-defined), so agreement with OpenJPEG is pinned
# to +-1 per sample — the float-rounding envelope. This also pins the
# decoder's 9/7 scaling convention (a swapped or dropped K step is off by
# K^2 per decomposition level and fails by hundreds of counts).


def _pil_irreversible_encode(img: np.ndarray, **kwargs) -> bytes:
    b = io.BytesIO()
    PIL_Image.fromarray(img, mode="L").save(
        b, "JPEG2000", irreversible=True, **kwargs)
    return b.getvalue()


def test_decodes_openjpeg_irreversible_within_one(rng):
    img = (rng.normal(128, 40, (64, 96)).clip(0, 255)).astype(np.uint8)
    data = _pil_irreversible_encode(img)
    ours = decode_j2k(data)
    opj = np.asarray(PIL_Image.open(io.BytesIO(data))).astype(np.int64)
    assert np.abs(ours - opj).max() <= 1
    # near-lossless stream: also close to the source
    assert np.abs(ours - img.astype(np.int64)).max() <= 2


def test_decodes_openjpeg_rate_limited_lossy_within_one(rng):
    """Aggressive rate control truncates code-blocks mid-bitplane, which
    exercises the per-coefficient midpoint reconstruction exactly where it
    differs from naive dequantization."""
    x, y = np.meshgrid(np.arange(96), np.arange(80))
    img = (128 + 90 * np.sin(x / 9.0) * np.cos(y / 6.0)
           + rng.normal(0, 6, (80, 96))).clip(0, 255).astype(np.uint8)
    data = _pil_irreversible_encode(img, quality_mode="rates",
                                    quality_layers=[12])
    ours = decode_j2k(data)
    opj = np.asarray(PIL_Image.open(io.BytesIO(data))).astype(np.int64)
    assert np.abs(ours - opj).max() <= 1


@pytest.mark.parametrize("derived", [False, True])
def test_openjpeg_decodes_our_irreversible_streams(rng, derived):
    img = (rng.normal(128, 40, (72, 64)).clip(0, 255)).astype(np.int64)
    enc = encode_j2k(img, depth=8, irreversible=True, qdrop=1,
                     derived=derived)
    opj = np.asarray(PIL_Image.open(io.BytesIO(enc))).astype(np.int64)
    ours = decode_j2k(enc)
    assert np.abs(ours - opj).max() <= 1


def test_native_decodes_openjpeg_irreversible_streams(rng):
    """The C++ fast path on third-party irreversible streams: must agree
    exactly with the python oracle (same 9/7 + midpoint arithmetic), which
    the tests above pin to OpenJPEG within +-1."""
    from mmnn_sts_tpu.data import native

    if not native.available():
        pytest.skip("libmmnn_native.so not built")
    img = (rng.normal(128, 40, (80, 72)).clip(0, 255)).astype(np.uint8)
    for kwargs in [{}, {"quality_mode": "rates", "quality_layers": [10]}]:
        data = _pil_irreversible_encode(img, **kwargs)
        nat = native.j2k_decode_native(data, 80, 72)
        assert nat is not None, kwargs
        np.testing.assert_array_equal(nat, decode_j2k(data))


def test_dicom_91_series_with_openjpeg_pixeldata(tmp_path, rng):
    """End-to-end: a .91 DICOM series whose irreversible codestreams came
    from OpenJPEG (not our encoder) loads through the production reader
    within the lossy tolerance of the original volume."""
    from mmnn_sts_tpu.data.dicom import J2K

    vol = (rng.normal(120, 35, (3, 32, 36)).clip(0, 255)).astype(np.uint8)
    for k in range(3):
        write_dicom_j2k(
            tmp_path / f"s{k}.dcm", vol[k], instance=k + 1, z=float(k),
            bits=8, syntax=J2K,
            encoder=lambda f: _pil_irreversible_encode(f.astype(np.uint8)),
        )
    out = load_dicom_series(str(tmp_path))
    assert out.shape == vol.shape
    assert np.abs(out - vol.astype(np.float32)).max() <= 2
