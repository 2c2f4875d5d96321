"""Lossy sequential-DCT JPEG (T.81 baseline/extended) + DICOM integration.

The reference decoded lossy JPEG DICOM implicitly through SimpleITK/GDCM+
libjpeg and trained on the result (/root/reference/data/s3utils.py:244-265);
data/jpeg_baseline.py does the same from the public spec. T.81 does not
mandate a bit-exact IDCT, so the accuracy contract is: within +-2 of an
independent decoder (libjpeg via PIL) on the same stream, and within DCT
roundoff of the original under a unit quantizer.
"""

import io
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fixtures import write_dicom_jpeg_baseline  # noqa: E402

from mmnn_sts_tpu.data.dicom import load_dicom_series  # noqa: E402
from mmnn_sts_tpu.data.jpeg_baseline import (  # noqa: E402
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


@pytest.fixture
def rng():
    return np.random.default_rng(13)


@pytest.mark.parametrize("shape,prec", [
    ((24, 24), 8), ((17, 23), 8), ((40, 56), 12), ((8, 8), 12), ((9, 1), 8),
])
def test_unit_quantizer_roundtrip(rng, shape, prec):
    """quant=1 bounds the loss to DCT roundoff (|err| <= 2)."""
    img = rng.integers(0, 1 << prec, size=shape)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, prec))
    assert np.abs(out - img).max() <= 2


def test_restart_intervals(rng):
    img = rng.integers(0, 4096, size=(40, 33))
    out = decode_jpeg_baseline(
        encode_jpeg_baseline(img, 12, restart_interval=3))
    assert np.abs(out - img).max() <= 2


def test_quantized_smooth_content(rng):
    """Heavier quantization on smooth content stays close (the lossy
    regime the reference trained on)."""
    x = np.linspace(0, 2500, 64)
    img = (x[None, :] + x[:48, None] / 2).astype(np.int64)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 12, quant=8))
    assert float(np.sqrt(((out - img) ** 2).mean())) < 4.0


def test_matches_libjpeg_within_2():
    """Golden cross-check: decode a PIL(libjpeg)-encoded stream and compare
    against PIL's own decode of the same bytes."""
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(7)
    base = rng.normal(120, 40, size=(48, 64))
    # smooth it without scipy: box blur via cumsum
    img8 = np.clip(base, 0, 255).astype(np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img8, mode="L").save(bio, format="JPEG", quality=85)
    blob = bio.getvalue()
    mine = decode_jpeg_baseline(blob)
    ref = np.asarray(Image.open(io.BytesIO(blob)))
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 2


def test_rejects_progressive():
    Image = pytest.importorskip("PIL.Image")
    img = np.zeros((16, 16), np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img, mode="L").save(bio, format="JPEG", progressive=True)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg_baseline(bio.getvalue())


def test_rejects_multi_component():
    Image = pytest.importorskip("PIL.Image")
    img = np.zeros((16, 16, 3), np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img, mode="RGB").save(bio, format="JPEG")
    with pytest.raises(ValueError, match="components"):
        decode_jpeg_baseline(bio.getvalue())


def test_lossy_dicom_series(tmp_path, rng):
    """.50 and .51 series flow through the DICOM reader; values within the
    lossy tolerance of the originals."""
    for bits, shape in ((8, (12, 14)), (12, (12, 14))):
        imgs = rng.integers(0, 1 << bits, size=(4,) + shape)
        d = tmp_path / f"series{bits}"
        d.mkdir()
        for k in range(4):
            write_dicom_jpeg_baseline(str(d / f"s{k}.dcm"), imgs[k],
                                      instance=k + 1, z=2.0 * k, bits=bits)
        vol = np.asarray(load_dicom_series(str(d)))
        assert vol.shape == (4,) + shape
        assert np.abs(vol - imgs.astype(np.float32)).max() <= 2
