"""JPEG 2000 (ITU-T T.800) codec + DICOM integration tests.

The reference decoded JPEG 2000 implicitly through SimpleITK/GDCM+OpenJPEG
(/root/reference/data/s3utils.py:244-265); data/jpeg2000.py implements the
Part-1 lossless path from the public spec. Round-trips pin encoder and
decoder against each other across coding modes (MQ coder, tag trees, T1
passes, 5/3 DWT), bit depths, sign handling, shapes, and container
wrapping; structural tests pin the header parse and the unsupported-stream
errors, which hold independently of the encoder.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fixtures import write_dicom_j2k  # noqa: E402

from mmnn_sts_tpu.data.dicom import load_dicom_series  # noqa: E402
from mmnn_sts_tpu.data.j2k_mq import MQDecoder, MQEncoder  # noqa: E402
from mmnn_sts_tpu.data.jpeg2000 import (  # noqa: E402
    TagTree,
    decode_j2k,
    dwt53_forward,
    dwt53_inverse,
    encode_j2k,
    t1_decode_block,
    t1_encode_block,
)


@pytest.fixture
def rng():
    return np.random.default_rng(9)


# ---------------------------------------------------------------------------
# MQ coder
# ---------------------------------------------------------------------------


def test_mq_roundtrip_biased_streams():
    """Biased streams drive the probability ladder into the skewed states
    that exercise 0xFF stuffing and carry propagation into stuffed bytes."""
    for seed in range(40):
        r = np.random.default_rng(seed)
        n = int(r.integers(100, 2500))
        bits = (r.random(n) < r.random() * 0.6).astype(int)
        ctxs = r.integers(0, 19, n)
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == list(bits), f"seed {seed}"


def test_mq_stuffed_byte_carries_bit_7():
    """A valid encoder may emit bytes 0x80-0x8F after 0xFF (7 data bits +
    the carry); the decoder must treat only >0x8F as a marker. Regression
    for the classic drop-the-carry-in-stuff bug."""
    found = False
    for seed in range(200):
        r = np.random.default_rng(seed)
        n = int(r.integers(200, 1500))
        bits = (r.random(n) < 0.2).astype(int)
        ctxs = r.integers(0, 19, n)
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        seg = enc.flush()
        dec = MQDecoder(seg)
        assert [dec.decode(int(c)) for c in ctxs] == list(bits)
        for i in range(1, len(seg)):
            if seg[i - 1] == 0xFF and 0x80 <= seg[i] <= 0x8F:
                found = True
    assert found, "sweep never produced a carry-into-stuffed-byte case"


# ---------------------------------------------------------------------------
# DWT and tag trees
# ---------------------------------------------------------------------------


def test_dwt53_perfect_reconstruction(rng):
    for shape in [(1, 1), (1, 7), (8, 8), (13, 17), (64, 48), (5, 1), (2, 3)]:
        x = rng.integers(-30000, 30000, size=shape)
        for lev in range(4):
            try:
                ll, bands = dwt53_forward(x, lev)
            except ValueError:
                continue
            assert np.array_equal(dwt53_inverse(ll, bands), x), (shape, lev)


def test_dwt53_subband_dims():
    x = np.zeros((13, 17), np.int64)
    ll, bands = dwt53_forward(x, 2)
    (hl2, lh2, hh2), (hl1, lh1, hh1) = bands
    assert hl1.shape == (7, 8) and lh1.shape == (6, 9) and hh1.shape == (6, 8)
    assert ll.shape == (4, 5) and hl2.shape == (4, 4)
    assert lh2.shape == (3, 5) and hh2.shape == (3, 4)


class _BitSource:
    def __init__(self, bits):
        self.bits = bits
        self.i = 0

    def read_bit(self):
        b = self.bits[self.i]
        self.i += 1
        return b


def test_tagtree_roundtrip(rng):
    for w, h in [(1, 1), (3, 2), (7, 5), (4, 4)]:
        vals = rng.integers(0, 6, size=(h, w))
        te, td = TagTree(w, h), TagTree(w, h)
        te.set_values(vals)
        bits, queries = [], []
        for y in range(h):
            for x in range(w):
                for t in range(1, 8):
                    te.encode(bits, x, y, t)
                    queries.append((x, y, t, int(vals[y, x]) < t))
        r = _BitSource(bits)
        for x, y, t, expect in queries:
            assert td.decode(r, x, y, t) == expect, (w, h, x, y, t)
        assert r.i == len(bits), "encoder emitted unread bits"


# ---------------------------------------------------------------------------
# T1 code-block coding
# ---------------------------------------------------------------------------


def test_t1_block_roundtrip_all_bands():
    for seed in range(12):
        r = np.random.default_rng(seed)
        for band in ("LL", "HL", "LH", "HH"):
            shape = tuple(int(v) for v in r.integers(1, 40, 2))
            mag = np.abs(r.normal(0, 400, size=shape)).astype(np.int64)
            mag[r.random(shape) < r.random()] = 0  # sparsity -> run mode
            if not mag.any():
                mag[0, 0] = 3
            sgn = (r.random(shape) < 0.5).astype(np.uint8)
            zbp, npasses, data = t1_encode_block(mag, sgn, band, 15)
            dec = t1_decode_block(data, shape[1], shape[0], band, 15,
                                  zbp, npasses)
            assert np.array_equal(dec, np.where(sgn > 0, -mag, mag)), (
                seed, band, shape)


# ---------------------------------------------------------------------------
# Full codestream
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,depth,signed", [
    ((17, 23), 8, False),
    ((64, 48), 16, False),
    ((33, 61), 12, False),
    ((16, 16), 16, True),
    ((5, 5), 8, False),
    ((1, 9), 8, False),
    ((70, 70), 10, True),
])
def test_codestream_roundtrip(rng, shape, depth, signed):
    lo = -(1 << (depth - 1)) if signed else 0
    hi = (1 << (depth - 1)) - 1 if signed else (1 << depth) - 1
    img = rng.integers(lo, hi + 1, size=shape)
    assert np.array_equal(decode_j2k(encode_j2k(img, depth, signed)), img)


def test_codestream_flat_regions_compress(rng):
    """Flat masks exercise run-length cleanup + excluded all-zero blocks,
    and must compress decisively."""
    img = np.zeros((96, 128), np.int64)
    img[20:70, 30:100] = 255
    blob = encode_j2k(img, 16)
    assert len(blob) < img.size * 2 // 10
    assert np.array_equal(decode_j2k(blob), img)


def test_codestream_smooth_compresses(rng):
    x = np.linspace(0, 4000, 128)
    img = (x[None, :] + x[:96, None] / 3).astype(np.int64)
    img += rng.integers(0, 3, size=img.shape)
    blob = encode_j2k(img, 16)
    assert len(blob) < img.size * 2 // 3
    assert np.array_equal(decode_j2k(blob), img)


def test_rejects_truncated():
    blob = encode_j2k(np.zeros((8, 8), np.int64), 8)
    with pytest.raises(ValueError):
        decode_j2k(blob[:12])


def test_rejects_multi_component():
    blob = bytearray(encode_j2k(np.zeros((8, 8), np.int64), 8))
    # SIZ Csiz lives at a fixed offset in our emitter: SOC(2) SIZ(2) L(2)
    # Rsiz(2) Xsiz(4) Ysiz(4) XO(4) YO(4) XT(4) YT(4) XTO(4) YTO(4) -> Csiz
    off = 2 + 2 + 2 + 2 + 32
    blob[off : off + 2] = (3).to_bytes(2, "big")
    with pytest.raises(ValueError, match="components"):
        decode_j2k(bytes(blob))


def test_rejects_transform_quant_mismatch():
    # flipping only the transform byte to 9/7 leaves a style-0 QCD behind;
    # T.800 pairs 5/3 with no-quant and 9/7 with scalar quantization (E.1)
    blob = bytearray(encode_j2k(np.zeros((8, 8), np.int64), 8))
    cod_at = blob.index(bytes((0xFF, 0x52)))
    blob[cod_at + 4 + 9] = 0  # SPcod transform byte -> 9/7
    with pytest.raises(ValueError, match="mismatch"):
        decode_j2k(bytes(blob))


def test_decodes_jp2_container(rng):
    import struct

    img = rng.integers(0, 4096, size=(19, 21))
    blob = encode_j2k(img, 12)
    sig = bytes.fromhex("0000000C6A5020200D0A870A")
    ftyp = struct.pack(">I", 20) + b"ftypjp2 " + struct.pack(">I", 0) + b"jp2 "
    jp2 = sig + ftyp + struct.pack(">I", 8 + len(blob)) + b"jp2c" + blob
    assert np.array_equal(decode_j2k(jp2), img)


# ---------------------------------------------------------------------------
# DICOM integration (transfer syntax 1.2.840.10008.1.2.4.90)
# ---------------------------------------------------------------------------


def test_single_frame_j2k_dicom(tmp_path, rng):
    img = rng.integers(0, 4096, size=(18, 22)).astype(np.uint16)
    p = str(tmp_path / "s.dcm")
    write_dicom_j2k(p, img)
    np.testing.assert_array_equal(load_dicom_series(p),
                                  img.astype(np.float32)[None])


def test_signed_j2k_pixels(tmp_path, rng):
    img = rng.integers(-900, 900, size=(16, 16)).astype(np.int16)
    p = str(tmp_path / "s.dcm")
    write_dicom_j2k(p, img, signed=True)
    np.testing.assert_array_equal(load_dicom_series(p),
                                  img.astype(np.float32)[None])


def test_multiframe_j2k_mask(tmp_path):
    vol = np.zeros((4, 12, 12), np.uint16)
    vol[1:3, 2:9, 3:10] = 255
    p = str(tmp_path / "m.dcm")
    write_dicom_j2k(p, vol, frames=True)
    np.testing.assert_array_equal(load_dicom_series(p),
                                  vol.astype(np.float32))


def test_j2k_series_in_pipeline(tmp_path, rng):
    imgs = rng.integers(0, 4096, size=(5, 10, 12)).astype(np.uint16)
    d = tmp_path / "series"
    os.makedirs(d)
    for k in range(5):
        write_dicom_j2k(str(d / f"s{k}.dcm"), imgs[k], instance=k + 1,
                        z=2.0 * k, pixel_spacing=(1.0, 1.0))
    vol, geom = load_dicom_series(str(d), with_geometry=True)
    np.testing.assert_array_equal(vol, imgs.astype(np.float32))
    np.testing.assert_allclose(geom.z_offsets, [0, 2, 4, 6, 8])


def test_jp2_wrapped_dicom_frame(tmp_path, rng):
    """Non-conformant JP2-in-DICOM wrapping decodes too (seen in the wild)."""
    img = rng.integers(0, 256, size=(14, 14)).astype(np.uint16)
    p = str(tmp_path / "s.dcm")
    write_dicom_j2k(p, img, jp2=True)
    np.testing.assert_array_equal(load_dicom_series(p),
                                  img.astype(np.float32)[None])


# ---------------------------------------------------------------------------
# Native (C++) fast path: mmnn_j2k_decode (native/mmnn_native.cpp) must agree
# sample-for-sample with the python decoder and return None (python fallback)
# for anything it does not handle.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def native_mod():
    import subprocess

    from mmnn_sts_tpu.data import native

    if not native.available() or not hasattr(
            native._load(), "mmnn_j2k_decode"):
        ndir = str(Path(__file__).resolve().parent.parent / "native")
        rc = subprocess.run(["make", "-B", "-C", ndir], capture_output=True)
        assert rc.returncode == 0, rc.stderr.decode()
        native._TRIED = False  # re-probe
        native._LIB = None
    assert native.available(), "libmmnn_native.so missing"
    return native


def test_native_matches_python_decoder(native_mod, rng):
    cases = [
        (rng.integers(0, 256, size=(17, 23)), 8, False),
        (rng.integers(0, 65536, size=(48, 31)), 16, False),
        (rng.integers(-2048, 2048, size=(33, 29)), 12, True),
        (rng.integers(0, 1024, size=(1, 9)), 10, False),
    ]
    flat = np.zeros((64, 96), np.int64)
    flat[10:50, 20:70] = 255
    cases.append((flat, 16, False))
    for img, depth, signed in cases:
        blob = encode_j2k(img, depth, signed)
        py = decode_j2k(blob)
        nat = native_mod.j2k_decode_native(blob, *py.shape)
        assert nat is not None
        np.testing.assert_array_equal(nat, py)
        np.testing.assert_array_equal(nat, img)


def test_native_decodes_jp2_container(native_mod, rng):
    import struct

    img = rng.integers(0, 4096, size=(19, 21))
    blob = encode_j2k(img, 12)
    sig = bytes.fromhex("0000000C6A5020200D0A870A")
    ftyp = struct.pack(">I", 20) + b"ftypjp2 " + struct.pack(">I", 0) + b"jp2 "
    jp2 = sig + ftyp + struct.pack(">I", 8 + len(blob)) + b"jp2c" + blob
    nat = native_mod.j2k_decode_native(jp2, 19, 21)
    assert nat is not None
    np.testing.assert_array_equal(nat, img)


def test_native_falls_back_to_python(native_mod):
    blob = encode_j2k(np.zeros((8, 8), np.int64), 8)
    assert native_mod.j2k_decode_native(blob[:12], 8, 8) is None
    bad = bytearray(blob)
    cod_at = bad.index(bytes((0xFF, 0x52)))
    bad[cod_at + 4 + 9] = 0  # irreversible transform flag
    assert native_mod.j2k_decode_native(bytes(bad), 8, 8) is None


def test_native_shape_mismatch_raises(native_mod, rng):
    img = rng.integers(0, 256, size=(6, 8))
    blob = encode_j2k(img, 8)
    with pytest.raises(ValueError, match="DICOM says"):
        native_mod.j2k_decode_native(blob, 8, 6)


def test_multilayer_streams_roundtrip(rng):
    """Quality layers split each block's passes across packets; the decoder
    must accumulate passes and concatenate segment bytes across layers
    (inclusion tag tree on first inclusion, plain bit afterwards)."""
    for layers in (2, 3, 5):
        img = rng.integers(0, 4096, size=(48, 33))
        blob = encode_j2k(img, 12, layers=layers)
        assert np.array_equal(decode_j2k(blob), img), layers
        flat = np.zeros((64, 64), np.int64)
        flat[10:50, 10:30] = 200  # excluded blocks stay excluded every layer
        assert np.array_equal(
            decode_j2k(encode_j2k(flat, 16, layers=layers)), flat)


def test_multilayer_native_parity(native_mod, rng):
    img = rng.integers(0, 4096, size=(40, 56))
    for layers in (2, 4):
        blob = encode_j2k(img, 12, layers=layers)
        nat = native_mod.j2k_decode_native(blob, 40, 56)
        assert nat is not None
        np.testing.assert_array_equal(nat, img)


@pytest.mark.parametrize("prog", [1, 2, 3, 4])  # RLCP RPCL PCRL CPRL
def test_progression_orders_decode(rng, prog):
    """For single-component single-precinct streams every progression is a
    nesting of layers and resolutions; resolution-major orders must decode
    (packet sequence for multi-layer differs from LRCP only in nesting,
    which coincides again at 1 layer)."""
    img = rng.integers(0, 256, size=(21, 17))
    blob = bytearray(encode_j2k(img, 8))
    cod_at = blob.index(bytes((0xFF, 0x52)))
    blob[cod_at + 4 + 1] = prog  # SGcod progression order byte
    assert np.array_equal(decode_j2k(bytes(blob)), img)


# ---------------------------------------------------------------------------
# Irreversible (9/7, scalar-quantized) streams — transfer syntax .91.
# The reference decoded these through GDCM+OpenJPEG and trained on the
# lossy samples (/root/reference/data/s3utils.py:244-265); parity here is
# tolerance-based (T.800 mandates no exact real-arithmetic result), with
# OpenJPEG cross-decodes pinned in test_codec_conformance.py.
# ---------------------------------------------------------------------------


def test_dwt97_perfect_reconstruction(rng):
    from mmnn_sts_tpu.data.jpeg2000 import dwt97_forward, dwt97_inverse

    for shape in [(1, 1), (1, 7), (8, 8), (13, 17), (64, 48), (5, 1), (2, 3)]:
        x = rng.normal(0, 1000, size=shape)
        for lev in range(4):
            try:
                ll, bands = dwt97_forward(x, lev)
            except ValueError:
                continue
            assert np.abs(dwt97_inverse(ll, bands) - x).max() < 1e-9, (
                shape, lev)


@pytest.mark.parametrize("qdrop", [0, 2, 4])
def test_irreversible_roundtrip_error_bounded(rng, qdrop):
    """Expounded quantization: every subband's step is 2^qdrop, midpoint
    reconstruction keeps per-coefficient error <= step/2, and 9/7
    synthesis amplifies by a small constant — so pixel error scales with
    the step. Bounds are ~2x the measured errors (3/11/58 max at
    qdrop 0/2/4) so regressions trip them but float drift does not."""
    img = (rng.normal(500, 120, size=(64, 96)).clip(0, 1023)).astype(np.int64)
    dec = decode_j2k(encode_j2k(img, 10, irreversible=True, qdrop=qdrop))
    err = dec - img
    assert np.abs(err).max() <= 8 * 2**qdrop
    assert np.sqrt((err.astype(np.float64) ** 2).mean()) <= 2.0 * 2**qdrop


def test_irreversible_derived_decodes(rng):
    """QCD style 1 (scalar derived): one (eps, mu) pair, per-band steps
    derived by decomposition level (E-5) — fine bands quantize 2^(N_L-lev)
    coarser, so the error budget is driven by the finest band's step."""
    img = (rng.normal(500, 120, size=(48, 40)).clip(0, 1023)).astype(np.int64)
    dec = decode_j2k(encode_j2k(img, 10, irreversible=True, qdrop=0,
                                derived=True, levels=2))
    err = dec - img
    # finest-band step = 2^(levels-1+qdrop) = 2 -> same budget as qdrop=1
    assert np.abs(err).max() <= 8 * 2 ** (2 - 1)
    assert np.sqrt((err.astype(np.float64) ** 2).mean()) <= 2.0 * 2


def test_irreversible_multilayer_and_signed(rng):
    img = rng.integers(-2000, 2000, size=(33, 29))
    dec = decode_j2k(encode_j2k(img, 12, signed=True, irreversible=True,
                                qdrop=0, layers=3))
    assert np.abs(dec - img).max() <= 8


def test_irreversible_native_matches_python(native_mod, rng):
    """The C++ fast path must agree sample-for-sample with the python
    oracle on irreversible streams too — both implement the same
    double-precision 9/7 synthesis and midpoint reconstruction, so the
    rounded outputs are identical, not merely within tolerance."""
    cases = [
        dict(qdrop=0, derived=False, signed=False, shape=(64, 96), depth=10),
        dict(qdrop=2, derived=False, signed=False, shape=(33, 29), depth=12),
        dict(qdrop=4, derived=True, signed=False, shape=(48, 40), depth=10),
        dict(qdrop=0, derived=True, signed=True, shape=(17, 23), depth=12),
        dict(qdrop=1, derived=False, signed=True, shape=(1, 9), depth=8),
    ]
    for c in cases:
        lo, hi = ((-(1 << c["depth"] - 1), 1 << c["depth"] - 1)
                  if c["signed"] else (0, 1 << c["depth"]))
        img = rng.integers(lo, hi, size=c["shape"])
        blob = encode_j2k(img, c["depth"], signed=c["signed"],
                          irreversible=True, qdrop=c["qdrop"],
                          derived=c["derived"])
        py = decode_j2k(blob)
        nat = native_mod.j2k_decode_native(blob, *c["shape"])
        assert nat is not None, c
        np.testing.assert_array_equal(nat, py, err_msg=str(c))


def test_irreversible_native_multilayer_parity(native_mod, rng):
    img = rng.integers(-2000, 2000, size=(33, 29))
    blob = encode_j2k(img, 12, signed=True, irreversible=True, layers=3)
    nat = native_mod.j2k_decode_native(blob, 33, 29)
    assert nat is not None
    np.testing.assert_array_equal(nat, decode_j2k(blob))


def test_dicom_91_series_trains_on_lossy_frames(tmp_path, rng):
    from mmnn_sts_tpu.data.dicom import J2K

    vol = (rng.normal(300, 90, size=(3, 16, 16)).clip(0, 4095)
           ).astype(np.int64)
    for k in range(3):
        write_dicom_j2k(tmp_path / f"s{k}.dcm", vol[k], instance=k + 1,
                        z=float(k), syntax=J2K, irreversible=True, qdrop=2)
    out = load_dicom_series(tmp_path)
    assert out.shape == (3, 16, 16)
    assert np.abs(out - vol.astype(np.float32)).max() <= 8 * 4
