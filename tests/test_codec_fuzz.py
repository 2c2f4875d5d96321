"""Malformed-stream fuzz for the compressed-DICOM decoders (python + C++).

A clinical DICOM export can be truncated or bit-rotted in transit; the
reference inherited GDCM's hardening for free. Our decoders must never
crash the process (the C++ fast paths run in-process via ctypes — a
segfault there kills training) and never hang: every mutated stream must
either decode to SOME array or fail with a clean ValueError (python) /
fallback return (native). Mutations: truncation at every region of the
stream, single-bit flips, random garbage with valid magic bytes.

Decoded-vs-expected VALUES are intentionally unchecked for mutated input —
a bit flip in entropy-coded data legitimately decodes to different pixels.
The native side is additionally capacity-checked by construction
(out_capacity in native/mmnn_native.cpp): these tests drive it with
undersized expectations to prove header dims are validated, not trusted.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mmnn_sts_tpu.data.jpeg2000 import decode_j2k, encode_j2k  # noqa: E402
from mmnn_sts_tpu.data.jpeg_lossless import (  # noqa: E402
    decode_jpeg_lossless,
    encode_jpeg_lossless_sv1,
)
from mmnn_sts_tpu.data.jpeg_ls import decode_jpeg_ls, encode_jpeg_ls  # noqa: E402


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


def _image(rng, h=24, w=20, hi=4096):
    return rng.integers(0, hi, (h, w)).astype(np.int64)


def _codecs(rng):
    img = _image(rng)
    return [
        ("jpeg_lossless", encode_jpeg_lossless_sv1(img, 12), decode_jpeg_lossless),
        ("jpeg_ls", encode_jpeg_ls(img, 12), decode_jpeg_ls),
        ("j2k", encode_j2k(img, 12), decode_j2k),
        ("j2k_irrev", encode_j2k(img, 12, irreversible=True, qdrop=1),
         decode_j2k),
    ]


def _mutations(rng, blob: bytes):
    n = len(blob)
    # truncations spread over the whole stream incl. header region
    for cut in sorted({0, 1, 2, 5, 11, n // 4, n // 2, 3 * n // 4, n - 1}):
        yield blob[:cut]
    # single-bit flips spread over the stream
    for pos in rng.integers(0, n, 40):
        bit = int(rng.integers(0, 8))
        b = bytearray(blob)
        b[pos] ^= 1 << bit
        yield bytes(b)
    # byte deletions / duplications around random offsets
    for pos in rng.integers(1, n - 1, 10):
        b = bytearray(blob)
        del b[pos]
        yield bytes(b)
    # garbage with plausible magic prefixes
    for _ in range(5):
        yield blob[:4] + bytes(rng.integers(0, 256, 64, dtype=np.uint8))


def test_python_decoders_never_crash_or_hang(rng=None):
    rng = np.random.default_rng(31)
    for name, blob, decode in _codecs(rng):
        ok = bad = 0
        for mut in _mutations(rng, blob):
            try:
                out = decode(mut)
                assert isinstance(out, np.ndarray), name
                ok += 1
            except ValueError:
                bad += 1
            # anything else (IndexError, struct.error, OverflowError,
            # RecursionError, segfault) is a hardening bug
        assert bad > 0, f"{name}: no mutation was rejected — fuzz too weak"


def test_native_decoders_never_crash(native_mod):
    rng = np.random.default_rng(33)
    img = _image(rng)
    h, w = img.shape
    cases = [
        ("jpeg_lossless", encode_jpeg_lossless_sv1(img, 12),
         native_mod.jpeg_lossless_decode_native),
        ("jpeg_ls", encode_jpeg_ls(img, 12),
         native_mod.jpeg_ls_decode_native),
        ("j2k", encode_j2k(img, 12), native_mod.j2k_decode_native),
    ]
    for name, blob, decode in cases:
        for mut in _mutations(rng, blob):
            # None (python fallback), an array (bit flips in entropy data
            # legitimately decode to different pixels), or a clean
            # ValueError — any of these is correct; a segfault (the real
            # risk: the C++ runs in-process) or a non-ValueError exception
            # is a hardening bug. Decoded VALUES are pinned against the
            # python oracle by the per-codec native-parity tests.
            try:
                out = decode(mut, h, w)
                assert out is None or isinstance(out, np.ndarray), name
            except ValueError:
                pass


def test_native_jpeg_lossless_truncated_segment_is_rejected(native_mod):
    """A stream truncated mid-segment (seg_len points past the buffer)
    must fail cleanly — the SOF3/DHT/SOS parsers read the declared segment
    body, so a missing bounds check was a heap over-read."""
    rng = np.random.default_rng(37)
    img = _image(rng)
    h, w = img.shape
    blob = encode_jpeg_lossless_sv1(img, 12)
    # SOI + SOF3 marker claiming a 0x4000-byte segment in a 6-byte stream
    crafted = bytes([0xFF, 0xD8, 0xFF, 0xC3, 0x40, 0x00])
    for mut in (crafted, blob[:6]):  # truncated IN a segment header
        with pytest.raises(ValueError):
            native_mod.jpeg_lossless_decode_native(mut, h, w)
    # truncated in the entropy scan: decoding garbage is legitimate, a
    # crash is not
    try:
        out = native_mod.jpeg_lossless_decode_native(blob[: len(blob) // 3],
                                                     h, w)
        assert out is None or isinstance(out, np.ndarray)
    except ValueError:
        pass


def test_native_j2k_corrupt_psot_is_rejected(native_mod):
    """Psot < the 14-byte tile-part header (a single bit flip away) once
    handed vector::insert a reversed range — must be a clean refusal."""
    rng = np.random.default_rng(38)
    img = _image(rng)
    h, w = img.shape
    blob = bytearray(encode_j2k(img, 12))
    sot = blob.find(b"\xff\x90")
    assert sot > 0
    for psot in (1, 5, 13):
        b = bytearray(blob)
        b[sot + 6 : sot + 10] = int(psot).to_bytes(4, "big")
        try:
            out = native_mod.j2k_decode_native(bytes(b), h, w)
            assert out is None
        except ValueError:
            pass
    # truncation right after the SOT marker: the 12-byte header read must
    # stay in bounds
    try:
        out = native_mod.j2k_decode_native(bytes(blob[: sot + 4]), h, w)
        assert out is None
    except ValueError:
        pass


def test_corrupt_bot_offset_raises_value_error():
    """A Basic Offset Table entry that lands between fragment boundaries is
    untrusted-input, not a KeyError (the cohort build's per-patient
    fallback catches ValueError)."""
    from mmnn_sts_tpu.data.dicom import (
        JPEG_LS_LOSSLESS,
        DicomSlice,
        _decode_fragments,
    )

    rng = np.random.default_rng(39)
    img = _image(rng, h=8, w=8, hi=255)
    frag = encode_jpeg_ls(img, 8)
    s = DicomSlice(rows=8, cols=8, bits_allocated=8,
                   transfer_syntax=JPEG_LS_LOSSLESS,
                   fragments=[frag, frag, frag], number_of_frames=2)
    # valid frame starts are 0 and 8+len(frag); 3 is neither
    s.extra["bot"] = np.asarray([0, 3], dtype="<u4").tobytes()
    with pytest.raises(ValueError, match="fragment boundary"):
        _decode_fragments(s)


def test_native_rejects_oversized_header_dims(native_mod):
    """The caller sizes the output buffer from the DICOM tags; a stream whose
    own header claims LARGER dims must be refused, not written out of
    bounds."""
    rng = np.random.default_rng(35)
    big = _image(rng, h=48, w=40)
    cases = [
        (encode_jpeg_lossless_sv1(big, 12),
         native_mod.jpeg_lossless_decode_native),
        (encode_jpeg_ls(big, 12), native_mod.jpeg_ls_decode_native),
        (encode_j2k(big, 12), native_mod.j2k_decode_native),
    ]
    for blob, decode in cases:
        # capacity 64 << 1920 samples: a clean refusal (python-fallback None
        # or ValueError) is required; writing out of bounds would corrupt
        # the heap or segfault
        try:
            assert decode(blob, 8, 8) is None
        except ValueError:
            pass
