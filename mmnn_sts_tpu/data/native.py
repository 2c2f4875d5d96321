"""ctypes bindings for the C++ data-path runtime (native/mmnn_native.cpp).

Provides the fast path for cohort preprocessing: NIfTI decode (zlib inflate +
dtype/endian conversion + scl scaling), fused mask/crop-or-fill/trilinear
resize, and a GIL-free multithreaded cohort loader. Falls back transparently
to the pure-numpy implementations in data/nifti.py and data/images.py when
the shared library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libmmnn_native.so"),
    os.path.join(os.path.dirname(__file__), "libmmnn_native.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _SO_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.mmnn_nifti_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.mmnn_nifti_dims.restype = ctypes.c_int
            lib.mmnn_nifti_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.mmnn_nifti_read.restype = ctypes.c_int
            lib.mmnn_preprocess_patient.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.mmnn_preprocess_patient.restype = ctypes.c_int
            lib.mmnn_preprocess_cohort.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.mmnn_preprocess_cohort.restype = None
            if hasattr(lib, "mmnn_jpeg_lossless_decode"):
                lib.mmnn_jpeg_lossless_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint16),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.mmnn_jpeg_lossless_decode.restype = ctypes.c_int
            if hasattr(lib, "mmnn_j2k_decode"):
                lib.mmnn_j2k_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.mmnn_j2k_decode.restype = ctypes.c_int
            if hasattr(lib, "mmnn_jpeg_ls_decode"):
                lib.mmnn_jpeg_ls_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint16),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.mmnn_jpeg_ls_decode.restype = ctypes.c_int
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


_ZERO_MODES = {"crop": 0, "fill": 1, "none": 2}


def load_nifti_native(path: str) -> np.ndarray | None:
    """Decode a NIfTI volume via C++; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 7)()
    ndim = ctypes.c_int(0)
    if lib.mmnn_nifti_dims(path.encode(), dims, ctypes.byref(ndim)) != 0:
        raise IOError(f"native NIfTI dim query failed for {path}")
    shape = tuple(int(dims[i]) for i in range(ndim.value))
    n = int(np.prod(shape))
    out = np.empty(n, dtype=np.float32)
    rc = lib.mmnn_nifti_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    if rc != 0:
        raise IOError(f"native NIfTI decode failed ({rc}) for {path}")
    return out.reshape(shape, order="F")


def preprocess_patient_native(
    image_path: str, mask_path: str, zero_slices: str, spatial_size
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    m0, m1, m2 = spatial_size
    out = np.empty(m0 * m1 * m2, dtype=np.float32)
    rc = lib.mmnn_preprocess_patient(
        image_path.encode(),
        mask_path.encode(),
        _ZERO_MODES[zero_slices],
        m0,
        m1,
        m2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(
            f"native preprocess failed ({rc}) for {image_path} / {mask_path}"
        )
    return out.reshape((m0, m1, m2), order="F")


def jpeg_lossless_decode_native(blob: bytes, rows: int,
                                cols: int) -> np.ndarray | None:
    """Decode one SOF3 frame via C++ (~100x the python oracle); None when the
    library is unavailable or the stream needs the python path (e.g.
    multi-component). rows/cols are the expected DICOM dimensions; the
    stream's own SOF3 header is authoritative and checked against them."""
    lib = _load()
    if lib is None or not hasattr(lib, "mmnn_jpeg_lossless_decode"):
        return None
    out = np.empty(rows * cols, dtype=np.uint16)
    r = ctypes.c_int(0)
    c = ctypes.c_int(0)
    rc = lib.mmnn_jpeg_lossless_decode(
        blob, len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.size, ctypes.byref(r), ctypes.byref(c),
    )
    if rc == 12:  # multi-component: python fallback decodes it
        return None
    if rc != 0:
        raise ValueError(f"native JPEG-Lossless decode failed (rc={rc})")
    if (r.value, c.value) != (rows, cols):
        raise ValueError(
            f"JPEG frame is {r.value}x{c.value}, DICOM says {rows}x{cols}"
        )
    return out.reshape(rows, cols)


def jpeg_ls_decode_native(blob: bytes, rows: int,
                          cols: int) -> np.ndarray | None:
    """Decode one JPEG-LS (T.87) frame via C++; None when the library is
    unavailable or the stream needs the python path (data/jpeg_ls.py), which
    also owns the precise error messages for malformed streams. rows/cols
    are the expected DICOM dimensions; the stream's own SOF55 header is
    authoritative and checked against them."""
    lib = _load()
    if lib is None or not hasattr(lib, "mmnn_jpeg_ls_decode"):
        return None
    out = np.empty(rows * cols, dtype=np.uint16)
    r = ctypes.c_int(0)
    c = ctypes.c_int(0)
    rc = lib.mmnn_jpeg_ls_decode(
        blob, len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.size, ctypes.byref(r), ctypes.byref(c),
    )
    if rc != 0:
        return None
    if (r.value, c.value) != (rows, cols):
        raise ValueError(
            f"JPEG-LS frame is {r.value}x{c.value}, DICOM says {rows}x{cols}"
        )
    return out.reshape(rows, cols)


def j2k_decode_native(blob: bytes, rows: int, cols: int) -> np.ndarray | None:
    """Decode one JPEG 2000 frame via C++ (~150x the python codec); None
    when the library is unavailable or the stream needs the python path
    (data/jpeg2000.py), which also owns the precise error messages.
    rows/cols are the expected DICOM dimensions; the stream's own SIZ
    header is authoritative and checked against them. Returns int32 sample
    values (negative iff the stream is signed)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mmnn_j2k_decode"):
        return None
    out = np.empty(rows * cols, dtype=np.int32)
    r = ctypes.c_int(0)
    c = ctypes.c_int(0)
    rc = lib.mmnn_j2k_decode(
        blob, len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.size, ctypes.byref(r), ctypes.byref(c),
    )
    if rc != 0:
        return None
    if (r.value, c.value) != (rows, cols):
        raise ValueError(
            f"JPEG 2000 frame is {r.value}x{c.value}, DICOM says "
            f"{rows}x{cols}"
        )
    return out.reshape(rows, cols)


def preprocess_cohort_native(
    image_paths, mask_paths, zero_slices: str, spatial_size,
    num_threads: int = 0, return_errors: bool = False,
):
    """Parallel decode+preprocess of N patients -> (N, m0, m1, m2) float32.

    return_errors=True returns (volumes, errors) with per-patient status
    codes (0 = ok) instead of raising, so callers can re-decode failed
    patients through the numpy fallback (data/images._load_modality_volumes).
    """
    lib = _load()
    if lib is None:
        return (None, None) if return_errors else None
    n = len(image_paths)
    m0, m1, m2 = spatial_size
    out = np.empty((n, m0 * m1 * m2), dtype=np.float32)
    errors = np.zeros(n, dtype=np.int32)
    img_arr = (ctypes.c_char_p * n)(*[p.encode() for p in image_paths])
    msk_arr = (ctypes.c_char_p * n)(*[p.encode() for p in mask_paths])
    lib.mmnn_preprocess_cohort(
        img_arr,
        msk_arr,
        n,
        _ZERO_MODES[zero_slices],
        m0,
        m1,
        m2,
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    # each row is a fortran-ordered (m0, m1, m2) volume
    vols = np.ascontiguousarray(
        out.reshape(n, m2, m1, m0).transpose(0, 3, 2, 1)
    )
    if return_errors:
        return vols, errors
    bad = np.nonzero(errors)[0]
    if len(bad):
        raise IOError(
            f"native cohort preprocess failed for {len(bad)} patients, first: "
            f"{image_paths[bad[0]]} (rc={errors[bad[0]]})"
        )
    return vols
