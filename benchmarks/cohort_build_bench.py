"""Host-side cohort-build benchmark (VERDICT r2 item 5 done-bar).

Times the one-time startup cost the reference pays lazily per epoch
(every __getitem__ re-decodes from disk/S3, ImageDatasets.py:475-517) and
this framework pays ONCE: decode + mask + crop/fill + resize of every
patient into the device-resident cohort array.

Two paths measured on identical synthetic NIfTI trees (n patients,
image + mask per patient):

  * native: the C++ fused decode/preprocess pool
    (native/mmnn_native.cpp:mmnn_preprocess_cohort, std::thread workers,
    GIL-free) — the production path when the library is built;
  * python: the per-patient numpy fallback (use_native=False).

Usage: python benchmarks/cohort_build_bench.py [--n 100] [--shape 64]
Prints one JSON line; docs/PERF.md records the measured numbers.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--shape", type=int, default=64)
    ap.add_argument("--target", type=int, default=64)
    args = ap.parse_args()

    from fixtures import make_image_tree, make_patient_key

    from mmnn_sts_tpu.data import native
    from mmnn_sts_tpu.data.images import (
        _load_modality_volumes,
        build_manifest_any,
        load_patient_volume,
    )

    with tempfile.TemporaryDirectory() as tmp:
        uids = list(range(1000, 1000 + args.n))  # patient-key UIDs are ints
        key_csv = str(Path(tmp) / "key.csv")
        anon = make_patient_key(key_csv, uids)
        root = str(Path(tmp) / "imgs")
        shape = (args.shape, args.shape, args.shape)
        make_image_tree(root, anon, shape=shape, seed=0)

        target = (args.target,) * 3
        result = {"n": args.n, "src_shape": args.shape,
                  "target_shape": args.target,
                  "native_available": native.available()}

        manifest = build_manifest_any(root, key_csv, "nifti")

        # python fallback path (the reference-equivalent serial decode)
        t0 = time.perf_counter()
        vols_py = np.stack(
            [load_patient_volume(r, target, "fill", use_native=False)
             for r in manifest],
            axis=0,
        )
        result["python_serial_s"] = round(time.perf_counter() - t0, 2)

        if native.available():
            t0 = time.perf_counter()
            vols_nat = _load_modality_volumes(manifest, target, "fill")
            result["native_pool_s"] = round(time.perf_counter() - t0, 2)
            result["max_abs_delta"] = float(
                np.max(np.abs(np.asarray(vols_py) - np.asarray(vols_nat)))
            )
            result["speedup"] = round(
                result["python_serial_s"] / result["native_pool_s"], 1
            )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
