"""Serving benchmark: survival inference + 50-resample bootstrap CI.

The reference's deployment mode is `--inference --survival --bootstrap`
(/root/reference/main.py:750-887): a batch-size-1 DataLoader forward over
the test set, repeated once per bootstrap resample (50x), with lifelines
C-indices per resample on the host — i.e. 50 full forward passes of the
cohort. This framework's redesign does ONE forward pass of the split and
evaluates all 50 resamples as a vmapped count-vector program on device
(infer/run.py:_bootstrap_cindices), so the bootstrap is asymptotically
free.

This script measures both sides on synthetic data at the published
evaluation shape (64^3 x 2ch, 2 targets, N=50 bootstrap,
/root/reference/main.py:61):

  * TPU: device-resident test split -> forward (+blend head select) ->
    50-resample bootstrap C-indices, wall time with device_get fencing.
  * torch-CPU twin (same spirit as torch_baseline.py: public recipe, no
    reference code): batch-1 eval-mode forwards per resample, exactly the
    reference's loop structure, C-index on host.

Usage:  python benchmarks/infer_bench.py [--n 32] [--torch-resamples 3]
(the torch side extrapolates from a few resamples — each is a full
cohort forward and the reference runs 50 of them).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_tpu(n: int, resamples: int) -> dict:
    import jax
    import jax.numpy as jnp

    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.infer.run import InferenceConfig, inference_survival
    from mmnn_sts_tpu.data.loader import DeviceDataset
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state

    cfg = Config()
    cfg.tpu.compute_dtype = "bfloat16"
    model = build_model(cfg, images=True, preop=True, postop=False, blend=True)

    rng = np.random.default_rng(0)
    images = (rng.normal(size=(n, 64, 64, 64, 2)).astype(np.float32)) ** 2
    clinical = rng.normal(size=(n, 11)).astype(np.float32)
    events = (rng.random((n, 2)) < 0.7).astype(np.float32)
    durations = rng.integers(1, 2000, size=(n, 2)).astype(np.float32)

    ds = DeviceDataset(
        uids=np.asarray([f"uid{i}" for i in range(n)]),
        inputs={"image": jnp.asarray(images),
                "clinical": jnp.asarray(clinical)},
        events=jnp.asarray(events),
        durations=jnp.asarray(durations),
    )
    sample = {"image": jnp.asarray(images[:2]), "clinical": jnp.asarray(clinical[:2])}
    state = create_train_state(model, make_optimizer(5e-4, 2, 100), sample,
                               seed=42)

    icfg = InferenceConfig(blend=True, bootstrap=True, num_bootstrap=resamples,
                           gradcam=False, save_preds=False)

    # warmup/compile
    out = inference_survival(state, ds, icfg)
    t0 = time.perf_counter()
    out = inference_survival(state, ds, icfg)
    # inference_survival returns host numpy (device_get already forced)
    assert np.all(np.isfinite(out["mean_c"]))
    dt = time.perf_counter() - t0
    return {"tpu_wall_s": round(dt, 3),
            "tpu_volumes_per_sec": round(n / dt, 2)}


def run_torch(n: int, measured_resamples: int, total_resamples: int) -> dict:
    import torch

    from torch_baseline import Multimodal

    torch.manual_seed(42)
    model = Multimodal().eval()
    rng = np.random.default_rng(0)
    images = torch.tensor(
        (rng.normal(size=(n, 2, 64, 64, 64)).astype(np.float32)) ** 2
    )
    clinical = torch.tensor(rng.normal(size=(n, 11)).astype(np.float32))

    from mmnn_sts_tpu.ops.metrics import c_indices_per_class

    events = (rng.random((n, 2)) < 0.7).astype(np.float32)
    durations = rng.integers(1, 2000, size=(n, 2)).astype(np.float32)

    rs = np.random.RandomState(42)
    t0 = time.perf_counter()
    with torch.no_grad():
        for _ in range(measured_resamples):
            picks = rs.randint(0, n, size=n)
            preds = []
            for i in picks:  # the reference's batch-size-1 loader
                out = model(images[i:i + 1], clinical[i:i + 1])
                preds.append(out[0].numpy())
            preds = np.concatenate(preds, axis=0)
            c_indices_per_class(preds, events[picks], durations[picks])
    dt = time.perf_counter() - t0
    per_resample = dt / measured_resamples
    return {
        "torch_cpu_measured_resamples": measured_resamples,
        "torch_cpu_wall_s_extrapolated_50": round(per_resample * total_resamples, 1),
        "torch_cpu_volumes_per_sec": round(n / per_resample, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--resamples", type=int, default=50)
    ap.add_argument("--torch-resamples", type=int, default=2)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    result = {"n_test": args.n, "bootstrap_resamples": args.resamples}
    if not args.skip_tpu:
        result.update(run_tpu(args.n, args.resamples))
    if not args.skip_torch:
        result.update(run_torch(args.n, args.torch_resamples, args.resamples))
    if "tpu_wall_s" in result and "torch_cpu_wall_s_extrapolated_50" in result:
        result["speedup"] = round(
            result["torch_cpu_wall_s_extrapolated_50"] / result["tpu_wall_s"], 1
        )
    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
