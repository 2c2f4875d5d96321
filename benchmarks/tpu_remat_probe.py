"""Measure what TPU.remat buys: compiled HBM footprint + step time.

Compiles the flagship blended survival superstep with remat OFF and ON at
(a) the production configuration (micro-batch 8, 64^3 x 2ch) and
(b) a larger configuration (--big-size/--big-batch, default 96^3 x 8) whose
activations stress one chip's HBM, and prints each executable's
memory_analysis (temp/argument/output bytes) plus, where it executes, the
fenced median step time. A configuration that OOMs at compile time is
reported as such — the point of remat is moving that boundary.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_remat_probe.py
"""

from __future__ import annotations

import argparse
import json
import time


def probe(size: int, batch: int, accum: int, remat: bool, iters: int,
          execute: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state
    from mmnn_sts_tpu.train.steps import survival_train_superstep

    cfg = Config()
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.remat = remat
    model = build_model(cfg, images=True, preop=True, postop=False, blend=True)

    rng = np.random.default_rng(0)
    batch_tree = {
        "image": jnp.asarray(
            rng.normal(size=(accum, batch, size, size, size, 2))
            .astype(np.float32) ** 2
        ),
        "clinical": jnp.asarray(
            rng.normal(size=(accum, batch, 11)).astype(np.float32)
        ),
    }
    events = jnp.asarray(
        (rng.random((accum, batch, 2)) < 0.7).astype(np.float32)
    )
    durations = jnp.asarray(
        rng.integers(1, 2000, size=(accum, batch, 2)).astype(np.float32)
    )
    tx = make_optimizer(5e-4, 2, 100)
    state = create_train_state(
        model, tx, jax.tree.map(lambda x: x[0], batch_tree), seed=42
    )
    key = jax.random.key(0)

    row = {"size": size, "micro_batch": batch, "accum": accum,
           "remat": remat}
    try:
        lowered = survival_train_superstep.lower(
            state, batch_tree, events, durations, key, blend=True
        )
        compiled = lowered.compile()
    except Exception as e:  # noqa: BLE001 — OOM at compile is the datum
        row["compile_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(json.dumps(row), flush=True)
        return row

    mem = compiled.memory_analysis()
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(mem, attr, None)
        if v is not None:
            row[attr.replace("_size_in_bytes", "_mb")] = round(v / 2**20, 1)

    if execute:
        state, aux = survival_train_superstep(
            state, batch_tree, events, durations, key, blend=True
        )
        jax.device_get(aux["loss"])
        times = []
        keys = list(jax.random.split(key, iters))
        jax.block_until_ready(keys)
        for k in keys:
            t0 = time.perf_counter()
            state, aux = survival_train_superstep(
                state, batch_tree, events, durations, k, blend=True
            )
            jax.device_get(aux["loss"])
            times.append(time.perf_counter() - t0)
        row["step_ms"] = round(float(np.median(times)) * 1e3, 1)
        row["volumes_per_sec"] = round(accum * batch / np.median(times), 1)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--big-size", type=int, default=96)
    ap.add_argument("--big-batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--skip-big", action="store_true")
    ap.add_argument("--no-execute", action="store_true")
    args = ap.parse_args()

    rows = []
    for remat in (False, True):
        rows.append(probe(args.size, args.batch, args.accum, remat,
                          args.iters, execute=not args.no_execute))
    if not args.skip_big:
        for remat in (False, True):
            rows.append(probe(args.big_size, args.big_batch, args.accum,
                              remat, args.iters, execute=False))
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
