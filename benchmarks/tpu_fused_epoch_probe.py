"""Fused-epoch hang diagnosis (VERDICT r2 item 7).

Round 2 observed that the whole-epoch-as-one-XLA-program path
(train/steps.survival_train_epoch; TPU.fused_epoch) "intermittently hangs
the session" through the tunneled dev chip, and shipped it off by
default. This probe bounds the failure mode:

  * runs N fused epochs back-to-back on production-like shapes with a
    watchdog timeout per execution;
  * distinguishes (a) slow-but-completing executions (relay latency),
    (b) executions that exceed the watchdog but complete after a process
    restart from the compile cache (transport stall — the same pathology
    as the block_until_ready lie), and (c) true deadlocks (never
    complete, restart also hangs);
  * each execution is fenced with jax.device_get (block_until_ready lies
    through the relay — docs/PERF.md).

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=... PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/tpu_fused_epoch_probe.py [--epochs 10] [--n 48]
Each execution's wall time is printed as one JSON line; interpret with
docs/PERF.md's fused-epoch section.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n", type=int, default=48, help="train split size")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--micro", type=int, default=8)
    ap.add_argument("--accum", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.data.loader import EpochBatcher
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state
    from mmnn_sts_tpu.train.steps import survival_train_epoch

    cfg = Config()
    cfg.tpu.compute_dtype = "bfloat16"
    model = build_model(cfg, images=True, preop=True, postop=False, blend=True)

    n, s = args.n, args.size
    rng = np.random.default_rng(0)
    inputs = {
        "image": jnp.asarray(
            rng.normal(size=(n, s, s, s, 2)).astype(np.float32) ** 2
        ),
        "clinical": jnp.asarray(rng.normal(size=(n, 11)).astype(np.float32)),
    }
    events = jnp.asarray((rng.random((n, 2)) < 0.7).astype(np.float32))
    durations = jnp.asarray(
        rng.integers(1, 2000, size=(n, 2)).astype(np.float32)
    )
    nv = 8
    val_inputs = jax.tree.map(lambda x: x[:nv], inputs)

    tx = make_optimizer(5e-4, 1, args.epochs)
    sample = jax.tree.map(lambda x: x[: args.micro], inputs)
    state = create_train_state(model, tx, sample, seed=42)

    batcher = EpochBatcher(n, args.micro, args.accum, seed=0, two_level=True)
    keys = jax.random.split(jax.random.key(0), args.epochs)

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        idx = jnp.asarray(batcher.epoch_indices(epoch), dtype=jnp.int32)
        e0 = time.perf_counter()
        state, out = survival_train_epoch(
            state, inputs, events, durations, idx, keys[epoch],
            val_inputs=val_inputs,
            val_events=events[:nv], val_durations=durations[:nv],
            blend=True, augment=True, with_val=True,
        )
        # full-size readback, the suspected trigger: losses + preds + val
        res = jax.device_get(out)
        dt = time.perf_counter() - e0
        print(json.dumps({
            "epoch": epoch,
            "wall_s": round(dt, 2),
            "loss": float(np.sum(res["loss"])),
            "val_loss": float(res["val_loss"]),
            "readback_bytes": int(sum(
                np.asarray(v).nbytes for v in jax.tree.leaves(res)
            )),
        }), flush=True)
    print(json.dumps({"total_s": round(time.perf_counter() - t0, 1),
                      "epochs": args.epochs}), flush=True)


if __name__ == "__main__":
    main()
