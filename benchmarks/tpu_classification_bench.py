"""Classification-mode training throughput on the flagship model.

The reference's classification loop takes ONE optimizer step per batch-8
with no gradient accumulation (/root/reference/main.py:205-217), so its
TPU-native equivalent (train/steps.classification_train_step: augment +
forward + blended BCE-with-pos_weight + SGD/OneCycle update in one jit)
is a small program dispatched per batch — unlike the survival superstep,
which amortizes the relay round-trip over 64 volumes. This measures the
fenced per-step cost of that mode at production shapes (DenseNet121-3D
64^3 x 2ch + clinical MLP, blend heads).

Round 5 adds the FUSED-EPOCH measurement (VERDICT r4 item 3): the
per-batch mode pays the ~37 ms relay round-trip on every batch-8
dispatch; `classification_train_epoch` (train/steps.py — lax.scan over
the epoch's batches on a device-resident split, equivalence-tested in
tests/test_steps.py) dispatches ONCE per epoch, amortizing the RTT over
the whole cohort exactly like the survival superstep amortizes it over 8
microbatches. Both numbers print in one JSON line.

Run on TPU (set the cache env vars — CLAUDE.md):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_classification_bench.py
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state
    from mmnn_sts_tpu.train.steps import classification_train_step

    cfg = Config()
    cfg.tpu.compute_dtype = "bfloat16"
    model = build_model(cfg, images=True, preop=True, postop=False,
                        blend=True)
    b, s = 8, 64
    rng = np.random.default_rng(0)
    inputs = {
        "image": jnp.asarray(
            rng.normal(size=(b, s, s, s, 2)).astype(np.float32) ** 2),
        "clinical": jnp.asarray(rng.normal(size=(b, 11)).astype(np.float32)),
    }
    labels = jnp.asarray((rng.random((b, 2)) < 0.5).astype(np.float32))
    pos_w = jnp.asarray([1.7, 2.1], np.float32)  # data-derived in the loop
    tx = make_optimizer(5e-4, 2, 100)
    state = create_train_state(model, tx, inputs, seed=42)

    st, aux = classification_train_step(state, inputs, labels, pos_w,
                                        jax.random.key(0), blend=True)
    jax.device_get(aux["loss"])  # honest fence (docs/PERF.md)
    keys = list(jax.random.split(jax.random.key(1), 20))
    jax.block_until_ready(keys)
    ts = []
    for k in keys:
        t0 = time.perf_counter()
        st, aux = classification_train_step(st, inputs, labels, pos_w, k,
                                            blend=True)
        jax.device_get(aux["loss"])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    result = {"classification_step_ms": round(dt * 1e3, 1),
              "volumes_per_sec": round(b / dt, 1)}

    if not os.environ.get("MMNN_CLASS_BENCH_SKIP_FUSED"):
        from mmnn_sts_tpu.train.steps import classification_train_epoch

        # Fused epoch: resident split of N patients, S batches of B per
        # epoch as ONE XLA program (one dispatch + one readback per
        # epoch). N=64 mirrors a small cohort; the per-epoch readback is
        # the loss vector (S floats).
        n = 64
        split_inputs = {
            "image": jnp.asarray(
                rng.normal(size=(n, s, s, s, 2)).astype(np.float32) ** 2),
            "clinical": jnp.asarray(
                rng.normal(size=(n, 11)).astype(np.float32)),
        }
        split_labels = jnp.asarray(
            (rng.random((n, 2)) < 0.5).astype(np.float32))
        steps_per_epoch = n // b
        idx = jnp.arange(n, dtype=jnp.int32).reshape(steps_per_epoch, b)

        st2 = create_train_state(model, tx, inputs, seed=42)
        st2, out = classification_train_epoch(
            st2, split_inputs, split_labels, pos_w, idx, jax.random.key(0),
            blend=True)
        jax.device_get(out["loss"])  # honest fence
        epoch_keys = list(jax.random.split(jax.random.key(2), 10))
        jax.block_until_ready(epoch_keys)
        ets = []
        for k in epoch_keys:
            t0 = time.perf_counter()
            st2, out = classification_train_epoch(
                st2, split_inputs, split_labels, pos_w, idx, k, blend=True)
            jax.device_get(out["loss"])
            ets.append(time.perf_counter() - t0)
        edt = float(np.median(ets))
        result.update({
            "fused_epoch_ms": round(edt * 1e3, 1),
            "fused_epoch_step_ms": round(edt * 1e3 / steps_per_epoch, 1),
            "fused_volumes_per_sec": round(n / edt, 1),
            "fused_epoch_batches": steps_per_epoch,
        })

    print(json.dumps(result))


if __name__ == "__main__":
    main()
