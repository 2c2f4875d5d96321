"""Batch-size sweep + MFU accounting for the flagship survival superstep.

VERDICT r1 item 7: settle the Pallas axis — either a kernel that beats XLA
or a measured demonstration that the superstep is latency-floor-bound, with
the MFU ceiling recorded. This script produces the sweep table:

  * for micro-batch sizes 4..64 (accum fixed at 8), time the full blended
    multimodal survival superstep (train step, on-device augmentation,
    donated state) on the real chip;
  * pull the compiled HLO's FLOP count via cost_analysis() so the achieved
    TFLOP/s and MFU are computed from the exact executable, not an
    analytic guess;
  * report per-step time vs work: if time grows far sublinearly at small
    batch, the small-batch regime is dispatch/latency-bound and no kernel
    can win there; the large-batch rows show the compute ceiling XLA
    reaches.

Run on TPU:  python benchmarks/tpu_sweep.py [--out docs/SWEEP.md]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# v5e bf16 peak per chip (jax-ml.github.io/scaling-book); used only to
# normalize MFU — the achieved TFLOP/s column is hardware-agnostic.
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[4, 8, 16, 32, 64])
    # microbatch grouping (TPU.microbatch_group): one row per value, at the
    # production micro-batch — semantics-preserving, so this is the sweep
    # axis that matters for the shipped configuration
    ap.add_argument("--groups", type=int, nargs="*", default=[1])
    # A/B the Pallas fused BN+ReLU+1x1-conv bottleneck kernel
    # (ops/pallas/fused_dense.py) against XLA's native fusion at HEAD —
    # the standing rejection was measured in the round-1/2 environment,
    # before the S2D stem / channels-leading augment / interp fix
    # (VERDICT r4 item 2a).
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state
    from mmnn_sts_tpu.train.steps import survival_train_superstep

    cfg = Config()
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.use_pallas_fused_dense = bool(args.pallas)
    model = build_model(cfg, images=True, preop=True, postop=False, blend=True)

    rows = []
    a, s = args.accum, 64
    for b, g in [(b, g) for b in args.batches for g in args.groups]:
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(
                rng.normal(size=(a, b, s, s, s, 2)).astype(np.float32) ** 2
            ),
            "clinical": jnp.asarray(
                rng.normal(size=(a, b, 11)).astype(np.float32)
            ),
        }
        events = jnp.asarray((rng.random((a, b, 2)) < 0.7).astype(np.float32))
        durations = jnp.asarray(
            rng.integers(1, 2000, size=(a, b, 2)).astype(np.float32)
        )
        tx = make_optimizer(5e-4, 2, 100)
        sample = jax.tree.map(lambda x: x[0], batch)
        state = create_train_state(model, tx, sample, seed=42)

        def step(st, k):
            return survival_train_superstep(
                st, batch, events, durations, k, blend=True, group=g
            )

        key = jax.random.key(0)
        # warm the jit cache first; the cost-analysis lower().compile() then
        # hits the persistent compile cache instead of recompiling
        state, aux = step(state, key)
        jax.device_get(aux["loss"])  # honest fence (docs/PERF.md)
        try:
            lowered = jax.jit(
                lambda st, k: survival_train_superstep(
                    st, batch, events, durations, k, blend=True, group=g
                )
            ).lower(state, key)
            flops = float(lowered.compile().cost_analysis()["flops"])
            # XLA's cost analysis counts a while/scan BODY ONCE, ignoring
            # the trip count (verified: a scan of 8 matmuls reports 1
            # matmul's FLOPs; an unrolled loop reports 8x). The superstep
            # scans accum/group iterations, each processing `group`
            # microbatches, so the whole-superstep FLOPs are body x
            # (accum/group). (Ops outside the scan — optimizer, blend — are
            # counted once correctly; they are <1% of the total, so this
            # overcounts them by the trip count, a negligible error in the
            # other direction.) Earlier rounds' MFU tables divided the
            # BODY count by the superstep time, understating MFU by ~8x —
            # see docs/PERF.md round-3 correction.
            flops *= a / g
        except Exception:  # noqa: BLE001 — cost model absent on some backends
            flops = float("nan")

        times = []
        for _ in range(args.iters):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            state, aux = step(state, k)
            # device_get, not block_until_ready: the latter resolves before
            # execution completes through the relay (docs/PERF.md)
            jax.device_get(aux["loss"])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        volumes = a * b
        tflops = flops / dt / 1e12 if np.isfinite(flops) else float("nan")
        rows.append(
            {
                "micro_batch": b,
                "group": g,
                "pallas": bool(args.pallas),
                "superbatch_volumes": volumes,
                "step_ms": round(dt * 1e3, 2),
                "ms_per_volume": round(dt * 1e3 / volumes, 3),
                "volumes_per_sec": round(volumes / dt, 1),
                "hlo_gflops": round(flops / 1e9, 1) if np.isfinite(flops) else None,
                "achieved_tflops": round(tflops, 1) if np.isfinite(tflops) else None,
                "mfu_vs_v5e_bf16": (
                    round(tflops / V5E_BF16_PEAK_TFLOPS, 3)
                    if np.isfinite(tflops) else None
                ),
            }
        )
        print(json.dumps(rows[-1]))

    if args.out:
        hdr = list(rows[0].keys())
        lines = [
            "| " + " | ".join(hdr) + " |",
            "|" + "---|" * len(hdr),
        ]
        for r in rows:
            lines.append("| " + " | ".join(str(r[k]) for k in hdr) + " |")
        with open(args.out, "a") as f:
            f.write("\n" + "\n".join(lines) + "\n")
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
