"""Dispatch-queue-depth probe for the relay-hang pathology (VERDICT r2 item 7).

Round 2 observed the fused-epoch program "intermittently hangs the
session"; round 3 found that a chain of UNFENCED per-superstep dispatches
(bench.py's pipelined diagnostic) reproduces the hang with the very same
compiled program that never hangs when fenced per step. That localizes
the pathology to the transport (deep dispatch queues through the tunnel),
not to any single XLA program. This probe quantifies it:

  * for each queue depth d in DEPTHS, runs REPS chains of d supersteps
    with ONE device_get fence at the end of each chain;
  * each depth runs in its own child process with a hard timeout, so a
    hang is recorded (not suffered) and the next depth still runs from
    the warm compile cache;
  * per-chain wall time and per-depth hang incidence are printed as JSON.

Interpretation (docs/PERF.md "fused-epoch" section): depth 1 never hangs
across the repo's entire bench history; if hang incidence grows with
depth while per-step time falls toward the true device time, the
fused-epoch hang is a relay flow-control stall — classification (b) of
benchmarks/tpu_fused_epoch_probe.py — and the off-by-default ships on
evidence, not suspicion.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_queue_depth_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DEPTHS = (1, 2, 4, 8)
REPS = 5


def child(depth: int, reps: int) -> None:
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
    model = build_model(cfg, images=True, preop=True, postop=False, blend=True)

    accum, b, s = 8, 8, 64
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(accum, b, s, s, s, 2)).astype(np.float32) ** 2
        ),
        "clinical": jnp.asarray(
            rng.normal(size=(accum, b, 11)).astype(np.float32)
        ),
    }
    events = jnp.asarray((rng.random((accum, b, 2)) < 0.7).astype(np.float32))
    durations = jnp.asarray(
        rng.integers(1, 2000, size=(accum, b, 2)).astype(np.float32)
    )
    tx = make_optimizer(5e-4, 2, 100)
    state = create_train_state(
        model, tx, jax.tree.map(lambda x: x[0], batch), seed=42
    )

    def step(st, k):
        return survival_train_superstep(
            st, batch, events, durations, k, blend=True
        )

    key = jax.random.key(0)
    state, aux = step(state, key)
    jax.device_get(aux["loss"])  # warmup/compile; honest fence (PERF.md)

    keys = list(jax.random.split(key, depth * reps))
    jax.block_until_ready(keys)
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(depth):
            state, aux = step(state, keys[r * depth + i])
        jax.device_get(aux["loss"])  # one fence per chain
        dt = time.perf_counter() - t0
        print(json.dumps({
            "depth": depth, "rep": r, "chain_s": round(dt, 3),
            "ms_per_step": round(dt / depth * 1e3, 1),
        }), flush=True)


def main() -> int:
    env = dict(os.environ, MMNN_QDP_CHILD="1")
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    summary = []
    for depth in DEPTHS:
        env["MMNN_QDP_DEPTH"] = str(depth)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=600, capture_output=True, text=True,
            )
            stdout, hung = out.stdout, False
        except subprocess.TimeoutExpired as e:
            stdout = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            hung = True
        rows = [json.loads(ln) for ln in stdout.splitlines()
                if ln.startswith("{")]
        for row in rows:
            print(json.dumps(row), flush=True)
        done = len(rows)
        summary.append({
            "depth": depth, "chains_completed": done, "chains_asked": REPS,
            "hung": hung,
            "median_ms_per_step": (
                sorted(r["ms_per_step"] for r in rows)[done // 2]
                if rows else None
            ),
        })
        print(json.dumps({"depth_summary": summary[-1]}), flush=True)
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    if os.environ.get("MMNN_QDP_CHILD"):
        child(int(os.environ["MMNN_QDP_DEPTH"]), REPS)
    else:
        raise SystemExit(main())
