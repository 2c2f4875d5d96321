"""Per-op device-time attribution for the flagship survival superstep.

VERDICT r2 item 1: publish a per-op device-time table for one superstep
(the xplane trace as a method), then attack the top entries. This script:

  * runs the production superstep (micro_batch 8, accum 8, 64^3 x 2ch,
    DenseNet121 + clinical MLP, blend, full augmentation) on the real chip;
  * captures a jax.profiler trace around a few fenced steps;
  * parses the xplane protobuf with tensorboard_plugin_profile's converter
    (framework_op_stats) into a per-op device-time table;
  * prints the table as markdown + JSON for docs/PERF.md.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_profile_step.py
Options:
  --augment / --no-augment  toggle the augmentation chain (attribution by
                            ablation cross-check)
  --steps N                 traced steps (default 3)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile
import time

# tensorboard_plugin_profile's generated protos predate protobuf 4's C++
# descriptor pool; force the pure-python implementation (must be set
# before google.protobuf is first imported).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def build_step(args):
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

    a, b, s = args.accum, args.batch, args.size
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(a, b, s, s, s, 2)).astype(np.float32) ** 2
        ),
        "clinical": jnp.asarray(rng.normal(size=(a, b, 11)).astype(np.float32)),
    }
    events = jnp.asarray((rng.random((a, b, 2)) < 0.7).astype(np.float32))
    durations = jnp.asarray(
        rng.integers(1, 2000, size=(a, b, 2)).astype(np.float32)
    )
    tx = make_optimizer(5e-4, 2, 100)
    state = create_train_state(
        model, tx, jax.tree.map(lambda x: x[0], batch), seed=42
    )

    def step(st, k):
        return survival_train_superstep(
            st, batch, events, durations, k, blend=True, augment=args.augment
        )

    return step, state


def parse_trace(trace_dir: str, top: int):
    """xplane.pb -> [(op_name, category, total_device_us, occurrences)]."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    # framework_op_stats CSV: one row per (op type, op name) with device time
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {"tqx": "out:csv;"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    cols = rows[0].keys() if rows else []

    def get(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] not in ("", None):
                try:
                    return float(r[n])
                except ValueError:
                    return r[n]
        return default

    table = []
    for r in rows:
        table.append(
            {
                "op": get(r, "Operation", "operation", default=""),
                "type": get(r, "Type", "type", default=""),
                "total_self_us": get(
                    r, "Total self-time (us)", "total_self_time_us",
                    "Total self time (us)",
                ),
                "avg_self_us": get(
                    r, "Avg. self-time (us)", "avg_self_time_us",
                    "Avg self time (us)",
                ),
                "occurrences": get(r, "#Occurrences", "occurrences"),
            }
        )
    if rows and not any(t["total_self_us"] for t in table):
        # schema drift: dump the raw header so the caller can adapt
        print("RAW_COLUMNS", list(cols))
        print(data[:2000])
    table.sort(key=lambda t: -float(t["total_self_us"] or 0))
    return table[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--augment", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--out-json", default="")
    args = ap.parse_args()

    import jax
    import numpy as np

    step, state = build_step(args)
    key = jax.random.key(0)

    t0 = time.perf_counter()
    state, aux = step(state, key)
    jax.device_get(aux["loss"])  # honest fence (docs/PERF.md)
    print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    times = []
    for _ in range(args.iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, aux = step(state, k)
        jax.device_get(aux["loss"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({"median_step_ms": round(med * 1e3, 1),
                      "all_ms": [round(t * 1e3, 1) for t in times]}),
          flush=True)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            state, aux = step(state, k)
            jax.device_get(aux["loss"])
    print("trace dir:", trace_dir, flush=True)

    table = parse_trace(trace_dir, args.top)
    total = sum(float(t["total_self_us"] or 0) for t in table)
    print(f"\n| op | type | total self us ({args.steps} steps) | avg us | n |")
    print("|---|---|---|---|---|")
    for t in table:
        print(
            f"| {str(t['op'])[:70]} | {t['type']} | "
            f"{float(t['total_self_us']):.0f} | "
            f"{float(t['avg_self_us'] or 0):.1f} | {t['occurrences']} |"
        )
    print(json.dumps({"top_total_us": total, "median_step_ms": med * 1e3}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"median_step_ms": med * 1e3, "ops": table}, f, indent=1)


if __name__ == "__main__":
    main()
