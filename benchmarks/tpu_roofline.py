"""Per-fusion HBM roofline for the flagship superstep's DenseNet body.

VERDICT r4 item 2b: the round-4 body attribution conceded a 2x gap
between the body's ~18% MFU and its ~35% architectural ceiling, waving
it at "BN/ReLU/concat bandwidth between GEMMs" with only a coarse
70-650 GB/s range. This probe replaces the range with arithmetic, taken
from the profiler trace itself: the TPU xplane attaches XLA's cost-model
`bytes_accessed` / `flops` / `hlo_category` to every op's event
metadata, so each op gets

    achieved GB/s   = bytes_accessed * execs / device-time
    achieved TFLOP/s = flops * execs / device-time

and a % of the v5e HBM roofline (819 GB/s) / bf16 MXU peak (197 TF/s).
An op near the HBM roofline is bandwidth-FLOOR-bound — no reformulation
touching the same bytes can beat it — which certifies that share of the
step. Ops far below BOTH rooflines are the remaining headroom.

The xplane is parsed directly (tensorflow.tsl xplane_pb2); the
tensorboard_plugin_profile converter in this environment is broken
against its own tensorflow (xspace_to_tools_data missing), so no
converter is involved.

Run on TPU (cache env vars set — CLAUDE.md):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_roofline.py \
      --out-json /tmp/roofline.json
Re-analyze an existing trace without touching hardware:
  python benchmarks/tpu_roofline.py --trace-dir /tmp/xroofline_... --steps 3
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile
import time

# the generated xplane protos predate protobuf 4's C++ descriptor pool
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

HBM_GBS = 819.0  # v5e HBM bandwidth (jax-ml.github.io/scaling-book)
MXU_TFLOPS = 197.0  # v5e bf16 peak


def xplane_op_table(trace_dir: str):
    """[(op display name, category, total_device_ps, execs, bytes/exec,
    flops/exec)] aggregated over the 'XLA Ops' line of the TPU plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    rows = {}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        em, sm = plane.event_metadata, plane.stat_metadata
        for ln in plane.lines:
            if ln.name != "XLA Ops":
                continue
            for ev in ln.events:
                r = rows.setdefault(ev.metadata_id, [0, 0])
                r[0] += ev.duration_ps
                r[1] += 1
        out = []
        for mid, (ps, n) in rows.items():
            md = em[mid]
            stats = {sm[s.metadata_id].name: s for s in md.stats}

            def val(name):
                s = stats.get(name)
                return int(s.uint64_value or s.int64_value) if s else 0

            cat = (stats["hlo_category"].str_value
                   if "hlo_category" in stats else "")
            out.append((md.display_name or md.name, cat, ps, n,
                        val("bytes_accessed"), val("flops")))
        return out
    raise RuntimeError("no TPU plane in trace")


def analyze(trace_dir: str, steps: int, top: int):
    table = xplane_op_table(trace_dir)
    rows = []
    for name, cat, ps, n, bytes_, flops in table:
        if ps == 0:
            continue
        sec = ps * 1e-12
        rows.append({
            "op": name,
            "category": cat,
            "ms_per_step": round(ps / 1e9 / steps, 3),
            "execs_per_step": round(n / steps, 1),
            "mb_per_exec": round(bytes_ / 1e6, 2),
            "achieved_gbs": round(bytes_ * n / sec / 1e9, 1),
            "pct_hbm_roofline": round(100 * bytes_ * n / sec / 1e9 / HBM_GBS,
                                      1),
            "achieved_tflops": round(flops * n / sec / 1e12, 2),
            "pct_mxu_peak": round(100 * flops * n / sec / 1e12 / MXU_TFLOPS,
                                  1),
        })
    # the scan wrapper ('while') double-counts its body; report it but
    # exclude from category totals
    body = [r for r in rows if r["category"] != "while"]
    by_cat = {}
    for r in body:
        c = by_cat.setdefault(r["category"] or "?", [0.0, 0.0, 0.0])
        c[0] += r["ms_per_step"]
        c[1] += r["mb_per_exec"] * r["execs_per_step"]
        c[2] += r["achieved_tflops"] * r["ms_per_step"] / 1e3
    cats = [
        {"category": k,
         "ms_per_step": round(v[0], 2),
         "gb_per_step": round(v[1] / 1e3, 3),
         "avg_gbs": round(v[1] / 1e3 / (v[0] / 1e3), 1) if v[0] else 0.0,
         "pct_hbm_roofline": round(
             100 * v[1] / 1e3 / (v[0] / 1e3) / HBM_GBS, 1) if v[0] else 0.0}
        for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1][0])
    ]
    rows.sort(key=lambda r: -r["ms_per_step"])
    return rows[:top], cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--augment", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--trace-dir", default="",
                    help="re-analyze an existing trace (no hardware)")
    ap.add_argument("--out-json", default="")
    args = ap.parse_args()

    trace_dir = args.trace_dir
    if not trace_dir:
        import sys

        import jax

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tpu_profile_step import build_step

        step, state = build_step(args)
        key = jax.random.key(0)
        t0 = time.perf_counter()
        state, aux = step(state, key)
        jax.device_get(aux["loss"])  # honest fence (docs/PERF.md)
        print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s",
              flush=True)
        trace_dir = tempfile.mkdtemp(prefix="xroofline_")
        with jax.profiler.trace(trace_dir):
            for _ in range(args.steps):
                key, k = jax.random.split(key)
                state, aux = step(state, k)
                jax.device_get(aux["loss"])
        print("trace dir:", trace_dir, flush=True)

    rows, cats = analyze(trace_dir, args.steps, args.top)

    print("\n| category | ms/step | GB/step | avg GB/s | % HBM roofline |")
    print("|---|---|---|---|---|")
    for c in cats:
        print(f"| {c['category']} | {c['ms_per_step']} | {c['gb_per_step']} "
              f"| {c['avg_gbs']} | {c['pct_hbm_roofline']} |")

    print("\n| op | category | ms/step | execs/step | MB/exec | GB/s | "
          "%HBM | TF/s | %MXU |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['op'][:48]} | {r['category']} | {r['ms_per_step']} | "
              f"{r['execs_per_step']} | {r['mb_per_exec']} | "
              f"{r['achieved_gbs']} | {r['pct_hbm_roofline']} | "
              f"{r['achieved_tflops']} | {r['pct_mxu_peak']} |")
    print(json.dumps({"rows": len(rows)}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"hbm_roofline_gbs": HBM_GBS,
                       "mxu_peak_tflops": MXU_TFLOPS,
                       "steps": args.steps, "categories": cats,
                       "ops": rows}, f, indent=1)


if __name__ == "__main__":
    main()
