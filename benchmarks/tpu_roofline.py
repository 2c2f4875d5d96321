"""Per-fusion HBM roofline for the flagship superstep's DenseNet body.

VERDICT r4 item 2b: the round-4 body attribution conceded a 2x gap
between the body's ~18% MFU and its ~35% architectural ceiling, waving
it at "BN/ReLU/concat bandwidth between GEMMs" with only a coarse
70-650 GB/s range. This probe replaces the range with arithmetic:

  1. compile the production superstep and parse its optimized HLO into a
     per-op map {name -> bytes touched per execution} (sum of operand +
     result buffer sizes from the shape strings — an upper bound on
     bytes that must cross HBM for ops whose operands aren't resident);
  2. capture an xplane trace of a few fenced steps and take each op's
     device self-time and execution count (the converter's
     framework_op_stats lane, as benchmarks/tpu_profile_step.py);
  3. join on op name: achieved GB/s = bytes * execs / device-time, and
     % of the v5e HBM roofline (819 GB/s).

An op near the roofline is bandwidth-FLOOR-bound: no reformulation that
touches the same bytes can be faster, certifying that share of the step.
Ops far below the roofline (and below MXU peak) are the remaining
headroom candidates.

Run on TPU (cache env vars set — CLAUDE.md):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_roofline.py \
      --out-json /tmp/roofline.json
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import tempfile
import time

HBM_GBS = 819.0  # v5e HBM bandwidth (jax-ml.github.io/scaling-book)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1,
}

_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^=]*?\)|\S+)\s+"
    r"([\w\-]+)\(([^)]*)\)"
)


def _shape_bytes(type_str: str) -> int:
    """Total bytes of every array shape in an HLO type string (handles
    tuples by summing members; token/opaque contribute 0)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def parse_hlo_bytes(hlo_text: str) -> dict:
    """name -> {out_bytes, in_bytes, opcode} for every op definition.

    Operand bytes are resolved through a first pass that records each
    op's result bytes; operand tokens that aren't resolvable names
    (literals, computation refs) contribute 0.
    """
    defs = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, type_str, opcode, operands = m.groups()
        defs[name] = {
            "out_bytes": _shape_bytes(type_str),
            "opcode": opcode,
            "operand_names": [
                tok.strip().lstrip("%")
                for tok in operands.split(",") if tok.strip()
            ],
        }
    for d in defs.values():
        d["in_bytes"] = sum(
            defs[o]["out_bytes"] for o in d.pop("operand_names") if o in defs
        )
    return defs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--augment", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out-json", default="")
    args = ap.parse_args()

    import jax
    import numpy as np

    sys.path.insert(0, str(__file__).rsplit("/", 1)[0])
    from tpu_profile_step import build_step, parse_trace

    step, state = build_step(args)
    key = jax.random.key(0)

    t0 = time.perf_counter()
    state, aux = step(state, key)
    jax.device_get(aux["loss"])  # honest fence (docs/PERF.md)
    print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # Optimized HLO of the very executable being traced (jit cache warm,
    # so lower().compile() re-uses the compiled program).
    lowered = jax.jit(lambda st, k: step(st, k)).lower(state, key)
    hlo = lowered.compile().as_text()
    print(f"optimized HLO: {len(hlo) / 1e6:.1f} MB", flush=True)
    byte_map = parse_hlo_bytes(hlo)
    del hlo

    trace_dir = tempfile.mkdtemp(prefix="xroofline_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            state, aux = step(state, k)
            jax.device_get(aux["loss"])
    table = parse_trace(trace_dir, top=400)

    joined = []
    for t in table:
        name = str(t["op"])
        occ = float(t["occurrences"] or 0)
        us = float(t["total_self_us"] or 0)
        info = byte_map.get(name)
        if info is None or us <= 0:
            continue
        bytes_per_exec = info["out_bytes"] + info["in_bytes"]
        gbs = bytes_per_exec * occ / (us * 1e-6) / 1e9
        joined.append({
            "op": name,
            "opcode": info["opcode"],
            "ms_per_step": round(us / 1e3 / args.steps, 2),
            "execs_per_step": int(occ / args.steps),
            "mb_per_exec": round(bytes_per_exec / 1e6, 2),
            "achieved_gbs": round(gbs, 1),
            "pct_of_hbm_roofline": round(100 * gbs / HBM_GBS, 1),
        })
    joined.sort(key=lambda r: -r["ms_per_step"])
    joined = joined[: args.top]

    print("\n| op | opcode | ms/step | execs/step | MB/exec | GB/s | % roofline |")
    print("|---|---|---|---|---|---|---|")
    for r in joined:
        print(f"| {r['op'][:60]} | {r['opcode']} | {r['ms_per_step']} | "
              f"{r['execs_per_step']} | {r['mb_per_exec']} | "
              f"{r['achieved_gbs']} | {r['pct_of_hbm_roofline']} |")
    out = {"hbm_roofline_gbs": HBM_GBS, "steps": args.steps, "rows": joined}
    print(json.dumps({"rows": len(joined)}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
