"""Does the `space` mesh axis actually buy activation memory at large
volumes? (VERDICT r4 stretch item 7.)

docs/SCALING.md's central claim is that volumes whose activations exceed
one chip's HBM shard over the hybrid ("data", "space") mesh
(parallel/mesh.py) — the volume depth axis spatially partitioned, XLA
inserting conv halo exchanges and BN cross-shard reductions. Remat was
measured nearly useless at <=96^3 (docs/PERF.md round 4), so `space` is
the designated memory lever. This probe turns the claim into numbers:

  for each --sizes entry, compile (AOT — no execution needed) the FULL
  flagship survival superstep (densenet121 64->... , blend, augment)
  single-device and on a dp x sp mesh, and print XLA's per-device
  memory_analysis (temp/argument/output bytes). The dp x sp temp size
  should fall ~1/n_space vs single-device; the single-device temp at the
  largest size exceeding the v5e HBM budget (16 GB minus params/cohort)
  is the "would OOM" line the sharded compile walks under.

Optionally --run-one-step executes one step on the sharded mesh (CPU
virtual devices) to show the compiled program is not just analyzable but
executable.

CPU virtual mesh (layouts differ from TPU in detail, not in the /n_space
scaling; the single-chip TPU numbers for 64^3/96^3 are measured in
docs/PERF.md):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python benchmarks/space_axis_memory_probe.py \
      --sizes 96 128 --batch 2 --accum 2
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[96, 128])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--model", default="densenet121")
    ap.add_argument("--space", type=int, default=2,
                    help="space-axis extent of the dp x sp mesh")
    ap.add_argument("--run-one-step", action="store_true")
    ap.add_argument("--out-json", default="")
    args = ap.parse_args()

    import jax

    # Force CPU when requested via env (the axon plugin prepends itself,
    # so the env var alone is ignored — CLAUDE.md), and enable the
    # persistent compile cache programmatically (env vars ignored on CPU).
    import os
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001
            pass
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001
        pass

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.parallel.mesh import make_mesh, replicate
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state
    from mmnn_sts_tpu.train.steps import survival_train_superstep

    cfg = Config()
    cfg.image_model.name = args.model
    cfg.tpu.compute_dtype = "bfloat16"
    model = build_model(cfg, images=True, preop=True, postop=False,
                        blend=True)
    tx = make_optimizer(5e-4, 2, 100)

    n_dev = len(jax.devices())
    results = []
    for s in args.sizes:
        a, b = args.accum, args.batch
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(
                rng.normal(size=(a, b, s, s, s, 2)).astype(np.float32)),
            "clinical": jnp.asarray(
                rng.normal(size=(a, b, 11)).astype(np.float32)),
        }
        events = jnp.asarray((rng.random((a, b, 2)) < 0.7).astype(np.float32))
        durations = jnp.asarray(
            rng.integers(1, 2000, size=(a, b, 2)).astype(np.float32))
        sample = jax.tree.map(lambda x: x[0], batch)

        def mem(state, bt, ev, du, label, mesh=None, axes=(None, None)):
            da, sa = axes

            def call(st, bb, ee, dd, k):
                return survival_train_superstep(
                    st, bb, ee, dd, k, blend=True, data_axis=da,
                    space_axis=sa)

            fn = jax.jit(call, donate_argnums=(0,))
            import contextlib
            ctx = mesh if mesh is not None else contextlib.nullcontext()
            with ctx:
                compiled = fn.lower(state, bt, ev, du,
                                    jax.random.key(0)).compile()
            m = compiled.memory_analysis()
            row = {
                "size": s, "config": label,
                "temp_mb": round(m.temp_size_in_bytes / 1e6, 1),
                "arg_mb": round(m.argument_size_in_bytes / 1e6, 1),
                "out_mb": round(m.output_size_in_bytes / 1e6, 1),
            }
            print(json.dumps(row), flush=True)
            results.append(row)
            return fn

        # single device (uncommitted arrays)
        state1 = create_train_state(model, tx, sample, seed=42)
        mem(state1, batch, events, durations, "single-device")

        # dp x sp hybrid
        if n_dev >= args.space and n_dev % args.space == 0:
            mesh = make_mesh(shape=[n_dev // args.space, args.space],
                             axis_names=("data", "space"))
            state2 = create_train_state(model, tx, sample, seed=42)
            state2 = state2.replace(
                params=replicate(mesh, state2.params),
                batch_stats=replicate(mesh, state2.batch_stats),
                opt_state=replicate(mesh, state2.opt_state),
            )
            sh_b = NamedSharding(mesh, P(None, "data"))
            sh_v = NamedSharding(mesh, P(None, "data", "space"))
            batch2 = {
                "image": jax.device_put(batch["image"], sh_v),
                "clinical": jax.device_put(batch["clinical"], sh_b),
            }
            ev2 = jax.device_put(events, sh_b)
            du2 = jax.device_put(durations, sh_b)
            fn = mem(state2, batch2, ev2, du2,
                     f"dp{n_dev // args.space} x sp{args.space}",
                     mesh=mesh, axes=("data", "space"))
            if args.run_one_step:
                st, aux = fn(state2, batch2, ev2, du2, jax.random.key(0))
                loss = float(aux["loss"])
                print(json.dumps({"size": s, "executed": True,
                                  "loss_finite": bool(np.isfinite(loss))}),
                      flush=True)

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
