"""Multi-device (8 virtual CPU) sharded training-path tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmnn_sts_tpu.models.mlp import MLP
from mmnn_sts_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    microbatched_sharding,
    replicate,
)
from mmnn_sts_tpu.train.schedule import make_optimizer
from mmnn_sts_tpu.train.state import create_train_state
from mmnn_sts_tpu.train.steps import survival_train_superstep


def test_mesh_covers_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


def test_mesh_shape_validation():
    with pytest.raises(ValueError):
        make_mesh(shape=[3])  # 3 does not divide 8


def test_sharded_superstep_matches_single_device(rng):
    """The same superstep on an 8-way sharded batch must produce the same
    parameters as unsharded execution (psum-reduced grads == full-batch
    grads)."""
    a, b, f = 2, 8, 6
    x = jnp.asarray(rng.normal(size=(a, b, f)).astype(np.float32))
    e = jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32))

    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    # single-device run
    st1 = create_train_state(model, tx, x[0], seed=0)
    st1, aux1 = survival_train_superstep(st1, x, e, d, jax.random.key(0),
                                         blend=False, augment=False)

    # sharded run
    mesh = make_mesh()
    st2 = create_train_state(model, tx, x[0], seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    sh = NamedSharding(mesh, P(None, "data"))
    xs = jax.device_put(x, sh)
    es = jax.device_put(e, sh)
    ds = jax.device_put(d, sh)
    st2, aux2 = survival_train_superstep(st2, xs, es, ds, jax.random.key(0),
                                         blend=False, augment=False)

    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]), rel=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
        ),
        st1.params,
        st2.params,
    )


def test_sharded_grouped_superstep_matches_single_device(rng):
    """The grouped-microbatch vmap path (TPU.microbatch_group > 1) under
    SPMD sharding: group=2 on the 8-device mesh must reproduce the plain
    group=1 single-device result (advisor round 4 — the grouped tests in
    test_steps.py run unsharded, so this covers the group x SPMD
    interaction)."""
    a, b, f = 2, 8, 6
    x = jnp.asarray(rng.normal(size=(a, b, f)).astype(np.float32))
    e = jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32))

    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    st1 = create_train_state(model, tx, x[0], seed=0)
    st1, aux1 = survival_train_superstep(st1, x, e, d, jax.random.key(0),
                                         blend=False, augment=False)

    mesh = make_mesh()
    st2 = create_train_state(model, tx, x[0], seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    sh = NamedSharding(mesh, P(None, "data"))
    st2, aux2 = survival_train_superstep(
        st2, jax.device_put(x, sh), jax.device_put(e, sh),
        jax.device_put(d, sh), jax.random.key(0),
        blend=False, augment=False, group=2,
    )

    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]), rel=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
        ),
        st1.params,
        st2.params,
    )


def test_batch_shardings_layouts():
    mesh = make_mesh()
    bs = batch_sharding(mesh)
    assert bs.spec == P("data")
    ms = microbatched_sharding(mesh)
    assert ms.spec == P(None, "data")


def test_graft_dryrun_runs():
    """Run the driver's multichip dryrun contract EXACTLY as the driver
    does: a fresh subprocess. Running dryrun_multichip in-process after
    ~300 suite tests hit a fatal abort inside XLA:CPU's
    deserialize_executable when reading the cached dp x sp superstep
    (reproducible at the same test across full-suite runs, not
    reproducible solo or in a fresh process) — an XLA/process-state
    fragility, not a property of the dryrun. The driver always invokes a
    fresh interpreter, so that is the contract to test.

    Timing note (advisor round 4): on a WARM /root/repo/.jax_cache this
    finishes in ~2 min; after steps.py/model changes the cache is cold and
    the subprocess can legitimately sit in remote XLA compiles for up to
    the full 2400 s timeout with no progress output — that is a cold
    compile, not a hang."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=2400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("OK") >= 2, out.stdout  # data mesh + dp x sp


def test_checkpoint_roundtrip_on_mesh(rng, tmp_path):
    """Orbax save/restore of a mesh-replicated train state (multi-chip
    checkpointing path)."""
    from mmnn_sts_tpu.train import checkpoint as ckpt

    a, b, f = 2, 8, 6
    x = jnp.asarray(rng.normal(size=(a, b, f)).astype(np.float32))
    e = jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32))

    mesh = make_mesh()
    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    def committed_state(seed):
        st = create_train_state(model, tx, x[0], seed=seed)
        return st.replace(
            step=replicate(mesh, st.step),
            epoch=replicate(mesh, st.epoch),
            params=replicate(mesh, st.params),
            batch_stats=replicate(mesh, st.batch_stats),
            opt_state=replicate(mesh, st.opt_state),
            blend=replicate(mesh, st.blend),
            rng=replicate(mesh, st.rng),
        )

    st = committed_state(0)
    sh = NamedSharding(mesh, P(None, "data"))
    st, _ = survival_train_superstep(
        st, jax.device_put(x, sh), jax.device_put(e, sh),
        jax.device_put(d, sh), jax.random.key(0), blend=False, augment=False,
    )

    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, st, {"selection_metric": 1.0})
    mgr.wait()
    restored = mgr.restore(committed_state(99))
    assert restored is not None
    jax.tree.map(
        lambda p1, p2: np.testing.assert_array_equal(
            np.asarray(p1), np.asarray(p2)
        ),
        restored.params,
        st.params,
    )
    # restored leaves keep the replicated mesh sharding
    leaf = jax.tree.leaves(restored.params)[0]
    assert getattr(leaf.sharding, "mesh", None) is not None
    mgr.close()


def test_fused_epoch_sharded_matches_loop_of_supersteps(rng):
    """survival_train_epoch (whole epoch as one program, DP sharding
    constraints inside) produces the same parameters and per-step losses as
    looping survival_train_superstep over the same index batches."""
    from mmnn_sts_tpu.data.loader import EpochBatcher, build_device_dataset
    from mmnn_sts_tpu.train.steps import survival_train_epoch

    n, b, f = 16, 8, 6
    x = rng.normal(size=(n, f)).astype(np.float32)
    e = (rng.random((n, 2)) < 0.8).astype(np.float32)
    d = rng.integers(1, 100, size=(n, 2)).astype(np.float32)

    mesh = make_mesh()
    train = build_device_dataset(np.arange(n), mesh, clinical=x,
                                 events=e, durations=d)
    batcher = EpochBatcher(n, micro_batch=b, accum_steps=1, seed=0,
                           two_level=True)
    idx = batcher.epoch_indices(0)  # (2, 1, 8)

    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    def fresh_state():
        st = create_train_state(model, tx, jnp.zeros((b, f)), seed=0)
        return st.replace(
            params=replicate(mesh, st.params),
            batch_stats=replicate(mesh, st.batch_stats),
            opt_state=replicate(mesh, st.opt_state),
        )

    # reference: loop of supersteps over the same gathers, same keys
    keys = jax.random.split(jax.random.key(7), idx.shape[0])
    st_ref = fresh_state()
    ref_losses = []
    for s in range(idx.shape[0]):
        rows = idx[s]
        st_ref, aux = survival_train_superstep(
            st_ref,
            jnp.asarray(x[rows.reshape(-1)]).reshape(rows.shape + (f,)),
            jnp.asarray(e[rows.reshape(-1)]).reshape(rows.shape + (2,)),
            jnp.asarray(d[rows.reshape(-1)]).reshape(rows.shape + (2,)),
            keys[s], blend=False, augment=False,
        )
        ref_losses.append(float(aux["loss"]))

    st2 = fresh_state()
    with mesh:
        st2, out = survival_train_epoch(
            st2, train.model_inputs(), train.events, train.durations,
            jnp.asarray(idx, dtype=jnp.int32), jax.random.key(7),
            blend=False, augment=False, data_axis="data",
        )
    np.testing.assert_allclose(np.asarray(out["loss"]), ref_losses,
                               rtol=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
        ),
        st_ref.params,
        st2.params,
    )
