"""Spatial partitioning ('space' mesh axis) of the MRI volume grid.

The sequence-parallel analogue for this workload (SURVEY.md §5
"long-context" row: the context knob is voxel resolution). A
("data", "space") mesh shards the batch over `data` and the volume depth
axis over `space`; XLA's SPMD partitioner inserts halo exchanges for the
3D convolutions and cross-shard reductions for BatchNorm/pooling. These
tests prove the partitioned program computes the SAME training step as
unsharded execution, and that the loader places volumes on both axes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmnn_sts_tpu.models.tinycnn import TinyCNN
from mmnn_sts_tpu.parallel.mesh import (
    data_axis_size,
    make_mesh,
    replicate,
    space_axis_size,
    volume_sharding,
)
from mmnn_sts_tpu.train.schedule import make_optimizer
from mmnn_sts_tpu.train.state import create_train_state
from mmnn_sts_tpu.train.steps import survival_train_superstep


def _space_mesh():
    return make_mesh(shape=[4, 2], axis_names=("data", "space"))


def test_mesh_axis_sizes():
    mesh = _space_mesh()
    assert data_axis_size(mesh) == 4
    assert space_axis_size(mesh) == 2
    # 1-axis mesh: space size is 1, data covers all devices
    flat = make_mesh()
    assert space_axis_size(flat) == 1
    assert data_axis_size(flat) == 8


def test_space_only_mesh_never_names_a_missing_data_axis():
    """A mesh without a 'data' axis (pure spatial partitioning) must get
    replicated batch specs, not a trace-time crash on P(..., 'data')."""
    from mmnn_sts_tpu.data.loader import build_device_dataset
    from mmnn_sts_tpu.parallel.mesh import (
        batch_sharding,
        microbatched_sharding,
    )
    from mmnn_sts_tpu.train.loop import _data_axis

    mesh = make_mesh(shape=[8], axis_names=("space",))
    assert batch_sharding(mesh).spec == P(None)
    assert microbatched_sharding(mesh).spec == P()
    assert volume_sharding(mesh, 0).spec == P(None, "space")
    assert _data_axis(mesh, 8) is None
    # end-to-end: residency placement + a batch gather on that mesh
    rng = np.random.default_rng(0)
    ds = build_device_dataset(
        uids=np.arange(16),
        mesh=mesh,
        image_volumes=rng.normal(size=(16, 8, 8, 8, 1)).astype(np.float32),
        events=(rng.random((16, 2)) < 0.7).astype(np.float32),
        durations=rng.integers(1, 50, (16, 2)).astype(np.float32),
    )
    from mmnn_sts_tpu.data.loader import gather_superbatch

    batch = gather_superbatch(ds, np.arange(8).reshape(2, 4), mesh)
    assert batch["inputs"].shape == (2, 4, 8, 8, 8, 1)  # image-only: bare
    assert "space" in str(batch["inputs"].sharding.spec)


def test_volume_sharding_specs():
    mesh = _space_mesh()
    assert volume_sharding(mesh, 0).spec == P("data", "space")
    assert volume_sharding(mesh, 1).spec == P(None, "data", "space")
    # without a space axis the depth entry is dropped
    flat = make_mesh()
    assert volume_sharding(flat, 0).spec == P("data", None)


def test_loader_places_volumes_on_both_axes(rng):
    from mmnn_sts_tpu.data.loader import build_device_dataset

    mesh = _space_mesh()
    n, s = 8, 16
    vols = rng.normal(size=(n, s, s, s, 1)).astype(np.float32)
    clin = rng.normal(size=(n, 5)).astype(np.float32)
    e = (rng.random((n, 2)) < 0.8).astype(np.float32)
    d = rng.integers(1, 100, size=(n, 2)).astype(np.float32)
    ds = build_device_dataset(np.arange(n), mesh, image_volumes=vols,
                              clinical=clin, events=e, durations=d)
    assert ds.inputs["image"].sharding.spec == P("data", "space")
    assert ds.inputs["clinical"].sharding.spec == P("data")


def test_spatially_sharded_superstep_matches_single_device(rng):
    """One survival superstep on a (data=4, space=2) mesh — batch sharded
    4-way, volume depth sharded 2-way — must produce the same loss and
    parameters as unsharded execution."""
    a, b, s = 1, 4, 16
    x = jnp.asarray(rng.normal(size=(a, b, s, s, s, 1)).astype(np.float32))
    e = jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32))

    model = TinyCNN(in_channels=1, out_channels=2, feature_channels=4,
                    dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    st1 = create_train_state(model, tx, x[0], seed=0)
    st1, aux1 = survival_train_superstep(st1, x, e, d, jax.random.key(0),
                                         blend=False, augment=False)

    mesh = _space_mesh()
    st2 = create_train_state(model, tx, x[0], seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", "space")))
    sh = NamedSharding(mesh, P(None, "data"))
    st2, aux2 = survival_train_superstep(
        st2, xs, jax.device_put(e, sh), jax.device_put(d, sh),
        jax.random.key(0), blend=False, augment=False,
    )

    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]), rel=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
        ),
        st1.params,
        st2.params,
    )


def test_anchored_superstep_matches_single_device(rng):
    """The post-augment sharding anchor (data_axis/space_axis on
    survival_train_superstep — round 5): with the constraint active the
    partitioned program must still equal unsharded execution. Without the
    anchor the partitioner may legally replicate after the augment chain's
    depth-global resamples, which preserves numerics but delivers ZERO
    per-device activation-memory relief (measured:
    benchmarks/space_axis_memory_probe.py, docs/SCALING.md) — so this is
    the configuration the scaling guide actually recommends, with
    augmentation ON to cover the resample -> re-anchor boundary."""
    a, b, s = 1, 4, 16
    x = jnp.asarray(
        rng.normal(size=(a, b, s, s, s, 1)).astype(np.float32) ** 2)
    e = jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32))

    model = TinyCNN(in_channels=1, out_channels=2, feature_channels=4,
                    dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    st1 = create_train_state(model, tx, x[0], seed=0)
    st1, aux1 = survival_train_superstep(st1, x, e, d, jax.random.key(0),
                                         blend=False, augment=True)

    mesh = _space_mesh()
    st2 = create_train_state(model, tx, x[0], seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", "space")))
    sh = NamedSharding(mesh, P(None, "data"))
    with mesh:
        st2, aux2 = survival_train_superstep(
            st2, xs, jax.device_put(e, sh), jax.device_put(d, sh),
            jax.random.key(0), blend=False, augment=True,
            data_axis="data", space_axis="space",
        )

    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]), rel=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=2e-5
        ),
        st1.params,
        st2.params,
    )


def test_anchored_classification_step_matches_single_device(rng):
    """classification_train_step with the round-5 post-augment anchor
    (data_axis/space_axis) on the dp x sp mesh equals unsharded execution
    — the classification analogue of the survival anchor test above."""
    from mmnn_sts_tpu.train.steps import classification_train_step

    b, s = 4, 16
    x = jnp.asarray(
        rng.normal(size=(b, s, s, s, 1)).astype(np.float32) ** 2)
    y = jnp.asarray((rng.random((b, 2)) < 0.5).astype(np.float32))
    pw = jnp.asarray([1.3, 0.9], np.float32)

    model = TinyCNN(in_channels=1, out_channels=2, feature_channels=4,
                    dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)

    st1 = create_train_state(model, tx, x, seed=0)
    st1, aux1 = classification_train_step(st1, x, y, pw, jax.random.key(0),
                                          blend=False, augment=True)

    mesh = _space_mesh()
    st2 = create_train_state(model, tx, x, seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    with mesh:
        st2, aux2 = classification_train_step(
            st2, xs, ys, jax.device_put(pw, NamedSharding(mesh, P())),
            jax.random.key(0), blend=False, augment=True,
            data_axis="data", space_axis="space",
        )

    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]), rel=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=2e-5
        ),
        st1.params,
        st2.params,
    )


def test_shard_batch_constrains_space_axis_without_data_axis():
    """A space-only mesh reaches _shard_batch with data_axis=None — the
    depth constraint must still be applied (it is the whole point of
    spatial partitioning), not silently dropped by the data-axis no-op."""
    from mmnn_sts_tpu.train.steps import _shard_batch

    mesh = make_mesh(shape=[8], axis_names=("space",))
    x = jnp.zeros((2, 4, 8, 8, 8, 1))

    @jax.jit
    def constrained(v):
        return _shard_batch(v, None, 1, space_axis="space")

    with mesh:
        out = constrained(x)
    assert "space" in str(out.sharding.spec)


def test_fused_epoch_space_only_mesh_matches_unsharded(rng):
    """survival_train_epoch on a mesh with ONLY a 'space' axis (the config
    for volumes whose activations exceed one chip's HBM): data_axis is None
    but the depth constraint must still shard the conv grid, and the result
    must equal unsharded execution."""
    from mmnn_sts_tpu.data.loader import EpochBatcher, build_device_dataset
    from mmnn_sts_tpu.train.steps import survival_train_epoch

    n, b, s = 8, 4, 16
    vols = rng.normal(size=(n, s, s, s, 1)).astype(np.float32)
    e = (rng.random((n, 2)) < 0.8).astype(np.float32)
    d = rng.integers(1, 100, size=(n, 2)).astype(np.float32)

    model = TinyCNN(in_channels=1, out_channels=2, feature_channels=4,
                    dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)
    batcher = EpochBatcher(n, micro_batch=b, accum_steps=1, seed=0,
                           two_level=True)
    idx = jnp.asarray(batcher.epoch_indices(0), dtype=jnp.int32)  # (2,1,4)

    st1 = create_train_state(model, tx, jnp.zeros((b, s, s, s, 1)), seed=0)
    st1, out1 = survival_train_epoch(
        st1, jnp.asarray(vols), jnp.asarray(e), jnp.asarray(d), idx,
        jax.random.key(3), blend=False, augment=False,
    )

    mesh = make_mesh(shape=[8], axis_names=("space",))
    ds = build_device_dataset(np.arange(n), mesh, image_volumes=vols,
                              events=e, durations=d)
    st2 = create_train_state(model, tx, jnp.zeros((b, s, s, s, 1)), seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    with mesh:
        st2, out2 = survival_train_epoch(
            st2, ds.model_inputs(), ds.events, ds.durations, idx,
            jax.random.key(3), blend=False, augment=False,
            data_axis=None, space_axis="space",
        )
    np.testing.assert_allclose(np.asarray(out1["loss"]),
                               np.asarray(out2["loss"]), rtol=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
        ),
        st1.params,
        st2.params,
    )


def test_fused_epoch_with_space_axis_matches_unsharded(rng):
    """survival_train_epoch with data+space sharding constraints inside the
    program equals the unsharded epoch (same gathers, same keys)."""
    from mmnn_sts_tpu.data.loader import EpochBatcher, build_device_dataset
    from mmnn_sts_tpu.train.steps import survival_train_epoch

    n, b, s = 8, 4, 16
    vols = rng.normal(size=(n, s, s, s, 1)).astype(np.float32)
    e = (rng.random((n, 2)) < 0.8).astype(np.float32)
    d = rng.integers(1, 100, size=(n, 2)).astype(np.float32)

    model = TinyCNN(in_channels=1, out_channels=2, feature_channels=4,
                    dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)
    batcher = EpochBatcher(n, micro_batch=b, accum_steps=1, seed=0,
                           two_level=True)
    idx = jnp.asarray(batcher.epoch_indices(0), dtype=jnp.int32)  # (2,1,4)

    # unsharded epoch on the default single-axis usage (no constraints)
    st1 = create_train_state(model, tx, jnp.zeros((b, s, s, s, 1)), seed=0)
    st1, out1 = survival_train_epoch(
        st1, jnp.asarray(vols), jnp.asarray(e), jnp.asarray(d), idx,
        jax.random.key(3), blend=False, augment=False,
    )

    mesh = _space_mesh()
    ds = build_device_dataset(np.arange(n), mesh, image_volumes=vols,
                              events=e, durations=d)
    st2 = create_train_state(model, tx, jnp.zeros((b, s, s, s, 1)), seed=0)
    st2 = st2.replace(
        params=replicate(mesh, st2.params),
        batch_stats=replicate(mesh, st2.batch_stats),
        opt_state=replicate(mesh, st2.opt_state),
    )
    with mesh:
        st2, out2 = survival_train_epoch(
            st2, ds.model_inputs(), ds.events, ds.durations, idx,
            jax.random.key(3), blend=False, augment=False,
            data_axis="data", space_axis="space",
        )
    np.testing.assert_allclose(np.asarray(out1["loss"]),
                               np.asarray(out2["loss"]), rtol=1e-4)
    jax.tree.map(
        lambda p1, p2: np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
        ),
        st1.params,
        st2.params,
    )
