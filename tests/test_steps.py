"""Train-step semantics + checkpoint/resume tests (small shapes, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmnn_sts_tpu.models.mlp import MLP
from mmnn_sts_tpu.train import checkpoint as ckpt
from mmnn_sts_tpu.train.schedule import make_optimizer, onecycle, steps_per_epoch
from mmnn_sts_tpu.train.state import create_train_state
from mmnn_sts_tpu.train.steps import (
    classification_train_step,
    survival_eval_step,
    survival_train_superstep,
)


@pytest.fixture
def tiny_state():
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)
    x = jnp.zeros((4, 5))
    return create_train_state(model, tx, x, seed=0)


def _surv_batch(rng, a=2, b=4, f=5):
    return (
        jnp.asarray(rng.normal(size=(a, b, f)).astype(np.float32)),
        jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32)),
        jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32)),
    )


def test_superstep_one_optimizer_update(tiny_state, rng):
    x, e, d = _surv_batch(rng)
    st, aux = survival_train_superstep(tiny_state, x, e, d, jax.random.key(0),
                                       blend=False, augment=False)
    assert int(st.step) == 1  # 2 microbatches, ONE optimizer step
    assert np.isfinite(float(aux["loss"]))
    assert aux["preds"].shape == (2, 4, 2)


def test_superstep_grads_accumulate_sum(rng):
    """Accumulated grads over A microbatches == sum of per-microbatch grads
    (reference semantics: loss.backward() per batch, optimizer.step once)."""
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    sgd = optax.sgd(1.0)  # lr 1, no momentum: delta params == -sum(grads)
    x, e, d = _surv_batch(rng)
    st = create_train_state(model, sgd, x[0], seed=0)

    from mmnn_sts_tpu.ops.cox import multi_cox_loss

    def loss_fn(params, batch_stats, xi, ei, di):
        out, mut = st.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            xi, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return multi_cox_loss(out, ei, di), mut["batch_stats"]

    # manual accumulation with sequential BN updates
    bs = st.batch_stats
    total_grads = jax.tree.map(jnp.zeros_like, st.params)
    for i in range(2):
        (_, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, bs, x[i], e[i], d[i]
        )
        total_grads = jax.tree.map(jnp.add, total_grads, grads)
    expected = jax.tree.map(lambda p, g: p - g, st.params, total_grads)

    st2, _ = survival_train_superstep(
        create_train_state(model, sgd, x[0], seed=0), x, e, d,
        jax.random.key(0), blend=False, augment=False,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5),
        st2.params,
        expected,
    )


def test_classification_step_and_eval(tiny_state, rng):
    x = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    y = jnp.asarray((rng.random((4, 2)) < 0.5).astype(np.float32))
    pw = jnp.ones((2,))
    st, aux = classification_train_step(tiny_state, x, y, pw,
                                        jax.random.key(0), blend=False,
                                        augment=False)
    assert int(st.step) == 1
    out = survival_eval_step(st, x, y, jnp.ones((4, 2)), blend=False)
    assert np.isfinite(float(out["loss"]))


def test_onecycle_matches_torch_shape():
    """OneCycle: starts at peak/25, peaks at pct_start, ends ~peak/25e4."""
    sched = onecycle(1.0, 10, 10)  # 100 steps
    vals = np.array([float(sched(i)) for i in range(100)])
    assert vals[0] == pytest.approx(1.0 / 25.0, rel=1e-3)
    assert vals.max() == pytest.approx(1.0, rel=1e-2)
    assert np.argmax(vals) == pytest.approx(30, abs=2)
    assert vals[-1] < 1e-3


def test_steps_per_epoch_ceil():
    assert steps_per_epoch(64, 64) == 1
    assert steps_per_epoch(65, 64) == 2
    assert steps_per_epoch(8, 8) == 1


def test_npz_roundtrip(tiny_state, tmp_path):
    p = str(tmp_path / "m.npz")
    ckpt.save_params_npz(p, tiny_state.params, tiny_state.batch_stats)
    params, bs = ckpt.load_params_npz(p, tiny_state.params,
                                      tiny_state.batch_stats)
    jax.tree.map(np.testing.assert_array_equal, params, tiny_state.params)
    jax.tree.map(np.testing.assert_array_equal, bs, tiny_state.batch_stats)


def test_async_npz_saver_matches_sync(tiny_state, tmp_path):
    """Snapshot + background write == synchronous save_params_npz; a newer
    submit for the same path supersedes the older (coalescing)."""
    saver = ckpt.AsyncNpzSaver()
    p = str(tmp_path / "m.npz")
    stale = jax.tree.map(lambda x: x * 0.0, tiny_state.params)
    snap0 = ckpt.snapshot_params({"p": stale, "b": tiny_state.batch_stats})
    snap1 = ckpt.snapshot_params(
        {"p": tiny_state.params, "b": tiny_state.batch_stats}
    )
    saver.submit(p, snap0["p"], snap0["b"])
    saver.submit(p, snap1["p"], snap1["b"])  # supersedes snap0
    saver.close()
    params, bs = ckpt.load_params_npz(p, tiny_state.params,
                                      tiny_state.batch_stats)
    jax.tree.map(np.testing.assert_array_equal, params, tiny_state.params)
    jax.tree.map(np.testing.assert_array_equal, bs, tiny_state.batch_stats)


def test_async_npz_saver_surfaces_write_errors(tiny_state, tmp_path):
    saver = ckpt.AsyncNpzSaver()
    bad = str(tmp_path / "no_such_dir" / "m.npz")
    saver.submit(bad, tiny_state.params, tiny_state.batch_stats)
    with pytest.raises(OSError):
        saver.wait()
    saver.close()


def test_async_npz_saver_wait_timeout_returns(tiny_state, tmp_path):
    """wait(timeout=...) gives up instead of blocking forever while a write
    is stuck — the atexit drain relies on this so a hung relay fetch can't
    turn a crashed run into a process that never exits."""
    import threading
    import time

    saver = ckpt.AsyncNpzSaver()
    release = threading.Event()

    class SlowLeaf:
        """Pytree leaf whose np.asarray blocks until released (stands in
        for a device_get stalled on the tunneled relay)."""

        shape = (1,)
        dtype = np.float32

        def __array__(self, dtype=None, copy=None):
            release.wait(30.0)
            return np.zeros(1, np.float32)

    p = str(tmp_path / "slow.npz")
    saver.submit(p, {"w": SlowLeaf()})
    t0 = time.monotonic()
    saver.wait(timeout=0.5)  # must RETURN, not hang
    assert time.monotonic() - t0 < 10.0
    release.set()
    saver.close()


def test_snapshot_survives_donation(tiny_state, rng):
    """snapshot_params buffers must stay valid after the donating superstep
    reuses the live state's buffers (the background save reads them later)."""
    x, e, d = _surv_batch(rng)
    snap = ckpt.snapshot_params(
        {"p": tiny_state.params, "b": tiny_state.batch_stats}
    )
    before = jax.tree.map(np.asarray, tiny_state.params)
    st = tiny_state
    for i in range(2):  # donate_argnums=(0,) — consumes the input buffers
        st, _ = survival_train_superstep(st, x, e, d, jax.random.key(i),
                                         blend=False, augment=False)
    jax.tree.map(np.testing.assert_array_equal, snap["p"], before)


def test_orbax_roundtrip(tiny_state, tmp_path, rng):
    x, e, d = _surv_batch(rng)
    st, _ = survival_train_superstep(tiny_state, x, e, d, jax.random.key(0),
                                     blend=False, augment=False)
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, st, {"selection_metric": 0.5})
    mgr.wait()

    template = create_train_state(
        MLP(in_channels=5, out_channels=2, feature_channels=4,
            dropout_prob=0.0),
        make_optimizer(1e-2, 2, 2),
        jnp.zeros((4, 5)),
        seed=99,  # different seed: restore must overwrite
    )
    restored = mgr.restore(template)
    assert restored is not None
    assert int(restored.step) == int(st.step)
    jax.tree.map(np.testing.assert_array_equal, restored.params, st.params)
    np.testing.assert_array_equal(
        np.asarray(restored.blend.weights), np.asarray(st.blend.weights)
    )
    mgr.close()


def test_bhb10k_import_maps_backbone(tmp_path):
    """Synthetic torch checkpoint in BHB layout -> flax DenseNet backbone."""
    torch = pytest.importorskip("torch")
    from mmnn_sts_tpu.models.densenet import tiny_densenet

    model = tiny_densenet(in_channels=1, out_channels=2, feature_channels=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)),
                           train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    conv0 = np.asarray(params["conv0"]["kernel"])  # (7,7,7,1,64)
    torch_conv0 = torch.tensor(
        np.transpose(conv0, (4, 3, 0, 1, 2)) * 0 + 3.0  # recognizable value
    )
    b1l1_conv2 = np.asarray(params["block1_layer1"]["conv2"]["kernel"])
    torch_b1l1 = torch.tensor(
        np.transpose(b1l1_conv2, (4, 3, 0, 1, 2)) * 0 + 5.0
    )
    sd = {
        "module.features.conv0.weight": torch_conv0,
        "module.features.denseblock1.denselayer1.conv2.weight": torch_b1l1,
        "module.features.norm0.weight": torch.ones(64) * 7,
        "module.features.norm0.bias": torch.zeros(64),
        "module.features.norm0.running_mean": torch.zeros(64),
        "module.features.norm0.running_var": torch.ones(64),
    }
    pth = str(tmp_path / "bhb.pth")
    torch.save({"model": sd}, pth)

    new_p, new_b, n = ckpt.import_bhb10k_backbone(pth, params, bstats)
    assert n >= 3
    assert float(np.asarray(new_p["conv0"]["kernel"]).mean()) == 3.0
    assert float(
        np.asarray(new_p["block1_layer1"]["conv2"]["kernel"]).mean()
    ) == 5.0
    assert float(
        np.asarray(new_p["norm0"]["BatchNorm_0"]["scale"]).mean()
    ) == 7.0
    # untouched head stays random-init
    np.testing.assert_array_equal(
        new_p["feature_layer"]["kernel"], params["feature_layer"]["kernel"]
    )


def test_ordered_ema_merge_matches_sequential(rng):
    """Closed-form fold of parallel BN running-stat updates == applying the
    G per-microbatch EMA updates one after another."""
    from mmnn_sts_tpu.train.steps import _ordered_ema_merge

    m = 0.9
    old = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    stats = [jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
             for _ in range(4)]
    seq = old
    for s in stats:
        seq = m * seq + (1 - m) * s
    muts = jnp.stack([m * old + (1 - m) * s for s in stats])
    merged = _ordered_ema_merge(old, muts, m)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(seq),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("group", [2, 4])
def test_grouped_superstep_matches_sequential(rng, group):
    """group>1 (vmapped microbatches) reproduces the sequential scan: same
    parameters, BN running stats (ordered EMA), loss, and per-microbatch
    predictions. dropout_prob>0 proves the per-microbatch RNG streams are
    unchanged by the grouping."""
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.2)
    x, e, d = _surv_batch(rng, a=4, b=4)

    def run(g):
        st = create_train_state(model, make_optimizer(1e-2, 2, 2), x[0],
                                seed=0)
        return survival_train_superstep(st, x, e, d, jax.random.key(3),
                                        blend=False, augment=False, group=g)

    st1, aux1 = run(1)
    st2, aux2 = run(group)
    assert int(st2.step) == 1  # still ONE optimizer update
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux1["preds"]),
                               np.asarray(aux2["preds"]),
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        st1.params, st2.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        st1.batch_stats, st2.batch_stats,
    )


def test_grouped_superstep_matches_with_augment(rng):
    """Image path under grouping: the per-sample augmentation keys (split
    from each microbatch's key) are bit-identical, so augmented training
    matches the sequential layout too."""
    from mmnn_sts_tpu.models.tinycnn import TinyCNN

    a, b, s = 2, 2, 16
    x = jnp.asarray(rng.normal(size=(a, b, s, s, s, 1)).astype(np.float32)) ** 2
    e = jnp.asarray((rng.random((a, b, 2)) < 0.8).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 100, size=(a, b, 2)).astype(np.float32))
    model = TinyCNN(in_channels=1, out_channels=2, feature_channels=4,
                    dropout_prob=0.2)

    def run(g):
        st = create_train_state(model, make_optimizer(1e-2, 2, 2), x[0],
                                seed=0)
        return survival_train_superstep(st, x, e, d, jax.random.key(5),
                                        blend=False, augment=True, group=g)

    st1, aux1 = run(1)
    st2, aux2 = run(2)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(p, q, rtol=1e-4, atol=1e-6),
        st1.params, st2.params,
    )
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(p, q, rtol=1e-5, atol=1e-6),
        st1.batch_stats, st2.batch_stats,
    )


def test_grouped_superstep_non_divisible_falls_back(rng):
    """group that doesn't divide the accumulation count must not change
    microbatch boundaries — it falls back to sequential execution."""
    x, e, d = _surv_batch(rng, a=3, b=4)
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.0)

    def run(g):
        st = create_train_state(model, make_optimizer(1e-2, 2, 2), x[0],
                                seed=0)
        return survival_train_superstep(st, x, e, d, jax.random.key(1),
                                        blend=False, augment=False, group=g)

    st1, aux1 = run(1)
    st2, aux2 = run(2)  # 2 does not divide 3
    assert float(aux1["loss"]) == float(aux2["loss"])
    jax.tree.map(np.testing.assert_array_equal, st1.params, st2.params)


def test_training_is_deterministic_under_seed(rng):
    """Same seed + same data -> bit-identical parameters after 3 supersteps
    (full reproducibility; the reference could not replay runs)."""
    x, e, d = _surv_batch(rng, a=2, b=4)

    def run():
        m = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.2)
        st = create_train_state(m, make_optimizer(1e-2, 2, 3), x[0], seed=7)
        key = jax.random.key(7)
        for _ in range(3):
            key, k = jax.random.split(key)
            st, _ = survival_train_superstep(st, x, e, d, k, blend=False,
                                             augment=False)
        return st.params

    p1, p2 = run(), run()
    jax.tree.map(np.testing.assert_array_equal, p1, p2)
