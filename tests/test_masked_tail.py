"""Ragged-tail masked semantics: wrap-padded static batches must train
EXACTLY like the reference's smaller last batch.

The reference's DataLoader yields a ragged final batch and steps the
optimizer on it (/root/reference/main.py:445-492, 478-481). This framework
wrap-pads the tail to keep static shapes and passes a validity mask instead
(EpochBatcher.pad_mask -> train/steps.py): masked samples must be excluded
from (a) Cox risk sets and event terms, (b) BCE sums, (c) gradients, and
(d) BatchNorm batch statistics + running-stat updates. These tests pin all
four down, including full garbage-invariance of the padded slots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.data.loader import EpochBatcher
from mmnn_sts_tpu.models.mlp import MLP
from mmnn_sts_tpu.models.tinycnn import TinyCNN
from mmnn_sts_tpu.ops.cox import cox_ph_loss, cox_ph_loss_efron, multi_cox_loss
from mmnn_sts_tpu.ops.losses import bce_with_logits
from mmnn_sts_tpu.train.schedule import make_optimizer
from mmnn_sts_tpu.train.state import create_train_state
from mmnn_sts_tpu.train.steps import (
    classification_train_step,
    survival_train_epoch,
    survival_train_superstep,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fn", [cox_ph_loss, cox_ph_loss_efron])
def test_masked_cox_equals_subset(fn, rng):
    n, n_valid = 16, 11
    lh = rng.normal(size=n).astype(np.float32)
    # garbage in the padded slots, including values larger than any valid one
    lh[n_valid:] = np.array([50.0, -40.0, 3.0, 7.0, 9.0], dtype=np.float32)
    ev = (rng.random(n) < 0.7).astype(np.float32)
    dur = rng.integers(1, 8, size=n).astype(np.float32)  # force ties
    mask = (np.arange(n) < n_valid).astype(np.float32)

    subset = fn(jnp.asarray(lh[:n_valid]), jnp.asarray(ev[:n_valid]),
                jnp.asarray(dur[:n_valid]))
    masked = fn(jnp.asarray(lh), jnp.asarray(ev), jnp.asarray(dur),
                mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(subset),
                               rtol=1e-6)

    # gradients: valid positions match the subset gradient; padded are 0
    g_subset = jax.grad(
        lambda p: fn(p, jnp.asarray(ev[:n_valid]), jnp.asarray(dur[:n_valid]))
    )(jnp.asarray(lh[:n_valid]))
    g_masked = jax.grad(
        lambda p: fn(p, jnp.asarray(ev), jnp.asarray(dur),
                     mask=jnp.asarray(mask))
    )(jnp.asarray(lh))
    assert np.all(np.isfinite(np.asarray(g_masked)))
    np.testing.assert_allclose(np.asarray(g_masked[:n_valid]),
                               np.asarray(g_subset), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(g_masked[n_valid:]), 0.0)


def test_masked_cox_all_masked_is_zero_and_finite_grad(rng):
    n = 6
    lh = jnp.asarray(rng.normal(size=n).astype(np.float32) * 30)
    ev = jnp.ones((n,), jnp.float32)
    dur = jnp.asarray(rng.integers(1, 5, size=n).astype(np.float32))
    mask = jnp.zeros((n,), jnp.float32)
    loss, g = jax.value_and_grad(
        lambda p: cox_ph_loss(p, ev, dur, mask=mask)
    )(lh)
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_masked_multi_cox_and_bce(rng):
    n, n_valid, c = 12, 9, 2
    lh = rng.normal(size=(n, c)).astype(np.float32)
    ev = (rng.random((n, c)) < 0.7).astype(np.float32)
    dur = rng.integers(1, 50, size=(n, c)).astype(np.float32)
    mask = (np.arange(n) < n_valid).astype(np.float32)
    np.testing.assert_allclose(
        float(multi_cox_loss(jnp.asarray(lh), jnp.asarray(ev),
                             jnp.asarray(dur), mask=jnp.asarray(mask))),
        float(multi_cox_loss(jnp.asarray(lh[:n_valid]),
                             jnp.asarray(ev[:n_valid]),
                             jnp.asarray(dur[:n_valid]))),
        rtol=1e-6,
    )
    pw = jnp.asarray([1.5, 0.5])
    np.testing.assert_allclose(
        float(bce_with_logits(jnp.asarray(lh), jnp.asarray(ev), pw,
                              mask=jnp.asarray(mask))),
        float(bce_with_logits(jnp.asarray(lh[:n_valid]),
                              jnp.asarray(ev[:n_valid]), pw)),
        rtol=1e-6,
    )


# ---------------------------------------------------------------------------
# masked BatchNorm statistics
# ---------------------------------------------------------------------------


def test_masked_bn_matches_ragged_forward_mlp(rng):
    """Padded-with-garbage + mask == the true ragged batch: same outputs for
    valid samples, same BatchNorm batch stats AND running-stat updates
    (including torch's unbiased n/(n-1) correction at n_valid)."""
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    x_valid = rng.normal(size=(5, 5)).astype(np.float32)
    garbage = 100.0 * rng.normal(size=(3, 5)).astype(np.float32)
    x_pad = np.concatenate([x_valid, garbage])
    mask = (np.arange(8) < 5).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.zeros((4, 5)))

    out_ragged, mut_ragged = model.apply(
        variables, jnp.asarray(x_valid), train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    out_masked, mut_masked = model.apply(
        variables, jnp.asarray(x_pad), train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
        sample_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(out_masked[:5]),
                               np.asarray(out_ragged), rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        mut_masked["batch_stats"], mut_ragged["batch_stats"],
    )


def test_masked_bn_matches_ragged_forward_conv(rng):
    """Same property through a conv net (per-sample spatial reductions)."""
    model = TinyCNN(spatial_dims=3, in_channels=1, out_channels=2,
                    feature_channels=4, dropout_prob=0.0)
    x_valid = rng.normal(size=(3, 12, 12, 12, 1)).astype(np.float32)
    garbage = 100.0 * rng.normal(size=(2, 12, 12, 12, 1)).astype(np.float32)
    x_pad = np.concatenate([x_valid, garbage])
    mask = (np.arange(5) < 3).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 12, 1)))
    out_ragged, mut_ragged = model.apply(
        variables, jnp.asarray(x_valid), train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    out_masked, mut_masked = model.apply(
        variables, jnp.asarray(x_pad), train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
        sample_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(out_masked[:3]),
                               np.asarray(out_ragged), rtol=1e-4, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        mut_masked["batch_stats"], mut_ragged["batch_stats"],
    )


def test_fully_masked_microbatch_deep_net_finite_grads(rng):
    """Regression: a FULLY masked microbatch through a deep BN net must
    yield finite (zero) gradients. With n_valid=0 the masked batch stats
    degenerate to var=0; normalizing by sqrt(0+eps) amplifies ~316x per
    BatchNorm, so a DenseNet's ~50 BNs overflow activations to inf and the
    masked-out zero cotangents become inf*0=NaN weight gradients — exactly
    what a ragged epoch with N < super-batch produces (e.g. the n=18 CLI
    drive: microbatches 3..7 of the only superstep are all-pad). Guarded by
    identity normalization (mean 0, var 1) when the batch is fully masked."""
    from mmnn_sts_tpu.models.densenet import tiny_densenet
    from mmnn_sts_tpu.models.multimodal import MultiModalModel

    model = MultiModalModel(
        image_model=tiny_densenet(spatial_dims=3, in_channels=2,
                                  out_channels=2, feature_channels=4),
        num_clinical_inputs=5, num_classes=2, num_features=4,
    )
    s = 16
    ex = {"image": jnp.zeros((2, s, s, s, 2)), "clinical": jnp.zeros((2, 5))}
    variables = model.init(jax.random.key(0), ex)
    inputs = {
        "image": jnp.asarray(
            100.0 * rng.normal(size=(2, s, s, s, 2)).astype(np.float32)
        ),
        "clinical": jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32)),
    }
    ev = jnp.ones((2, 2), jnp.float32)
    dur = jnp.asarray([[3.0, 5.0], [4.0, 2.0]])
    mask = jnp.zeros((2,), jnp.float32)

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inputs, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"], sample_mask=mask,
        )
        return multi_cox_loss(out, ev, dur, mask=mask), mut["batch_stats"]

    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert float(loss) == 0.0
    for leaf in jax.tree.leaves(grads):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    # running stats untouched by the fully-masked batch
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        new_bs, variables["batch_stats"],
    )


def test_single_valid_sample_microbatch_finite(rng):
    """Regression: a microbatch with EXACTLY ONE valid sample must stay
    finite under jit. Two failure modes were observed on the n=17 CLI drive
    (2026-08-18), both in the clinical MLP's 1-D BatchNorms where the
    single valid sample makes the batch variance exactly zero:
      (1) E[x^2]-mean^2 cancels catastrophically in f32 — for |x|~1e3 the
          rounding error (~ulp(x^2)) dwarfs eps=1e-5 and can land NEGATIVE
          under XLA's fused reassociation, so rsqrt(var+eps) is NaN;
      (2) even at var==0 exactly, masked rows are amplified rsqrt(eps)~316x
          per BN stage, compounding past f32 range after a few stages and
          turning zero cotangents into inf*0=NaN gradients.
    Guarded by the var>=0 clamp and masked-row zeroing in
    models/common.py (_TorchSemanticsBatchNorm)."""
    from mmnn_sts_tpu.models.multimodal import MultiModalModel
    from mmnn_sts_tpu.models.tinycnn import TinyCNN

    model = MultiModalModel(
        image_model=TinyCNN(spatial_dims=3, in_channels=2, out_channels=2,
                            feature_channels=4, dropout_prob=0.2),
        num_clinical_inputs=5, num_classes=2, num_features=4, blend=True,
    )
    tx = make_optimizer(5e-4, 1, 1)
    s = 12
    ex = {"image": jnp.zeros((1, s, s, s, 2)), "clinical": jnp.zeros((1, 5))}
    state = create_train_state(model, tx, ex, seed=0, num_blend_heads=3)
    a, b = 3, 4
    inputs = {
        # large-magnitude values make ulp(x^2) >> eps, triggering (1)
        "image": jnp.asarray(
            1e3 * rng.normal(size=(a, b, s, s, s, 2)).astype(np.float32)
        ),
        "clinical": jnp.asarray(
            1e3 * rng.normal(size=(a, b, 5)).astype(np.float32)
        ),
    }
    e = jnp.asarray((rng.random((a, b, 2)) < 0.7).astype(np.float32))
    d = jnp.asarray(rng.integers(1, 50, size=(a, b, 2)).astype(np.float32))
    mask = np.zeros((a, b), np.float32)
    mask[0] = 1.0
    mask[1, 0] = 1.0  # microbatch with exactly ONE valid sample

    st, aux = survival_train_superstep(
        state, inputs, e, d, jax.random.key(0),
        blend=True, augment=True, mask=jnp.asarray(mask),
    )
    assert np.isfinite(float(aux["loss"]))
    assert bool(jnp.all(jnp.isfinite(aux["preds"])))
    for leaf in jax.tree.leaves((st.params, st.batch_stats)):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_fully_masked_batch_keeps_running_stats(rng):
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    variables = model.init(jax.random.key(0), jnp.zeros((4, 5)))
    x = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    _, mut = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"], sample_mask=jnp.zeros((4,), jnp.float32),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        mut["batch_stats"], variables["batch_stats"],
    )


# ---------------------------------------------------------------------------
# supersteps
# ---------------------------------------------------------------------------


def _tiny_state(seed=0):
    model = MLP(in_channels=5, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    tx = make_optimizer(1e-2, 2, 2)
    return create_train_state(model, tx, jnp.zeros((4, 5)), seed=seed)


def test_superstep_garbage_invariance(rng):
    """The masked superstep's result is bit-identical under arbitrary
    (finite) padded-slot content — padded samples touch nothing."""
    a, b, f = 2, 4, 5
    x = rng.normal(size=(a, b, f)).astype(np.float32)
    e = (rng.random((a, b, 2)) < 0.8).astype(np.float32)
    d = rng.integers(1, 100, size=(a, b, 2)).astype(np.float32)
    mask = np.ones((a, b), np.float32)
    mask[1, 2:] = 0.0  # last microbatch is half pad

    def run(garbage_scale):
        xg = x.copy()
        xg[1, 2:] = garbage_scale * rng.normal(size=(2, f))
        st, aux = survival_train_superstep(
            _tiny_state(), jnp.asarray(xg), jnp.asarray(e), jnp.asarray(d),
            jax.random.key(0), blend=False, augment=False,
            mask=jnp.asarray(mask),
        )
        return jax.device_get((st.params, st.batch_stats, aux["loss"]))

    p1, bs1, l1 = run(1.0)
    p2, bs2, l2 = run(1000.0)
    assert l1 == l2
    jax.tree.map(
        lambda u, v: np.testing.assert_array_equal(u, v), (p1, bs1), (p2, bs2)
    )


def test_masked_superstep_equals_true_ragged_batch(rng):
    """One masked padded superstep == the same superstep on the true ragged
    shapes (params, BN running stats and loss all agree)."""
    f = 5
    x5 = rng.normal(size=(1, 5, f)).astype(np.float32)
    e5 = (rng.random((1, 5, 2)) < 0.8).astype(np.float32)
    d5 = rng.integers(1, 100, size=(1, 5, 2)).astype(np.float32)

    # wrap-pad to 8 the way EpochBatcher does (repeat from the front)
    pad = [0, 1, 2]
    x8 = np.concatenate([x5, x5[:, pad]], axis=1)
    e8 = np.concatenate([e5, e5[:, pad]], axis=1)
    d8 = np.concatenate([d5, d5[:, pad]], axis=1)
    mask = (np.arange(8) < 5).astype(np.float32)[None]

    st_ragged, aux_ragged = survival_train_superstep(
        _tiny_state(), jnp.asarray(x5), jnp.asarray(e5), jnp.asarray(d5),
        jax.random.key(0), blend=False, augment=False,
    )
    st_masked, aux_masked = survival_train_superstep(
        _tiny_state(), jnp.asarray(x8), jnp.asarray(e8), jnp.asarray(d8),
        jax.random.key(0), blend=False, augment=False, mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(aux_masked["loss"]),
                               float(aux_ragged["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        (st_masked.params, st_masked.batch_stats),
        (st_ragged.params, st_ragged.batch_stats),
    )


def test_classification_masked_step_equals_true_ragged_batch(rng):
    f = 5
    x5 = rng.normal(size=(5, f)).astype(np.float32)
    y5 = (rng.random((5, 2)) < 0.5).astype(np.float32)
    x8 = np.concatenate([x5, x5[[0, 1, 2]]])
    y8 = np.concatenate([y5, y5[[0, 1, 2]]])
    mask = (np.arange(8) < 5).astype(np.float32)
    pw = jnp.asarray([1.0, 2.0])

    st_r, aux_r = classification_train_step(
        _tiny_state(), jnp.asarray(x5), jnp.asarray(y5), pw,
        jax.random.key(0), blend=False, augment=False,
    )
    st_m, aux_m = classification_train_step(
        _tiny_state(), jnp.asarray(x8), jnp.asarray(y8), pw,
        jax.random.key(0), blend=False, augment=False, mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(aux_m["loss"]), float(aux_r["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        (st_m.params, st_m.batch_stats), (st_r.params, st_r.batch_stats),
    )


def test_fused_epoch_ragged_tail_matches_superstep_loop(rng):
    """survival_train_epoch with tail_idx/tail_mask == explicit superstep
    loop with the mask on the last step."""
    n, a, b, f = 11, 2, 4, 5  # 11 samples -> 1 full superstep + ragged tail
    inputs = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    events = jnp.asarray((rng.random((n, 2)) < 0.8).astype(np.float32))
    durations = jnp.asarray(
        rng.integers(1, 100, size=(n, 2)).astype(np.float32)
    )
    batcher = EpochBatcher(n, b, a, seed=3, two_level=True)
    assert batcher.ragged and batcher.steps_per_epoch() == 2
    idx_all = batcher.epoch_indices(0)
    pad_mask = batcher.pad_mask()
    assert pad_mask[0].min() == 1.0 and pad_mask[-1].sum() == n - a * b

    key = jax.random.key(9)
    st_fused, out = survival_train_epoch(
        _tiny_state(), inputs, events, durations,
        jnp.asarray(idx_all[:-1], jnp.int32), key,
        blend=False, augment=False,
        tail_idx=jnp.asarray(idx_all[-1], jnp.int32),
        tail_mask=jnp.asarray(pad_mask[-1]),
    )

    st = _tiny_state()
    keys = jax.random.split(key, 2)
    losses = []
    for s in range(2):
        gathered = idx_all[s].reshape(-1)
        xb = inputs[gathered].reshape(a, b, f)
        eb = events[gathered].reshape(a, b, 2)
        db = durations[gathered].reshape(a, b, 2)
        st, aux = survival_train_superstep(
            st, xb, eb, db, keys[s], blend=False, augment=False,
            mask=jnp.asarray(pad_mask[s]) if s == 1 else None,
        )
        losses.append(float(aux["loss"]))

    np.testing.assert_allclose(np.asarray(out["loss"]), np.asarray(losses),
                               rtol=1e-6)
    jax.tree.map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1e-5, atol=1e-7
        ),
        (st_fused.params, st_fused.batch_stats),
        (st.params, st.batch_stats),
    )


def test_pad_mask_shapes():
    bt = EpochBatcher(13, 4, 2, two_level=True)
    assert bt.ragged
    m = bt.pad_mask()
    assert m.shape == (2, 2, 4)
    assert m.sum() == 13
    assert m[0].min() == 1.0
    flat = bt.epoch_indices(0).reshape(-1)
    # valid positions cover each sample exactly once
    assert sorted(flat[m.reshape(-1) > 0]) == list(range(13))

    bt2 = EpochBatcher(16, 4, 2, two_level=True)
    assert not bt2.ragged
    assert bt2.pad_mask().min() == 1.0
