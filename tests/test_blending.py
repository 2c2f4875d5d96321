"""Gradient-blending state math tests (vs hand-computed paper formulas)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.ops.blending import (
    BlendState,
    blend_init,
    blend_update,
    blended_class_loss,
    blended_surv_loss,
    class_head_losses,
    surv_head_losses,
)
from mmnn_sts_tpu.ops.cox import multi_cox_loss
from mmnn_sts_tpu.ops.losses import bce_with_logits


def softmax(x):
    x = np.asarray(x, dtype=np.float64)
    e = np.exp(x - x.max())
    return e / e.sum()


def test_init_uniform():
    st = blend_init(3)
    np.testing.assert_allclose(np.asarray(st.weights), np.full(3, 1 / 3), rtol=1e-6)
    assert not bool(st.has_history)


def test_first_update_stays_uniform():
    st = blend_init(3)
    st2 = blend_update(st, jnp.array([1.0, 2.0, 3.0]), jnp.array([2.0, 3.0, 4.0]), True)
    np.testing.assert_allclose(np.asarray(st2.weights), np.full(3, 1 / 3), rtol=1e-6)
    assert bool(st2.has_history)
    np.testing.assert_allclose(np.asarray(st2.lvn), [2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(st2.ltn), [1.0, 2.0, 3.0])


def test_second_update_surv_formula():
    st = blend_init(2)
    lt0 = jnp.array([1.0, 2.0])
    lv0 = jnp.array([1.5, 3.0])
    st = blend_update(st, lt0, lv0, True)
    lt1 = jnp.array([0.8, 1.9])
    lv1 = jnp.array([1.4, 3.2])
    st = blend_update(st, lt1, lv1, True)
    o_n = np.array([0.5, 1.0])
    o_npn = np.array([0.6, 1.3])
    delta_g = np.array([1.5 - 1.4, 3.0 - 3.2])  # lvn - val (survival sign)
    delta_o = o_npn - o_n
    want = softmax(delta_g / delta_o**2)
    np.testing.assert_allclose(np.asarray(st.weights), want, rtol=1e-5)


def test_second_update_class_sign_flips():
    st = blend_init(2)
    lt0 = jnp.array([1.0, 2.0])
    lv0 = jnp.array([1.5, 3.0])
    st = blend_update(st, lt0, lv0, False)
    lt1 = jnp.array([0.8, 1.9])
    lv1 = jnp.array([1.4, 3.2])
    st = blend_update(st, lt1, lv1, False)
    o_n = np.array([0.5, 1.0])
    o_npn = np.array([0.6, 1.3])
    delta_g = np.array([1.4 - 1.5, 3.2 - 3.0])  # val - lvn (classification sign)
    delta_o = o_npn - o_n
    want = softmax(delta_g / delta_o**2)
    np.testing.assert_allclose(np.asarray(st.weights), want, rtol=1e-5)


def test_surv_head_losses_match_percolumn(rng):
    k, n, c = 3, 16, 2
    preds = jnp.array(rng.normal(size=(k, n, c)))
    events = jnp.array((rng.random((n, c)) < 0.7).astype(float))
    durations = jnp.array(rng.integers(1, 50, size=(n, c)).astype(float))
    losses = surv_head_losses(preds, events, durations)
    for i in range(k):
        want = float(multi_cox_loss(preds[i], events, durations))
        assert float(losses[i]) == pytest.approx(want, rel=1e-5)


def test_blended_surv_loss_weighted_sum(rng):
    k, n, c = 3, 10, 2
    preds = jnp.array(rng.normal(size=(k, n, c)))
    events = jnp.array(np.ones((n, c)))
    durations = jnp.array(rng.integers(1, 50, size=(n, c)).astype(float))
    st = blend_init(k).replace(weights=jnp.array([0.5, 0.3, 0.2]))
    total, sel = blended_surv_loss(st, preds, events, durations)
    head = surv_head_losses(preds, events, durations)
    want = float(jnp.sum(jnp.array([0.5, 0.3, 0.2]) * head))
    assert float(total) == pytest.approx(want, rel=1e-5)
    assert float(sel) == pytest.approx(float(head[0]), rel=1e-6)


def test_blended_class_loss(rng):
    k, n, c = 3, 12, 2
    preds = jnp.array(rng.normal(size=(k, n, c)))
    targets = jnp.array((rng.random((n, c)) < 0.5).astype(float))
    st = blend_init(k)
    total, sel = blended_class_loss(st, preds, targets)
    head = class_head_losses(preds, targets)
    want = float(jnp.sum(st.weights * head))
    assert float(total) == pytest.approx(want, rel=1e-5)
    want_sel = float(bce_with_logits(preds[0], targets, reduction="sum"))
    assert float(sel) == pytest.approx(want_sel, rel=1e-5)
