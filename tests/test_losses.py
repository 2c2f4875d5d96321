"""Classification-loss parity tests vs torch (cpu) golden values."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.ops.losses import (
    bce_with_logits,
    focal_binary_cross_entropy,
    multilabel_bce,
    pos_weight_from_frequencies,
)

torch = pytest.importorskip("torch")


def test_bce_matches_torch(rng):
    x = rng.normal(size=(8, 2)).astype(np.float32)
    y = (rng.random((8, 2)) < 0.5).astype(np.float32)
    pw = np.array([2.0, 0.5], dtype=np.float32)
    for reduction in ["sum", "mean", "none"]:
        want = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor(pw), reduction=reduction
        )(torch.tensor(x), torch.tensor(y)).numpy()
        got = np.asarray(
            bce_with_logits(jnp.array(x), jnp.array(y), jnp.array(pw), reduction)
        )
        # fp32 softplus implementations differ slightly between XLA and torch
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_bce_no_posweight_matches_torch(rng):
    x = rng.normal(size=(6, 2)).astype(np.float32)
    y = (rng.random((6, 2)) < 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss(reduction="sum")(
        torch.tensor(x), torch.tensor(y)
    ).numpy()
    got = float(bce_with_logits(jnp.array(x), jnp.array(y), None, "sum"))
    assert got == pytest.approx(float(want), rel=1e-4)


def test_pos_weight_formula():
    pw = np.asarray(pos_weight_from_frequencies([0.25, 0.5]))
    np.testing.assert_allclose(pw, [3.0, 1.0], rtol=1e-6)


def test_focal_matches_reference_formula(rng):
    p = rng.random((4, 2)).astype(np.float32)
    t = (rng.random((4, 2)) < 0.5).astype(np.float32)
    # reference formula (/root/reference/losses/losses.py:11-19) in numpy
    pp = np.where(t >= 0.5, p, 1 - p).reshape(-1)
    logp = -np.log(np.clip(pp, 1e-4, 1 - 1e-4))
    want = 2 * np.mean(logp * (1 - pp) ** 2)
    got = float(focal_binary_cross_entropy(jnp.array(p), jnp.array(t)))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_multilabel_bce(rng):
    q = rng.random((5, 2)).astype(np.float32) * 0.9 + 0.05
    p = (rng.random((5, 2)) < 0.5).astype(np.float32)
    want = -np.mean(p * np.log(q) + (1 - p) * np.log(1 - q))
    got = float(multilabel_bce(jnp.array(q), jnp.array(p)))
    assert got == pytest.approx(float(want), rel=1e-5)
