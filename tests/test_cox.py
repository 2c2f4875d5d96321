"""Cox partial-likelihood correctness tests.

Golden values come from the closed-form partial likelihood computed naively
(explicit risk sets) and, where torch is available, from a from-scratch torch
implementation of the pycox formula to cross-check gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.ops.cox import cox_ph_loss, multi_cox_loss


def naive_cox(log_h, events, durations):
    """Explicit risk-set negative partial log-likelihood / num events."""
    log_h = np.asarray(log_h, dtype=np.float64)
    events = np.asarray(events, dtype=np.float64)
    durations = np.asarray(durations, dtype=np.float64)
    n = len(log_h)
    pll = 0.0
    for i in range(n):
        if events[i] == 1:
            risk = [j for j in range(n) if durations[j] >= durations[i]]
            pll += log_h[i] - np.log(np.sum(np.exp(log_h[risk])))
    return -pll / max(events.sum(), 1.0)


def test_matches_naive_no_ties(rng):
    n = 32
    log_h = rng.normal(size=n)
    durations = rng.permutation(np.arange(1, n + 1)).astype(float)
    events = (rng.random(n) < 0.6).astype(float)
    got = float(cox_ph_loss(jnp.array(log_h), jnp.array(events), jnp.array(durations)))
    want = naive_cox(log_h, events, durations)
    assert got == pytest.approx(want, rel=1e-5)


def test_no_events_is_zero():
    loss = cox_ph_loss(jnp.ones(4), jnp.zeros(4), jnp.arange(4.0))
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_grad_is_finite_and_descends(rng):
    n = 16
    durations = jnp.array(rng.permutation(np.arange(1, n + 1)).astype(float))
    events = jnp.array((rng.random(n) < 0.5).astype(float))
    log_h = jnp.array(rng.normal(size=n))
    g = jax.grad(cox_ph_loss)(log_h, events, durations)
    assert np.all(np.isfinite(np.asarray(g)))
    # Gradient step should reduce the loss.
    l0 = float(cox_ph_loss(log_h, events, durations))
    l1 = float(cox_ph_loss(log_h - 0.1 * g, events, durations))
    assert l1 < l0


def test_multi_cox_sums_columns(rng):
    n, c = 20, 2
    log_h = rng.normal(size=(n, c))
    durations = rng.integers(1, 100, size=(n, c)).astype(float)
    events = (rng.random((n, c)) < 0.6).astype(float)
    got = float(
        multi_cox_loss(jnp.array(log_h), jnp.array(events), jnp.array(durations))
    )
    want = sum(
        float(
            cox_ph_loss(
                jnp.array(log_h[:, i]),
                jnp.array(events[:, i]),
                jnp.array(durations[:, i]),
            )
        )
        for i in range(c)
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_jit_compatible(rng):
    n = 8
    f = jax.jit(cox_ph_loss)
    log_h = jnp.array(rng.normal(size=n))
    durations = jnp.arange(1.0, n + 1)
    events = jnp.ones(n)
    assert np.isfinite(float(f(log_h, events, durations)))


def test_matches_torch_pycox_formula(rng):
    """Independent torch implementation of the pycox CoxPHLoss formula:
    sort by duration descending, logcumsumexp risk sets, divide by event
    count — values AND input-gradients must agree."""
    torch = pytest.importorskip("torch")

    def torch_cox(log_h, events, durations):
        idx = torch.argsort(durations, descending=True)
        lh = log_h[idx]
        ev = events[idx]
        gamma = lh.max().detach()
        log_cumsum = (lh - gamma).exp().cumsum(0).add(1e-7).log().add(gamma)
        return -((lh - log_cumsum) * ev).sum() / ev.sum()

    n = 24
    log_h = rng.normal(size=n).astype(np.float32)
    durations = rng.permutation(np.arange(1, n + 1)).astype(np.float32)
    events = (rng.random(n) < 0.6).astype(np.float32)

    t_lh = torch.tensor(log_h, requires_grad=True)
    t_loss = torch_cox(t_lh, torch.tensor(events), torch.tensor(durations))
    t_loss.backward()

    got = float(cox_ph_loss(jnp.array(log_h), jnp.array(events),
                            jnp.array(durations)))
    assert got == pytest.approx(float(t_loss.detach()), rel=1e-5)

    g = jax.grad(cox_ph_loss)(jnp.array(log_h), jnp.array(events),
                              jnp.array(durations))
    np.testing.assert_allclose(np.asarray(g), t_lh.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def naive_efron(log_h, events, durations):
    """Textbook Efron partial likelihood, explicit loops."""
    log_h = np.asarray(log_h, dtype=np.float64)
    events = np.asarray(events, dtype=np.float64)
    durations = np.asarray(durations, dtype=np.float64)
    pll = 0.0
    for t in np.unique(durations[events == 1]):
        tied = (durations == t) & (events == 1)
        risk = durations >= t
        d = int(tied.sum())
        s_r = np.exp(log_h[risk]).sum()
        s_d = np.exp(log_h[tied]).sum()
        pll += log_h[tied].sum()
        for l in range(d):
            pll -= np.log(s_r - (l / d) * s_d)
    return -pll / max(events.sum(), 1.0)


def test_efron_matches_naive_with_ties(rng):
    from mmnn_sts_tpu.ops.cox import cox_ph_loss_efron

    n = 40
    log_h = rng.normal(size=n)
    durations = rng.integers(1, 8, size=n).astype(float)  # heavy ties
    events = (rng.random(n) < 0.7).astype(float)
    got = float(
        cox_ph_loss_efron(jnp.array(log_h), jnp.array(events),
                          jnp.array(durations))
    )
    want = naive_efron(log_h, events, durations)
    assert got == pytest.approx(want, rel=1e-4)


def test_efron_equals_breslow_without_ties(rng):
    from mmnn_sts_tpu.ops.cox import cox_ph_loss_efron

    n = 20
    log_h = rng.normal(size=n)
    durations = rng.permutation(np.arange(1, n + 1)).astype(float)
    events = (rng.random(n) < 0.6).astype(float)
    a = float(cox_ph_loss(jnp.array(log_h), jnp.array(events),
                          jnp.array(durations)))
    b = float(cox_ph_loss_efron(jnp.array(log_h), jnp.array(events),
                                jnp.array(durations)))
    assert a == pytest.approx(b, rel=1e-4)


def test_efron_grad_finite(rng):
    from mmnn_sts_tpu.ops.cox import cox_ph_loss_efron

    n = 16
    log_h = jnp.array(rng.normal(size=n))
    durations = jnp.array(rng.integers(1, 5, size=n).astype(float))
    events = jnp.array((rng.random(n) < 0.7).astype(float))
    g = jax.grad(cox_ph_loss_efron)(log_h, events, durations)
    assert np.isfinite(np.asarray(g)).all()
