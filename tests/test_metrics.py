"""C-index and F1 tests, including lifelines-semantics golden cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.ops.metrics import (
    c_indices_per_class,
    concordance_index,
    concordance_index_jax,
    f1_scores,
)


def test_perfect_concordance():
    durations = [1, 2, 3, 4, 5]
    preds = [1, 2, 3, 4, 5]
    events = [1, 1, 1, 1, 1]
    assert concordance_index(durations, preds, events) == 1.0


def test_perfect_anticoncordance():
    durations = [1, 2, 3, 4, 5]
    preds = [5, 4, 3, 2, 1]
    events = [1, 1, 1, 1, 1]
    assert concordance_index(durations, preds, events) == 0.0


def test_all_tied_predictions_is_half():
    durations = [1, 2, 3, 4]
    preds = [2, 2, 2, 2]
    events = [1, 1, 1, 1]
    assert concordance_index(durations, preds, events) == 0.5


def test_censoring_removes_pairs():
    # Only subject 0's death is usable; censored pairs among {1,2} don't count.
    durations = [1, 2, 3]
    events = [1, 0, 0]
    preds = [0.5, 1.0, 2.0]
    # Pairs: (0,1) and (0,2), both concordant.
    assert concordance_index(durations, preds, events) == 1.0


def test_death_vs_censored_same_time_is_admissible():
    # lifelines semantics: death at t vs censored at the same t counts.
    durations = [5, 5]
    events = [1, 0]
    preds = [1.0, 2.0]
    assert concordance_index(durations, preds, events) == 1.0


def test_death_death_same_time_not_admissible():
    durations = [5, 5]
    events = [1, 1]
    preds = [1.0, 2.0]
    with pytest.raises(ZeroDivisionError):
        concordance_index(durations, preds, events)


def test_no_admissible_pairs_raises():
    with pytest.raises(ZeroDivisionError):
        concordance_index([1, 2], [0.1, 0.2], [0, 0])


def test_mixed_golden_case():
    # Hand-computed: durations/events/preds chosen to exercise every rule.
    durations = np.array([1, 3, 3, 2, 4])
    events = np.array([1, 1, 0, 0, 1])
    preds = np.array([0.1, 0.4, 0.3, 0.1, 0.5])
    # Admissible ordered pairs (i death earlier):
    # i=0 (t=1,d): vs 1,2,3,4 -> preds 0.4,0.3,0.1,0.5 vs 0.1:
    #   concordant 0.4>0.1 yes; 0.3>0.1 yes; 0.1==0.1 tie; 0.5 yes => 3 conc, 1 tie
    # i=1 (t=3,d): vs t>3: subject 4 (t=4) -> 0.5>0.4 conc; vs censored t==3: subject 2 -> 0.3<0.4 disc
    # i=4 (t=4,d): no one later.
    # totals: admissible=6, concordant=4, tied=1 -> (4+0.5)/6
    assert concordance_index(durations, preds, events) == pytest.approx(4.5 / 6)


def test_jax_matches_numpy(rng):
    n = 40
    durations = rng.integers(1, 20, size=n).astype(float)
    events = (rng.random(n) < 0.6).astype(float)
    preds = np.round(rng.normal(size=n), 2)  # rounding creates pred ties
    want = concordance_index(durations, preds, events)
    got, n_adm = concordance_index_jax(
        jnp.array(durations), jnp.array(preds), jnp.array(events)
    )
    assert float(got) == pytest.approx(want, rel=1e-6)
    assert int(n_adm) > 0


def test_jax_mask_excludes_samples(rng):
    n = 30
    durations = rng.integers(1, 50, size=n).astype(float)
    events = (rng.random(n) < 0.7).astype(float)
    preds = rng.normal(size=n)
    keep = rng.random(n) < 0.5
    want = concordance_index(durations[keep], preds[keep], events[keep])
    got, _ = concordance_index_jax(
        jnp.array(durations),
        jnp.array(preds),
        jnp.array(events),
        mask=jnp.array(keep.astype(float)),
    )
    assert float(got) == pytest.approx(want, rel=1e-6)


def test_per_class_shapes(rng):
    n, c = 25, 2
    preds = rng.normal(size=(n, c))
    events = np.ones((n, c))
    durations = np.stack([rng.permutation(n), rng.permutation(n)], axis=1) + 1.0
    out = c_indices_per_class(preds, events, durations)
    assert len(out) == c
    for v in out:
        assert 0.0 <= v <= 1.0


def test_f1_scores():
    # class 0: tp=3 fp=1 fn=2 -> 3/(3+1.5)=2/3 ; class 1: tp=0 fp=0 fn=0 -> nan
    out = f1_scores([3, 0], [1, 0], [2, 0])
    assert out[0] == pytest.approx(2 / 3)
    assert np.isnan(out[1])
