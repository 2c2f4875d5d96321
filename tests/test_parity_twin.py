"""Train-dynamics parity: this framework vs the faithful torch twin
(benchmarks/parity_twin.py; VERDICT r2 item 2).

Both sides start from identical weights, consume the identical batch
stream, and run the identical semantics (SGD-nesterov + OneCycle,
per-microbatch BN + Cox, gradient-blend weighting, selection on the
unweighted multimodal-head val loss). Any semantic drift in the optimizer,
schedule, BN, Cox loss, or blending shows up as trajectory divergence here.

Tolerances: epoch-1 losses must agree tightly (same init + same data —
only float-arithmetic differences); late-epoch losses and the final
held-out C-index must agree loosely (chaotic amplification of float
noise is expected; semantic drift is NOT).
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

# The dense-family twin trains a 22-layer 3D DenseNet in BOTH frameworks —
# minutes of wall time on this 1-core VM (ADVICE r3). It is pinned by the
# committed PARITY_TWIN_DENSE.json artifact; re-verify with
# MMNN_SLOW_TESTS=1 python -m pytest tests/test_parity_twin.py -q
dense_slow = pytest.mark.skipif(
    not os.environ.get("MMNN_SLOW_TESTS"),
    reason="slow dense-family twin; set MMNN_SLOW_TESTS=1 to run",
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from parity_twin import (  # noqa: E402
    TwinConfig,
    compare,
    compare_class,
    make_synthetic_class_cohort,
    make_synthetic_cohort,
    run_jax,
    run_jax_class,
    run_torch,
    run_torch_class,
)


@pytest.fixture(scope="module")
def twin_result(tmp_path_factory):
    cfg = TwinConfig(n_train=16, n_val=8, size=12, epochs=4, micro_batch=8,
                     accum=2, blend_update_interval=2, seed=7)
    data = make_synthetic_cohort(cfg.n_train + cfg.n_val, cfg.size,
                                 cfg.n_clinical, seed=cfg.seed)
    tmp = str(tmp_path_factory.mktemp("twin"))
    jax_hist, variables = run_jax(cfg, data, tmp)
    torch_hist = run_torch(cfg, data, variables)
    return compare(cfg, jax_hist, torch_hist)


def test_first_epoch_loss_matches_tight(twin_result):
    # same weights, same batches, same math -> first-epoch loss agrees to
    # float-noise levels
    assert twin_result["first_epoch_train_rel_delta"] < 1e-3, twin_result


def test_trajectories_stay_close(twin_result):
    # whole-trajectory agreement: semantic drift (wrong wd placement, BN
    # momentum, schedule shape, blend weighting) produces >> 5% divergence
    # within a few epochs; float noise does not at these scales
    assert twin_result["max_train_rel_delta"] < 0.05, twin_result
    assert twin_result["max_val_rel_delta"] < 0.05, twin_result


def test_selection_and_outcome_agree(twin_result):
    # the selection series (unweighted multimodal-head val Cox loss) must
    # agree pointwise; exact best-epoch agreement additionally holds unless
    # the series is flat enough that the minima are a cross-framework
    # near-tie (float chaos picks different flat-minimum epochs)
    assert twin_result["max_selection_rel_delta"] < 0.02, twin_result
    assert (twin_result["best_epoch_match"]
            or twin_result["best_selection_rel_delta"] < 0.01), twin_result
    assert twin_result["final_val_c_delta"] < 0.1, twin_result


def test_blend_weights_agree(twin_result):
    jw = np.asarray(twin_result["jax"].get("blend_weights", []))
    tw = np.asarray(twin_result["torch"]["blend_weights"])
    if jw.size:  # jax history exposes weights only when recorded
        assert np.allclose(jw[-1], tw[-1], atol=0.05)


@pytest.fixture(scope="module")
def ragged_twin_result(tmp_path_factory):
    """n_train NOT divisible by the super-batch: the torch twin runs the
    TRUE ragged batches (reference loader semantics) while the jax side
    wrap-pads and masks (train/steps.py). Agreement here proves the
    masked-tail semantics reproduce the reference's ragged last batch."""
    cfg = TwinConfig(n_train=14, n_val=8, size=12, epochs=3, micro_batch=4,
                     accum=2, blend_update_interval=2, seed=7)
    data = make_synthetic_cohort(cfg.n_train + cfg.n_val, cfg.size,
                                 cfg.n_clinical, seed=cfg.seed)
    tmp = str(tmp_path_factory.mktemp("ragged_twin"))
    jax_hist, variables = run_jax(cfg, data, tmp)
    torch_hist = run_torch(cfg, data, variables)
    return compare(cfg, jax_hist, torch_hist)


def test_ragged_first_epoch_loss_matches_tight(ragged_twin_result):
    # same weights, same REAL samples (pad masked out on the jax side,
    # trimmed on the torch side) -> float noise only
    assert ragged_twin_result["first_epoch_train_rel_delta"] < 1e-3, \
        ragged_twin_result


def test_ragged_trajectories_stay_close(ragged_twin_result):
    assert ragged_twin_result["max_train_rel_delta"] < 0.05, ragged_twin_result
    assert ragged_twin_result["max_val_rel_delta"] < 0.05, ragged_twin_result
    assert ragged_twin_result["max_selection_rel_delta"] < 0.02, \
        ragged_twin_result


@pytest.fixture(scope="module")
def dense_twin_result(tmp_path_factory):
    """Dense-block-family twin (TinyDenseNet): the same stem / dense-layer /
    transition / features-head module types as the flagship DenseNet121, so
    trajectory agreement here extends train-dynamics parity from TinyCNN to
    the architecture the headline model uses. size=16 is the smallest extent
    the two transitions support."""
    cfg = TwinConfig(n_train=16, n_val=8, size=16, epochs=3, micro_batch=4,
                     accum=2, blend_update_interval=2, seed=7,
                     image_model="tinydensenet")
    data = make_synthetic_cohort(cfg.n_train + cfg.n_val, cfg.size,
                                 cfg.n_clinical, seed=cfg.seed)
    tmp = str(tmp_path_factory.mktemp("dense_twin"))
    jax_hist, variables = run_jax(cfg, data, tmp)
    torch_hist = run_torch(cfg, data, variables)
    return compare(cfg, jax_hist, torch_hist)


@dense_slow
def test_dense_first_epoch_loss_matches_tight(dense_twin_result):
    # same init (weights copied flax->torch incl. every BN/conv in the dense
    # blocks), same batches -> epoch-1 agreement at float-noise level; a
    # mis-mapped parameter or BN/maxpool/avgpool semantic drift in the dense
    # stack breaks this immediately
    assert dense_twin_result["first_epoch_train_rel_delta"] < 1e-3, \
        dense_twin_result


@dense_slow
def test_dense_trajectories_stay_close(dense_twin_result):
    # a deeper net amplifies float noise faster than TinyCNN, but semantic
    # drift (stem s2d gradient, transition pooling, concat ordering, BN
    # running-stat updates through 22 dense layers) diverges >>5% in epochs
    assert dense_twin_result["max_train_rel_delta"] < 0.05, dense_twin_result
    assert dense_twin_result["max_val_rel_delta"] < 0.05, dense_twin_result
    assert dense_twin_result["max_selection_rel_delta"] < 0.02, \
        dense_twin_result


@pytest.fixture(scope="module")
def class_twin_result(tmp_path_factory):
    cfg = TwinConfig(n_train=16, n_val=8, size=12, epochs=4, micro_batch=8,
                     accum=1, blend_update_interval=2, seed=7)
    data = make_synthetic_class_cohort(cfg.n_train + cfg.n_val, cfg.size,
                                       cfg.n_clinical, seed=cfg.seed)
    tmp = str(tmp_path_factory.mktemp("class_twin"))
    jax_hist, variables = run_jax_class(cfg, data, tmp)
    torch_hist = run_torch_class(cfg, data, variables)
    return compare_class(cfg, jax_hist, torch_hist)


def test_class_first_epoch_loss_matches_tight(class_twin_result):
    # same init, same batches, same BCE/pos_weight math -> float noise only
    assert class_twin_result["first_epoch_train_rel_delta"] < 1e-3, \
        class_twin_result


def test_class_trajectories_stay_close(class_twin_result):
    # semantic drift in the no-accumulation optimizer stepping, pos_weight,
    # or the classification blend sign produces >>5% divergence quickly
    assert class_twin_result["max_train_rel_delta"] < 0.05, class_twin_result
    assert class_twin_result["max_val_rel_delta"] < 0.05, class_twin_result


def test_class_selection_agrees(class_twin_result):
    # F1 is computed from thresholded predictions (integer counts): both
    # frameworks must make the same calls except for logits within float
    # noise of the 0.5 boundary
    assert class_twin_result["max_val_f1_delta"] < 0.15, class_twin_result
    assert class_twin_result["best_metric_delta"] < 0.15, class_twin_result
