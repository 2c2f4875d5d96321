"""End-to-end learnability: on a synthetic cohort with a KNOWN risk signal
(hazard depends on TumorGrade/TumorVolume/Age), the survival pipeline must
reach above-chance held-out C-index. This is the strongest smoke test the
framework can run without the real cohort — it exercises optimization,
Cox-loss gradients, the scheduler, and evaluation together."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.data.loader import EpochBatcher, build_device_dataset, gather_superbatch
from mmnn_sts_tpu.data.tabular import load_clinical_arrays
from mmnn_sts_tpu.models.mlp import MLP
from mmnn_sts_tpu.ops.metrics import concordance_index
from mmnn_sts_tpu.parallel.mesh import make_mesh
from mmnn_sts_tpu.train.schedule import make_optimizer, steps_per_epoch
from mmnn_sts_tpu.train.state import create_train_state
from mmnn_sts_tpu.train.steps import survival_eval_step, survival_train_superstep

from fixtures import make_clinical_csv


@pytest.fixture(scope="module")
def signal_cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("signal")
    path = str(root / "clinical.csv")
    make_clinical_csv(path, n=160, seed=7, signal=True)
    return load_clinical_arrays(path, preop=True)


def _standardize(x):
    mu = x.mean(axis=0, keepdims=True)
    sd = x.std(axis=0, keepdims=True) + 1e-6
    return (x - mu) / sd


def test_survival_training_learns_risk_ordering(signal_cohort):
    arrays = signal_cohort
    n = len(arrays.uids)
    rng = np.random.default_rng(0)
    order = rng.permutation(n)
    train_i, test_i = order[: int(0.75 * n)], order[int(0.75 * n):]

    x = _standardize(arrays.predictors)
    mesh = make_mesh()
    train_ds = build_device_dataset(
        arrays.uids[train_i], mesh, clinical=x[train_i],
        events=arrays.events[train_i], durations=arrays.durations[train_i],
    )

    model = MLP(in_channels=x.shape[1], out_channels=2, feature_channels=12,
                dropout_prob=0.1)
    epochs, micro, accum = 30, 8, 2
    batcher = EpochBatcher(train_ds.num_samples, micro, accum, seed=1)
    tx = make_optimizer(5e-3, batcher.steps_per_epoch(), epochs)
    state = create_train_state(model, tx, jnp.asarray(x[:4]), seed=0)

    key = jax.random.key(0)
    for epoch in range(epochs):
        for idx in batcher.epoch_indices(epoch):
            key, k = jax.random.split(key)
            batch = gather_superbatch(train_ds, idx, mesh)
            state, _ = survival_train_superstep(
                state, batch["inputs"], batch["events"], batch["durations"],
                k, blend=False, augment=False,
            )

    out = survival_eval_step(
        state,
        jnp.asarray(x[test_i]),
        jnp.asarray(arrays.events[test_i]),
        jnp.asarray(arrays.durations[test_i]),
        blend=False,
    )
    preds = np.asarray(out["preds"])
    # OS column: higher log-hazard should mean shorter survival. The
    # reference's C-index convention treats predictions as survival scores
    # (higher = longer), so a well-trained hazard model scores LOW;
    # concordance on -log_h should be well above 0.5.
    c_os = concordance_index(
        arrays.durations[test_i, 0], -preds[:, 0], arrays.events[test_i, 0]
    )
    assert c_os > 0.6, f"held-out OS C-index {c_os:.3f} — pipeline failed to learn"


def test_untrained_model_is_chance_level(signal_cohort):
    arrays = signal_cohort
    x = _standardize(arrays.predictors)
    model = MLP(in_channels=x.shape[1], out_channels=2, feature_channels=12,
                dropout_prob=0.0)
    tx = make_optimizer(1e-3, 2, 2)
    state = create_train_state(model, tx, jnp.asarray(x[:4]), seed=3)
    out = survival_eval_step(
        state, jnp.asarray(x), jnp.asarray(arrays.events),
        jnp.asarray(arrays.durations), blend=False,
    )
    preds = np.asarray(out["preds"])
    c = concordance_index(arrays.durations[:, 0], -preds[:, 0],
                          arrays.events[:, 0])
    assert 0.3 < c < 0.7  # chance-ish
