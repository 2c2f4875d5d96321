"""TPU.remat — activation rematerialization of the DenseNet backbone.

jax.checkpoint (flax nn.remat) per dense layer / transition trades ~1/3
more forward FLOPs in the backward for dropping layer-internal activations
from HBM (config.py TPU.remat; models/densenet.DenseNet.remat). These tests
pin that the transform changes ONLY the schedule: identical outputs,
identical weight gradients, identical BatchNorm running-stat updates, with
dropout active and under vmap/scan via the real train superstep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.models.densenet import tiny_densenet


def _models():
    kw = dict(in_channels=2, out_channels=2, feature_channels=12,
              dropout_prob=0.2)
    return tiny_densenet(**kw), tiny_densenet(remat=True, **kw)


@pytest.fixture(scope="module")
def setup(rng_module):
    base, remat = _models()
    x = jnp.asarray(
        rng_module.normal(size=(2, 16, 16, 16, 2)).astype(np.float32)
    )
    variables = base.init(jax.random.key(0), x, train=False)
    return base, remat, x, variables


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_remat_param_tree_identical(setup):
    """nn.remat must not rename or reshape anything — checkpoints are
    interchangeable between the two settings."""
    base, remat, x, variables = setup
    v2 = remat.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
        assert a.shape == b.shape


def test_remat_eval_forward_identical(setup):
    base, remat, x, variables = setup
    out1 = base.apply(variables, x, train=False)
    out2 = remat.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_remat_train_grads_and_stats_match(setup):
    """Same params, same dropout rng: loss, weight grads, and the mutated
    batch_stats must match to float tolerance."""
    base, remat, x, variables = setup

    def loss_fn(model, params):
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(3)},
        )
        return jnp.sum(out ** 2), mut["batch_stats"]

    (l1, bs1), g1 = jax.value_and_grad(
        lambda p: loss_fn(base, p), has_aux=True)(variables["params"])
    (l2, bs2), g2 = jax.value_and_grad(
        lambda p: loss_fn(remat, p), has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_remat_through_train_superstep(rng_module):
    """The real blended survival superstep (scan + value_and_grad + BN
    mutation + augment rng) runs under remat and matches the non-remat
    step exactly in loss/preds."""
    from mmnn_sts_tpu.config import Config
    from mmnn_sts_tpu.models import build_model
    from mmnn_sts_tpu.train.schedule import make_optimizer
    from mmnn_sts_tpu.train.state import create_train_state
    from mmnn_sts_tpu.train.steps import survival_train_superstep

    rng = rng_module
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(2, 2, 16, 16, 16, 2)).astype(np.float32) ** 2
        ),
        "clinical": jnp.asarray(
            rng.normal(size=(2, 2, 11)).astype(np.float32)
        ),
    }
    events = jnp.asarray((rng.random((2, 2, 2)) < 0.7).astype(np.float32))
    durations = jnp.asarray(
        rng.integers(1, 500, size=(2, 2, 2)).astype(np.float32)
    )

    results = []
    for remat in (False, True):
        cfg = Config()
        cfg.image_model.name = "tinydensenet"
        cfg.image_model.dropout_prob = 0.2
        cfg.tpu.remat = remat
        model = build_model(cfg, images=True, preop=True, postop=False,
                            blend=True)
        tx = make_optimizer(5e-4, 2, 10)
        state = create_train_state(
            model, tx, jax.tree.map(lambda x: x[0], batch), seed=42
        )
        state, aux = survival_train_superstep(
            state, batch, events, durations, jax.random.key(1), blend=True
        )
        results.append((float(aux["loss"]), np.asarray(aux["preds"])))

    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)
