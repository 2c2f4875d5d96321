"""Serving export (infer/export.py): StableHLO artifact round-trips.

The reference has no deployment artifact (serving = re-running main.py
--inference with the torch stack, /root/reference/main.py:1001-1022); the
export path is a TPU-native capability, so these tests define its contract:
the deserialized artifact must reproduce the in-process eval forward exactly,
for any batch size (symbolic batch dim), with preprocessing baked in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.config import Config
from mmnn_sts_tpu.infer.export import (
    ServingModel,
    export_forward,
    load_exported,
)
from mmnn_sts_tpu.models import build_model
from mmnn_sts_tpu.ops.augment import eval_transform
from mmnn_sts_tpu.train.schedule import make_optimizer
from mmnn_sts_tpu.train.state import create_train_state


def _tiny_multimodal_state():
    cfg = Config()
    cfg.image_model.name = "tinycnn"
    cfg.image_model.spatial_size = [16, 16, 16]
    cfg.image_model.dropout_prob = 0.0
    model = build_model(cfg, images=True, preop=True, postop=False,
                        blend=True)
    sample = {
        "image": jnp.zeros((2, 16, 16, 16, 2), jnp.float32),
        "clinical": jnp.zeros((2, 11), jnp.float32),
    }
    state = create_train_state(model, make_optimizer(1e-3, 2, 2), sample,
                               seed=0)
    return state, sample


def _reference_forward(state, inputs, blend):
    inputs = dict(inputs)
    inputs["image"] = jax.vmap(eval_transform)(inputs["image"])
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        inputs, train=False,
    )
    return np.asarray(out[0] if blend else out)


@pytest.fixture(scope="module")
def exported_blob():
    state, sample = _tiny_multimodal_state()
    blob = export_forward(state, sample, blend=True, preprocess=True,
                          platforms=("cpu",))
    return state, sample, blob


def _batch(rng, n):
    return {
        "image": jnp.asarray(
            rng.normal(size=(n, 16, 16, 16, 2)).astype(np.float32) ** 2
        ),
        "clinical": jnp.asarray(rng.normal(size=(n, 11)).astype(np.float32)),
    }


def test_roundtrip_matches_inprocess_forward(exported_blob, rng):
    state, _, blob = exported_blob
    fn = load_exported(blob)
    batch = _batch(rng, 3)
    got = np.asarray(fn(batch))
    want = _reference_forward(state, batch, blend=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_symbolic_batch_serves_multiple_sizes(exported_blob, rng):
    state, _, blob = exported_blob
    fn = load_exported(blob)
    for n in (1, 5):
        batch = _batch(rng, n)
        got = np.asarray(fn(batch))
        assert got.shape[0] == n
        np.testing.assert_allclose(
            got, _reference_forward(state, batch, blend=True),
            rtol=1e-5, atol=1e-5,
        )


def test_artifact_file_roundtrip(tmp_path, rng):
    state, sample = _tiny_multimodal_state()
    path = str(tmp_path / "model.stablehlo")
    export_forward(state, sample, blend=True, platforms=("cpu",), path=path)
    fn = load_exported(path)
    batch = _batch(rng, 2)
    np.testing.assert_allclose(
        np.asarray(fn(batch)),
        _reference_forward(state, batch, blend=True),
        rtol=1e-5, atol=1e-5,
    )


def test_serving_model_pads_to_bucket(exported_blob, rng):
    """Padding to a canonical batch must not change the first n predictions
    (BN is frozen in eval mode, so rows are independent)."""
    state, _, blob = exported_blob
    serve = ServingModel(blob, batch_sizes=(4, 8))
    batch = _batch(rng, 3)  # -> padded to 4
    got = serve(batch)
    assert got.shape[0] == 3
    np.testing.assert_allclose(
        got, _reference_forward(state, batch, blend=True),
        rtol=1e-5, atol=1e-5,
    )


def test_clinical_only_export_no_preprocess(rng):
    """Clinical-only (MLP) artifact: bare-array input, no image transform."""
    cfg = Config()
    model = build_model(cfg, images=False, preop=True, postop=False,
                        blend=False, num_tabular_inputs=11)
    x = jnp.zeros((2, 11), jnp.float32)
    state = create_train_state(model, make_optimizer(1e-3, 2, 2), x, seed=0)
    blob = export_forward(state, x, blend=False, preprocess=False,
                          platforms=("cpu",))
    fn = load_exported(blob)
    xs = jnp.asarray(rng.normal(size=(3, 11)).astype(np.float32))
    want = np.asarray(
        state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            xs, train=False,
        )
    )
    np.testing.assert_allclose(np.asarray(fn(xs)), want, rtol=1e-5,
                               atol=1e-5)
