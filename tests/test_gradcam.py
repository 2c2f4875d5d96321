"""Grad-CAM attention-map tests (tiny model, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.models.multimodal import MultiModalModel
from mmnn_sts_tpu.models.tinycnn import TinyCNN
from mmnn_sts_tpu.ops.gradcam import attention_maps


@pytest.fixture(scope="module")
def mm_setup():
    rng = np.random.default_rng(0)
    image_model = TinyCNN(in_channels=2, out_channels=2, feature_channels=6,
                          dropout_prob=0.0)
    model = MultiModalModel(image_model=image_model, num_clinical_inputs=5,
                            num_classes=2, num_features=6, blend=False)
    inputs = {
        "image": jnp.asarray(rng.normal(size=(1, 20, 20, 20, 2)).astype(np.float32)),
        "clinical": jnp.asarray(rng.normal(size=(1, 5)).astype(np.float32)),
    }
    variables = model.init(jax.random.key(0), inputs, train=False)
    return model, variables, inputs


def test_maps_shape_and_normalization(mm_setup):
    model, variables, inputs = mm_setup
    maps = np.asarray(
        attention_maps(model.apply, variables, inputs, num_classes=2)
    )
    assert maps.shape == (2, 20, 20, 20)
    # normalization happens before the trilinear resize (reference order,
    # utils.py:317-339), so the resized map stays within [0,1] but its
    # extremes need not hit them exactly
    for cls in range(2):
        assert maps[cls].min() >= -1e-5
        assert maps[cls].max() <= 1.0 + 1e-5
        assert maps[cls].max() > 0.5


def test_maps_differ_per_class(mm_setup):
    model, variables, inputs = mm_setup
    maps = np.asarray(
        attention_maps(model.apply, variables, inputs, num_classes=2)
    )
    assert not np.allclose(maps[0], maps[1])


def test_batch_size_guard(mm_setup):
    model, variables, inputs = mm_setup
    bad = {k: jnp.concatenate([v, v]) for k, v in inputs.items()}
    with pytest.raises(AssertionError, match="batch size 1"):
        attention_maps(model.apply, variables, bad, num_classes=2)


def test_probe_gradient_path(mm_setup):
    """The probe really carries d(logit)/d(activation): scaling the last-conv
    activation must change the class logit."""
    model, variables, inputs = mm_setup
    out0, act = model.apply(variables, inputs, train=False,
                            capture_gradcam=True)

    def f(probe):
        out, _ = model.apply(variables, inputs, train=False,
                             capture_gradcam=True, gradcam_probe=probe)
        return out[0, 0]

    g = jax.grad(f)(jnp.zeros_like(act))
    assert float(jnp.abs(g).sum()) > 0.0
