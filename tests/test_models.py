"""Model-zoo tests: shapes via jax.eval_shape (no compilation), param
structure, gradcam capture, multimodal head stacking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.config import Config
from mmnn_sts_tpu.models import build_image_model, build_model
from mmnn_sts_tpu.models.densenet import densenet121, tiny_densenet
from mmnn_sts_tpu.models.mlp import MLP
from mmnn_sts_tpu.models.tinycnn import TinyCNN


def _cfg(name, in_ch=2, classes=2, feats=12):
    cfg = Config()
    cfg.image_model.name = name
    cfg.image_model.in_channels = in_ch
    cfg.image_model.num_classes = classes
    cfg.image_model.feature_layers = feats
    return cfg


def _shape_of(model, x, **kw):
    rng = jax.random.key(0)
    vars_shape = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, **kw)
    )
    out_shape = jax.eval_shape(
        lambda v: model.apply(v, x, **kw),
        vars_shape,
    )
    return out_shape, vars_shape


@pytest.mark.parametrize(
    "name",
    ["densenet121", "tinydensenet", "tinycnn", "monaidensenet", "densenet201",
     "seresnet50"],
)
def test_image_model_output_shapes(name):
    model = build_image_model(_cfg(name))
    x = jnp.zeros((2, 32, 32, 32, 2))
    out, _ = _shape_of(model, x, train=False)
    assert out.shape == (2, 2)


def test_r3d18_shape():
    model = build_image_model(_cfg("r3d_18", in_ch=1))
    x = jnp.zeros((2, 16, 32, 32, 1))
    out, _ = _shape_of(model, x, train=False)
    assert out.shape == (2, 2)


def test_densenet121_param_count():
    """3D DenseNet121 with 2-ch input and 12 feature channels ~ 11.2M params
    (conv kernels are 3D so counts differ from the 2D torchvision model)."""
    model = densenet121(in_channels=2, out_channels=2, feature_channels=12)
    x = jnp.zeros((1, 32, 32, 32, 2))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x, train=False)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 10_000_000 < n < 13_000_000


def test_densenet_features_mode():
    model = tiny_densenet(in_channels=1, out_channels=2, feature_channels=7)
    x = jnp.zeros((3, 32, 32, 32, 1))
    out, _ = _shape_of(model, x, train=False, return_features=True)
    assert out.shape == (3, 7)


def test_gradcam_capture_shapes():
    model = tiny_densenet(in_channels=1, out_channels=2, feature_channels=7)
    x = jnp.zeros((1, 32, 32, 32, 1))
    (out, act), _ = _shape_of(model, x, train=False, capture_gradcam=True)
    assert out.shape == (1, 2)
    # last dense-block conv output: growth_rate channels at the final grid
    assert act.shape[-1] == model.growth_rate
    assert act.shape[0] == 1


def test_tinycnn_gradcam_channels():
    model = TinyCNN(in_channels=2, out_channels=2, feature_channels=12)
    x = jnp.zeros((1, 32, 32, 32, 2))
    (out, act), _ = _shape_of(model, x, train=False, capture_gradcam=True)
    assert act.shape[-1] == 16


def test_multimodal_blend_stacking():
    cfg = _cfg("tinycnn")
    model = build_model(cfg, images=True, preop=True, postop=False, blend=True)
    x = {
        "image": jnp.zeros((4, 24, 24, 24, 2)),
        "clinical": jnp.zeros((4, 11)),
    }
    out, _ = _shape_of(model, x, train=False)
    assert out.shape == (3, 4, 2)  # (multimodal, image, clinical) x N x C


def test_multimodal_noblend():
    cfg = _cfg("tinydensenet")
    model = build_model(cfg, images=True, preop=True, postop=False, blend=False)
    x = {
        "image": jnp.zeros((4, 32, 32, 32, 2)),
        "clinical": jnp.zeros((4, 11)),
    }
    out, _ = _shape_of(model, x, train=False)
    assert out.shape == (4, 2)


def test_multimodal_postop_input_width():
    cfg = _cfg("tinycnn")
    model = build_model(cfg, images=True, preop=True, postop=True, blend=False)
    assert model.num_clinical_inputs == len(
        cfg.clinical_model.pre_op_predictors
    ) + len(cfg.clinical_model.post_op_predictors)


def test_mlp_shapes():
    m = MLP(in_channels=11, out_channels=2, feature_channels=12)
    x = jnp.zeros((5, 11))
    out, variables = _shape_of(m, x, train=False)
    assert out.shape == (5, 2)
    feats, _ = _shape_of(m, x, train=False, return_features=True)
    assert feats.shape == (5, 12)


def test_clinical_only_build():
    cfg = _cfg("densenet121")
    m = build_model(cfg, images=False, preop=True, postop=False, blend=False,
                    num_tabular_inputs=14)
    assert isinstance(m, MLP)
    assert m.in_channels == 14


def test_bfloat16_dtype_flag():
    cfg = _cfg("tinycnn")
    cfg.tpu.compute_dtype = "bfloat16"
    model = build_image_model(cfg)
    assert model.dtype == jnp.bfloat16


@pytest.mark.parametrize("name", ["densenet169", "densenet264"])
def test_extra_densenets(name):
    model = build_image_model(_cfg(name))
    x = jnp.zeros((1, 32, 32, 32, 2))
    out, _ = _shape_of(model, x, train=False)
    assert out.shape == (1, 2)


def test_multimodal_width_from_dataset():
    """images + clinical + radiomics: fusion MLP width follows the actual
    tabular matrix, not the config's predictor list."""
    cfg = _cfg("tinycnn")
    model = build_model(cfg, images=True, preop=True, postop=False,
                        blend=False, num_tabular_inputs=25)
    assert model.num_clinical_inputs == 25
