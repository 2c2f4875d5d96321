"""Model factory keyed on config names.

Parity: /root/reference/parser/parser.py:99-180 `Parser.getModel` — prefix
matching on ImageModel.name, multimodal wrapping when images are combined with
preop/postop clinical features, and the same multimodal-compatibility
restriction (densenet121 / tinydensenet / tinycnn only).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..exceptions import ConfigurationError
from .densenet import DenseNet, densenet121, densenet201, tiny_densenet
from .multimodal import MultiModalModel
from .resnet3d import ResNet3D18
from .seresnet import SEResNet50
from .tinycnn import TinyCNN

_MULTIMODAL_COMPATIBLE = ("tinycnn", "tinydensenet", "densenet121")


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else None


def build_image_model(cfg: Config) -> nn.Module:
    im = cfg.image_model
    name = im.name.lower()
    dtype = _dtype(cfg)
    use_pallas = bool(getattr(cfg.tpu, "use_pallas_fused_dense", False))
    remat = bool(getattr(cfg.tpu, "remat", False))
    if name.startswith("densenet121"):
        return densenet121(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            out_channels=im.num_classes,
            feature_channels=im.feature_layers,
            dropout_prob=im.dropout_prob,
            dtype=dtype,
            use_pallas=use_pallas,
            remat=remat,
        )
    if name.startswith("tinydensenet"):
        return tiny_densenet(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            out_channels=im.num_classes,
            feature_channels=im.feature_layers,
            dropout_prob=im.dropout_prob,
            dtype=dtype,
            use_pallas=use_pallas,
            remat=remat,
        )
    if name.startswith("tinycnn"):
        return TinyCNN(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            out_channels=im.num_classes,
            feature_channels=im.feature_layers,
            dropout_prob=im.dropout_prob,
            dtype=dtype,
        )
    if name.startswith("monaidensenet"):
        # vanilla densenet121 head (no custom feature bottleneck)
        return DenseNet(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            out_channels=im.num_classes,
            feature_channels=None,
            dropout_prob=im.dropout_prob,
            dtype=dtype,
            remat=remat,
        )
    if name.startswith("densenet201"):
        return densenet201(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            out_channels=im.num_classes,
            dtype=dtype,
            remat=remat,
        )
    if name.startswith("densenet169") or name.startswith("densenet264"):
        # exported by the reference's vendored module (__all__,
        # /root/reference/models/densenet.py:28-43) though not wired into
        # its factory; standard block configs, vanilla head
        block = (6, 12, 32, 32) if "169" in name else (6, 12, 64, 48)
        return DenseNet(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            out_channels=im.num_classes,
            feature_channels=None,
            block_config=block,
            dtype=dtype,
            remat=remat,
        )
    if name.startswith("seresnet50"):
        return SEResNet50(
            spatial_dims=im.spatial_dims,
            in_channels=im.in_channels,
            num_classes=im.num_classes,
            dtype=dtype,
        )
    if name.startswith("r3d_18") or name.startswith("r3d18"):
        return ResNet3D18(num_classes=im.num_classes, dtype=dtype)
    raise ConfigurationError(
        f"Model name not recognized: {name}\n\tSee config file for valid options"
    )


def build_model(
    cfg: Config,
    images: bool,
    preop: bool,
    postop: bool,
    blend: bool,
    num_tabular_inputs: int | None = None,
):
    """Build the task model: clinical-only MLP, image-only encoder, or
    multimodal fusion when images are combined with clinical predictors.

    The reference's factory (/root/reference/parser/parser.py:99-180) always
    instantiates the image model and would feed tabular data into it on a
    clinical-only run (a latent break); the evident intent — tabular-only
    tasks use the MLP encoder — is implemented here.
    """
    if not images:
        from .mlp import MLP

        if num_tabular_inputs is None:
            pre = len(cfg.clinical_model.pre_op_predictors)
            post = len(cfg.clinical_model.post_op_predictors)
            if preop and postop:
                num_tabular_inputs = pre + post
            elif postop:
                num_tabular_inputs = post
            else:
                num_tabular_inputs = pre
        return MLP(
            in_channels=num_tabular_inputs,
            out_channels=cfg.image_model.num_classes,
            feature_channels=cfg.image_model.feature_layers,
            dropout_prob=cfg.image_model.dropout_prob,
            dtype=_dtype(cfg),
        )

    model = build_image_model(cfg)
    name = cfg.image_model.name.lower()

    if images and (preop or postop):
        if not name.startswith(_MULTIMODAL_COMPATIBLE):
            raise ConfigurationError(
                "Image models used to build multimodal models must be one of "
                "'tinycnn', 'tinydensenet' or 'densenet121'"
            )
        if num_tabular_inputs is None:
            predictors = list(cfg.clinical_model.pre_op_predictors)
            if postop:
                predictors += list(cfg.clinical_model.post_op_predictors)
            num_tabular_inputs = len(predictors)
        return MultiModalModel(
            image_model=model,
            num_clinical_inputs=num_tabular_inputs,
            num_classes=cfg.image_model.num_classes,
            num_features=cfg.image_model.feature_layers,
            blend=blend,
            dtype=_dtype(cfg),
        )
    return model
