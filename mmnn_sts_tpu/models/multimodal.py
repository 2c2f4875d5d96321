"""Multimodal fusion model (3D image encoder + clinical MLP).

Parity: /root/reference/models/multimodal.py:9-90 —
  * both sub-networks contribute their penultimate `features` outputs
    (BackpropagatableFeatureExtractor semantics,
    /root/reference/utils/utils.py:244-251 — here simply `return_features=True`,
    no hooks needed in a functional framework);
  * fusion = concat(image_features, clinical_features) -> Linear(2F, C);
  * blend mode adds per-modality linear heads and stacks
    (multimodal_out, image_out, clinical_out) into a (3, N, C) tensor
    (multimodal.py:69-77); head 0 is the multimodal head.
  * Grad-CAM plumbing: `capture_gradcam`/`gradcam_probe` thread through to the
    image backbone's last conv (the layer the reference hooks,
    /root/reference/utils/utils.py:262-274).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .mlp import MLP


class MultiModalModel(nn.Module):
    image_model: nn.Module
    num_clinical_inputs: int
    num_classes: int = 2
    num_features: int = 12
    blend: bool = False
    dtype: jnp.dtype | None = None
    # The reference builds its internal clinical MLP without a dropout
    # argument, i.e. always the MLP default 0.2 regardless of config
    # (/root/reference/parser/parser.py:162-168, models/mlp.py:9); the
    # default preserves that. Overridable (e.g. 0.0) for deterministic
    # harnesses — benchmarks/parity_twin.py.
    clinical_dropout_prob: float = 0.2

    @nn.compact
    def __call__(
        self,
        inputs: dict,
        train: bool = False,
        capture_gradcam: bool = False,
        gradcam_probe=None,
        sample_mask=None,
    ):
        image_data = inputs["image"]
        clinical_data = inputs["clinical"]

        captured = None
        if capture_gradcam or gradcam_probe is not None:
            image_features, captured = self.image_model(
                image_data,
                train=train,
                return_features=True,
                capture_gradcam=True,
                gradcam_probe=gradcam_probe,
                sample_mask=sample_mask,
            )
        else:
            image_features = self.image_model(
                image_data, train=train, return_features=True,
                sample_mask=sample_mask,
            )
        clinical_features = MLP(
            in_channels=self.num_clinical_inputs,
            out_channels=self.num_classes,
            feature_channels=self.num_features,
            dropout_prob=self.clinical_dropout_prob,
            dtype=self.dtype,
            name="clinical_model",
        )(clinical_data, train=train, return_features=True,
          sample_mask=sample_mask)

        features = jnp.concatenate([image_features, clinical_features], axis=1)
        out = nn.Dense(self.num_classes, dtype=self.dtype, name="output_head")(features)

        if self.blend:
            image_preds = nn.Dense(
                self.num_classes, dtype=self.dtype, name="image_output_head"
            )(image_features)
            clinical_preds = nn.Dense(
                self.num_classes, dtype=self.dtype, name="clinical_output_head"
            )(clinical_features)
            out = jnp.stack([out, image_preds, clinical_preds], axis=0)

        if capture_gradcam:
            return out, captured
        return out
