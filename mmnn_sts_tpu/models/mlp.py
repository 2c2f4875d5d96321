"""Clinical-feature MLP encoder.

Parity: /root/reference/models/mlp.py:7-63 — backbone of five
Linear->BatchNorm1d->Dropout->ReLU stages (in->32->16->8->8->8), a `features`
stage Linear(8, feature_channels)->BN->Dropout->ReLU, and a linear
`output_head` (feature_channels -> out_channels).

Note: the reference uses torch Dropout1d on (N, C) activations; channel
dropout and elementwise dropout coincide for 2-D activations, so plain
dropout is used here.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm


class MLP(nn.Module):
    in_channels: int = 1
    out_channels: int = 3
    feature_channels: int = 12
    dropout_prob: float = 0.2
    dtype: jnp.dtype | None = None

    def _stage(self, x, width, train: bool, name: str, sample_mask=None):
        x = nn.Dense(width, dtype=self.dtype, name=f"dense_{name}")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name=f"bn_{name}")(x, sample_mask)
        x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return nn.relu(x)

    def backbone(self, x, train: bool = False, sample_mask=None):
        for i, width in enumerate([32, 16, 8, 8, 8]):
            x = self._stage(x, width, train, str(i), sample_mask)
        return x

    def features(self, x, train: bool = False, sample_mask=None):
        return self._stage(x, self.feature_channels, train, "features",
                           sample_mask)

    def output_head(self, x):
        return nn.Dense(self.out_channels, dtype=self.dtype, name="out")(x)

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False,
                 sample_mask=None):
        x = self.backbone(x, train, sample_mask)
        feats = self.features(x, train, sample_mask)
        if return_features:
            return feats
        return self.output_head(feats)
