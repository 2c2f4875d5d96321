"""TinyCNN: 5-layer 3D conv stack.

Parity: /root/reference/models/densenet.py:358-414 — five valid-padding 3^3
convs (64->32->32->16->16) each followed by BatchNorm and channel dropout
(NO activation — the reference has none), then global-avg-pool -> flatten ->
features Linear -> dropout -> out Linear. The reference's forward references
an undefined `self.dropout_head` (densenet.py:412 vs 390, latent AttributeError);
the evident intent (`drop_head`) is implemented.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm, ChannelDropout, conv, global_avg_pool


class TinyCNN(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 3
    feature_channels: int = 12
    dropout_prob: float = 0.5
    dtype: jnp.dtype | None = None

    def backbone(self, x, train: bool = False, gradcam_probe=None,
                 sample_mask=None):
        captured = None
        widths = [64, 32, 32, 16, 16]
        for i, w in enumerate(widths):
            x = conv(w, 3, self.spatial_dims, padding="VALID", use_bias=True,
                     dtype=self.dtype, name=f"conv{i + 1}")(x)
            if i == len(widths) - 1:
                if gradcam_probe is not None:
                    x = x + gradcam_probe
                captured = x
            x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name=f"bn{i + 1}")(x, sample_mask)
            x = ChannelDropout(self.dropout_prob, self.spatial_dims,
                               deterministic=not train)(x)
        return x, captured

    def features(self, x, train: bool = False):
        x = global_avg_pool(x, self.spatial_dims)
        x = nn.Dense(self.feature_channels, dtype=self.dtype, name="features")(x)
        return nn.Dropout(self.dropout_prob, deterministic=not train)(x)

    def class_layers(self, x):
        return nn.Dense(self.out_channels, dtype=self.dtype, name="out")(x)

    @property
    def gradcam_act_channels(self) -> int:
        return 16

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_features: bool = False,
        capture_gradcam: bool = False,
        gradcam_probe=None,
        sample_mask=None,
    ):
        x, captured = self.backbone(x, train, gradcam_probe, sample_mask)
        feats = self.features(x, train)
        out = feats if return_features else self.class_layers(feats)
        if capture_gradcam:
            return out, captured
        return out
