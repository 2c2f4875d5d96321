"""Squeeze-and-Excitation ResNet-50, N-D.

Parity: the reference exposes monai.networks.nets.SEResNet50 through its model
factory (/root/reference/parser/parser.py:599-604): SE bottleneck blocks
[3,4,6,3], reduction 16, expansion 4, 7x7 stem, final global pool -> Linear.
Built here from scratch in channels-last flax (SE pooling + two 1x1 convs are
pure MXU matmuls).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm, conv, global_avg_pool, max_pool


class SEBlock(nn.Module):
    reduction: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=axes)  # (N, C)
        s = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        s = s.reshape((s.shape[0],) + (1,) * len(axes) + (c,))
        return x * s


class SEBottleneck(nn.Module):
    planes: int
    spatial_dims: int
    stride: int = 1
    reduction: int = 16
    expansion: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        sd = self.spatial_dims
        out_c = self.planes * self.expansion
        residual = x
        y = conv(self.planes, 1, sd, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y, sample_mask)
        y = nn.relu(y)
        y = conv(self.planes, 3, sd, stride=self.stride, padding=1,
                 dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y, sample_mask)
        y = nn.relu(y)
        y = conv(out_c, 1, sd, dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3")(y, sample_mask)
        y = SEBlock(self.reduction, dtype=self.dtype, name="se")(y)
        if self.stride != 1 or x.shape[-1] != out_c:
            residual = conv(out_c, 1, sd, stride=self.stride, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name="downsample_bn")(residual, sample_mask)
        return nn.relu(y + residual)


class SEResNet50(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 2
    num_classes: int = 2
    dropout_prob: float | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        sd = self.spatial_dims
        x = conv(64, 7, sd, stride=2, padding=3, dtype=self.dtype, name="conv0")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn0")(x, sample_mask)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1, sd)

        for stage, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                x = SEBottleneck(
                    planes, sd, stride if b == 0 else 1, dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b + 1}",
                )(x, train, sample_mask)

        x = global_avg_pool(x, sd)
        if self.dropout_prob:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
