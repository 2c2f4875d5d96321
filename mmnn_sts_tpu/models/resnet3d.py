"""18-layer 3D (video-style) ResNet, narrow-plane variant.

Parity: /root/reference/models/resnet.py —
  * stem: Conv3d(1->64, k=(1,7,7), s=(1,2,2), p=(1,3,3)) -> BN -> ReLU
    (resnet.py:5-13).
  * BasicBlock x [2,2,2,2] with narrow planes 8/16/8/16 (resnet.py:134-137)
    and dropout between stages (resnet.py:160-169).
  * head: global-avg-pool -> Linear(16) -> sigmoid (resnet.py:166-167).
  * init: kaiming fan_out convs, normal(0, .01) linear (resnet.py:185-196).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm, conv, global_avg_pool, kaiming_normal_out


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        residual = x
        y = conv(self.planes, 3, 3, stride=self.stride, padding=1,
                 dtype=self.dtype, kernel_init=kaiming_normal_out, name="conv1")(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y, sample_mask)
        y = nn.relu(y)
        y = conv(self.planes, 3, 3, padding=1, dtype=self.dtype,
                 kernel_init=kaiming_normal_out, name="conv2")(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y, sample_mask)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = conv(self.planes, 1, 3, stride=self.stride,
                            dtype=self.dtype, kernel_init=kaiming_normal_out,
                            name="downsample_conv")(x)
            residual = BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name="downsample_bn")(residual, sample_mask)
        return nn.relu(y + residual)


class ResNet3D18(nn.Module):
    num_classes: int = 2
    dropout_prob: float = 0.2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        x = conv(64, (1, 7, 7), 3, stride=(1, 2, 2),
                 padding=[(1, 1), (3, 3), (3, 3)], dtype=self.dtype,
                 kernel_init=kaiming_normal_out, name="stem_conv")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="stem_bn")(x, sample_mask)
        x = nn.relu(x)

        drop = nn.Dropout(self.dropout_prob, deterministic=not train)
        for stage, (planes, stride, blocks) in enumerate(
            [(8, 1, 2), (16, 2, 2), (8, 2, 2), (16, 2, 2)]
        ):
            for b in range(blocks):
                x = BasicBlock3D(planes, stride if b == 0 else 1, dtype=self.dtype,
                                 name=f"layer{stage + 1}_block{b + 1}")(x, train, sample_mask)
            x = drop(x)

        x = global_avg_pool(x, 3)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="fc",
        )(x)
        return nn.sigmoid(x)
