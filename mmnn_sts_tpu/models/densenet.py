"""N-D DenseNet family with the custom feature-extraction head.

Parity target: /root/reference/models/densenet.py —
  * `_DenseLayer` (densenet.py:46-89): BN->ReLU->1x1conv(bn_size*growth) ->
    BN->ReLU->3x3conv(growth) -> channel dropout -> concat with input.
  * `_Transition` (densenet.py:123-148): BN->ReLU->1x1conv(in//2)->avgpool2.
  * `DenseNet` (densenet.py:151-271): conv0(7,s2,p3)->BN->ReLU->maxpool(3,s2,p1)
    -> blocks/transitions -> final BN, then the MSK custom `features` head
    (ReLU->global-avg-pool->flatten->Linear(feature_channels)->Dropout,
    densenet.py:234-247) and a linear `class_layers` head (densenet.py:250-256).
  * DenseNet121: block_config (6,12,24,16) (densenet.py:312-331);
    TinyDenseNet: (6,12,4) (densenet.py:333-356);
    DenseNet201 (monai-vanilla equivalent): (6,12,48,32) with
    feature_channels=None -> plain ReLU->pool->Linear head.

TPU-first design notes:
  * channels-last layout (N, *spatial, C): the growing concat axis is the XLA
    lane dimension, so dense-block concats are free (layout no-ops) and every
    1x1 conv is a pure MXU matmul over (voxels x channels).
  * optional bfloat16 compute dtype (params stay fp32).
  * Grad-CAM support without hooks: `gradcam_probe` is added to the output of
    the LAST conv of the backbone (the activation the reference hooks:
    /root/reference/utils/utils.py:262-274), and that activation is returned
    as an aux output when `capture_gradcam=True`; jax.grad w.r.t. the probe
    yields the cotangent the reference captures with a backward hook.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import (
    BN_MOMENTUM,
    BatchNorm,
    ChannelDropout,
    avg_pool,
    compute_batch_stats,
    conv,
    global_avg_pool,
    kaiming_normal,
    max_pool,
)


def _s2d_dn(sd):
    return ("NDHWC", "DHWIO", "NDHWC") if sd == 3 else ("NHWC", "HWIO", "NHWC")


def _s2d_conv(xs, w, sd):
    """The blocked 4-tap stride-1 conv. Weight gradient = XLA's
    conv-backprop-filter, measured BEST of three formulations on the v5e
    (docs/PERF.md round 3 "stem weight-grad"): a custom-vjp patches-GEMM
    via conv_general_dilated_patches cost +84 ms/superstep (its grouped
    one-channel-per-group patch conv is itself layout-hostile), and a
    tap-major slice+concat patches-GEMM cost +183 ms (the 537 MB patch
    materialization reads a 16-lane-minor buffer at unaligned spatial
    offsets) — both rejected on same-sitting A/B evidence vs 109.6 ms with
    XLA's native backprop-filter."""
    import jax

    return jax.lax.conv_general_dilated(
        xs, w, (1,) * sd, [(2, 1)] * sd, dimension_numbers=_s2d_dn(sd)
    )


class S2DStemConv(nn.Module):
    """The 7^sd stride-2 stem convolution, computed space-to-depth.

    A 7-tap stride-2 conv on a 2-channel 64^3 input is the slowest op in
    the whole training step on TPU (profiled at 8.7 GB/s / ~39 ms forward
    + 13 ms weight-grad, docs/PERF.md round 3): the 2-channel minor dim
    wastes the 128-lane vector tile and the implicit-GEMM contraction is
    tiny. The standard TPU remedy is to reparametrize exactly: block the
    input 2^sd space-to-depth ((B, 64^3, C) -> (B, 32^3, 2^sd*C)) and run
    an equivalent 4-tap stride-1 conv whose kernel is a zero-padded
    re-scatter of the logical 7-tap weights:

        W'[j, t, c, f] = W[2j + t - 1, c, f]   (zero where 2j+t-1 < 0)
        out[o] = sum_j W'[j] . xs[o + j - 2]   (pad 2 left, 1 right)

    which reproduces out[o] = sum_k W[k] . x[2o + k - 3] bit-for-bit up to
    float summation order. The logical parameter keeps nn.Conv's exact
    name/shape ("kernel", (7,)*sd + (C, F)), so checkpoints and the torch
    weight importer are unaffected; autodiff carries the weight gradient
    through the (tiny) re-scatter. Falls back to the plain conv when a
    spatial dim is odd.
    """

    features: int
    spatial_dims: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        sd = self.spatial_dims
        c = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal, (7,) * sd + (c, self.features),
            jnp.float32,
        )
        spatial = x.shape[1:-1]
        if any(s % 2 for s in spatial):
            # odd extent: plain stride-2 conv (same params)
            import jax

            lhs, rhs = x, kernel
            if self.dtype is not None:
                lhs, rhs = lhs.astype(self.dtype), rhs.astype(self.dtype)
            dn = ("NDHWC", "DHWIO", "NDHWC") if sd == 3 else \
                ("NHWC", "HWIO", "NHWC")
            return jax.lax.conv_general_dilated(
                lhs, rhs, (2,) * sd, [(3, 3)] * sd, dimension_numbers=dn
            )

        import jax

        # kernel re-scatter: pad one leading zero per spatial axis, then
        # interleave (tap, sub-offset) pairs
        w = jnp.pad(kernel, [(1, 0)] * sd + [(0, 0), (0, 0)])
        inter = []
        for _ in range(sd):
            inter += [4, 2]
        w = w.reshape(tuple(inter) + (c, self.features))
        perm = tuple(range(0, 2 * sd, 2)) + tuple(range(1, 2 * sd, 2)) \
            + (2 * sd, 2 * sd + 1)
        w = w.transpose(perm).reshape(
            (4,) * sd + ((2**sd) * c, self.features)
        )

        # space-to-depth the input
        b = x.shape[0]
        shp = [b]
        for s in spatial:
            shp += [s // 2, 2]
        shp += [c]
        xs = x.reshape(shp)
        perm = (0,) + tuple(range(1, 1 + 2 * sd, 2)) \
            + tuple(range(2, 2 + 2 * sd, 2)) + (1 + 2 * sd,)
        xs = xs.transpose(perm).reshape(
            (b,) + tuple(s // 2 for s in spatial) + ((2**sd) * c,)
        )

        if self.dtype is not None:
            xs, w = xs.astype(self.dtype), w.astype(self.dtype)
        return _s2d_conv(xs, w, sd)


class FusedBottleneck(nn.Module):
    """BN+ReLU+1x1conv via the Pallas fused kernel (ops/pallas/fused_dense).

    Owns its BatchNorm statistics (torch-default momentum 0.9 / eps 1e-5,
    matching models/common.BatchNorm) since the elementwise prologue lives
    inside the kernel. Parameter layout: {scale, bias, kernel} +
    batch_stats {mean, var} — checkpoints are not interchangeable with the
    unfused path (perf option, off by default).
    """

    features: int
    dtype: jnp.dtype | None = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        from ..ops.pallas.fused_dense import bn_relu_conv1x1

        cin = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (cin,))
        bias = self.param("bias", nn.initializers.zeros, (cin,))
        kernel = self.param(
            "kernel", kaiming_normal, (cin, self.features), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((cin,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((cin,), jnp.float32)
        )
        if train:
            # statistics + numerical guards shared with models/common.py
            # BatchNorm (torch-exact unbiased running-var update; the parity
            # harness measured percent-level eval drift without it)
            mean, var, unbiased, any_valid = compute_batch_stats(
                x, sample_mask
            )
            if not self.is_initializing():
                m = BN_MOMENTUM
                new_mean = m * ra_mean.value + (1 - m) * mean
                new_var = m * ra_var.value + (1 - m) * unbiased
                if any_valid is not None:
                    new_mean = jnp.where(any_valid, new_mean, ra_mean.value)
                    new_var = jnp.where(any_valid, new_var, ra_var.value)
                ra_mean.value = new_mean
                ra_var.value = new_var
        else:
            mean, var = ra_mean.value, ra_var.value
        dtype = self.dtype or x.dtype
        return bn_relu_conv1x1(
            x.astype(dtype), scale, bias, mean, var,
            kernel.astype(dtype), interpret=self.interpret,
        )


class DenseLayer(nn.Module):
    spatial_dims: int
    growth_rate: int
    bn_size: int
    dropout_prob: float
    dtype: jnp.dtype | None = None
    # when set, gradcam probe/capture applies to this layer's 3x3 conv output
    is_gradcam_target: bool = False
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, gradcam_probe=None,
                 sample_mask=None):
        if self.use_pallas:
            y = FusedBottleneck(
                self.bn_size * self.growth_rate, dtype=self.dtype,
                interpret=self.pallas_interpret, name="fused1",
            )(x, train, sample_mask)
        else:
            y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="norm1")(x, sample_mask)
            y = nn.relu(y)
            y = conv(self.bn_size * self.growth_rate, 1, self.spatial_dims,
                     dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="norm2")(y, sample_mask)
        y = nn.relu(y)
        y = conv(self.growth_rate, 3, self.spatial_dims, padding=1,
                 dtype=self.dtype, name="conv2")(y)

        captured = None
        if self.is_gradcam_target:
            if gradcam_probe is not None:
                y = y + gradcam_probe
            captured = y

        if self.dropout_prob > 0:
            y = ChannelDropout(self.dropout_prob, self.spatial_dims,
                               deterministic=not train)(y)
        out = jnp.concatenate([x, y], axis=-1)
        return out, captured


class Transition(nn.Module):
    spatial_dims: int
    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="norm")(x, sample_mask)
        x = nn.relu(x)
        x = conv(self.out_channels, 1, self.spatial_dims, dtype=self.dtype,
                 name="conv")(x)
        return avg_pool(x, 2, 2, self.spatial_dims)


class DenseNet(nn.Module):
    """Generic N-D DenseNet with backbone / features / class_layers split.

    feature_channels=None selects the monai-vanilla head (no custom feature
    bottleneck) used by the 'monaidensenet'/'densenet201' registry entries.
    """

    spatial_dims: int = 3
    in_channels: int = 2
    out_channels: int = 2
    feature_channels: int | None = 12
    init_features: int = 64
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    bn_size: int = 4
    dropout_prob: float = 0.0
    dtype: jnp.dtype | None = None
    use_pallas: bool = False
    pallas_interpret: bool = False
    # TPU.remat: jax.checkpoint each dense layer / transition so the
    # backward pass recomputes layer-internal activations (the bottleneck
    # conv, BN/ReLU intermediates) instead of holding them in HBM — the
    # FLOPs-for-memory trade for volumes/batches beyond one chip's HBM.
    # The gradcam-target layer stays unwrapped (its activation IS the
    # captured output). Numerics identical: tests/test_remat.py.
    remat: bool = False

    def backbone(self, x, train: bool = False, gradcam_probe=None,
                 sample_mask=None):
        sd = self.spatial_dims
        x = S2DStemConv(self.init_features, sd, dtype=self.dtype,
                        name="conv0")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="norm0")(x, sample_mask)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1, sd)

        layer_cls, transition_cls = DenseLayer, Transition
        if self.remat:
            # static_argnums counts __call__'s positional args with the
            # module instance at 0, so `train` (a python bool) is 2
            layer_cls = nn.remat(DenseLayer, static_argnums=(2,))
            transition_cls = nn.remat(Transition, static_argnums=(2,))

        captured = None
        n_blocks = len(self.block_config)
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                is_target = (i == n_blocks - 1) and (j == num_layers - 1)
                cls = DenseLayer if is_target else layer_cls
                x, cap = cls(
                    sd, self.growth_rate, self.bn_size, self.dropout_prob,
                    dtype=self.dtype, is_gradcam_target=is_target,
                    use_pallas=self.use_pallas,
                    pallas_interpret=self.pallas_interpret,
                    name=f"block{i + 1}_layer{j + 1}",
                )(x, train, gradcam_probe if is_target else None, sample_mask)
                if cap is not None:
                    captured = cap
            if i == n_blocks - 1:
                x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                              name="norm5")(x, sample_mask)
            else:
                x = transition_cls(sd, x.shape[-1] // 2, dtype=self.dtype,
                                   name=f"transition{i + 1}")(x, train,
                                                              sample_mask)
        return x, captured

    def features(self, x, train: bool = False):
        x = nn.relu(x)
        x = global_avg_pool(x, self.spatial_dims)
        if self.feature_channels is None:
            return x
        x = nn.Dense(self.feature_channels, dtype=self.dtype, name="feature_layer")(x)
        return nn.Dropout(self.dropout_prob, deterministic=not train)(x)

    def class_layers(self, x):
        return nn.Dense(self.out_channels, dtype=self.dtype, name="out")(x)

    @property
    def gradcam_act_channels(self) -> int:
        return self.growth_rate

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


def densenet121(**kw) -> DenseNet:
    return DenseNet(block_config=(6, 12, 24, 16), **kw)


def tiny_densenet(**kw) -> DenseNet:
    """TinyDenseNet block config (/root/reference/models/densenet.py:344)."""
    return DenseNet(block_config=(6, 12, 4), **kw)


def densenet201(**kw) -> DenseNet:
    kw.setdefault("feature_channels", None)
    return DenseNet(block_config=(6, 12, 48, 32), **kw)
