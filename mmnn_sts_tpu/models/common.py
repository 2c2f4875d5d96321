"""Shared model building blocks (flax.linen, channels-last layout).

All image models use N[spatial...]C layout — the TPU-native layout for XLA
convolutions (lane dimension = channels feeds the MXU directly). The reference
uses torch NCDHW (/root/reference/models/densenet.py); conversion happens only
at the data-pipeline edges.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Running-stat decay shared by every batch-stats-owning module in this
# package (torch BatchNorm default momentum=0.1, i.e. decay 0.9). The grouped
# superstep (train/steps.py) folds per-microbatch EMA updates in closed form
# and relies on this being THE momentum everywhere.
BN_MOMENTUM = 0.9

# torch kaiming_normal_ (fan_in, relu): std = sqrt(2 / fan_in), full normal.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# torch kaiming_normal_(mode='fan_out') used by the reference resnet
# (/root/reference/models/resnet.py:188-190).
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def compute_batch_stats(x, mask=None):
    """Per-feature batch statistics over every axis but the last, with an
    optional per-sample 0/1 `mask` on the leading axis.

    Returns ``(mean, var, unbiased, any_valid)``:
      * ``var`` is the BIASED batch variance via E[x^2]-mean^2, clamped at
        >= 0 — f32 cancellation can round a (near-)zero variance NEGATIVE
        under XLA's fused reassociation, making rsqrt(var+eps) NaN
        (observed: drive run 2026-08-18, clinical MLP bn_0, |x|~1.3e3).
      * ``unbiased`` is the value torch folds into running_var (x n/(n-1));
        the parity harness measured percent-level eval drift without it.
      * ``any_valid`` is None when mask is None, else a traced bool; a
        fully-masked batch yields identity statistics (mean 0, var 1) —
        a var=0 floor would amplify ~1/sqrt(eps)=316x per BN and overflow
        deep nets to inf, turning masked zero cotangents into inf*0=NaN
        weight gradients (observed: drive run 2026-08-18, n=17 cohort).

    Shared by BatchNorm below and models/densenet.FusedBottleneck so these
    numerical guards cannot drift apart.
    """
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    if mask is None:
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
        n = 1
        for a in reduce_axes:
            n *= x.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        return mean, var, unbiased, None

    mf = mask.astype(jnp.float32).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    per_sample = 1
    for a in reduce_axes[1:]:
        per_sample *= x.shape[a]
    n_valid = jnp.sum(mf) * per_sample  # traced scalar
    denom = jnp.maximum(n_valid, 1.0)
    any_valid = n_valid > 0
    mean = jnp.sum(xf * mf, axis=reduce_axes) / denom
    var = jnp.sum(jnp.square(xf) * mf, axis=reduce_axes) / denom \
        - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    mean = jnp.where(any_valid, mean, 0.0)
    var = jnp.where(any_valid, var, 1.0)
    unbiased = var * (n_valid / jnp.maximum(n_valid - 1.0, 1.0))
    return mean, var, unbiased, any_valid


class _TorchSemanticsBatchNorm(nn.Module):
    """BatchNorm whose running-variance update matches torch EXACTLY.

    flax nn.BatchNorm folds the BIASED batch variance into the running
    average; torch normalizes with the biased variance but updates
    running_var with the UNBIASED one (x n/(n-1)) — at micro-batch
    reduction sizes that is a percent-level drift in every eval-mode
    forward, which the train-dynamics parity harness
    (benchmarks/parity_twin.py) surfaced as diverging validation/selection
    trajectories. Parameter/stat tree layout matches nn.BatchNorm
    (params: scale/bias, batch_stats: mean/var) so checkpoints and the
    torch-weight importer are unaffected.
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM  # running-stat decay (torch momentum = 0.1)
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None):
        """mask: optional (B,) 0/1 per-sample validity. When given, batch
        statistics (and the running-stat update) are computed over valid
        samples only — so a wrap-padded static-shape batch normalizes
        EXACTLY like the reference's smaller ragged batch
        (/root/reference/main.py:445-492: the loader's last batch simply has
        fewer samples). A fully-masked batch leaves the running stats
        untouched (the reference never runs such a batch at all).
        mask=None compiles to the unmasked program (the hot path)."""
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # numerical guards (negative-variance clamp, fully-masked
            # identity stats) live in compute_batch_stats — shared with
            # FusedBottleneck
            mean, var, unbiased, any_valid = compute_batch_stats(x, mask)
            if not self.is_initializing():
                m = self.momentum
                new_mean = m * ra_mean.value + (1 - m) * mean
                new_var = m * ra_var.value + (1 - m) * unbiased
                if any_valid is not None:
                    # fully-masked batch leaves the running stats untouched
                    # (the reference never runs such a batch at all)
                    new_mean = jnp.where(any_valid, new_mean, ra_mean.value)
                    new_var = jnp.where(any_valid, new_var, ra_var.value)
                ra_mean.value = new_mean
                ra_var.value = new_var

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        if not self.use_running_average and mask is not None:
            # Zero the MASKED rows. Their values are never consumed (losses
            # and statistics exclude them), but left alone they are amplified
            # by rsqrt(eps)~316x at every BN whose valid-sample variance is
            # degenerate (a 1-valid-sample microbatch has batch var == 0 at
            # every 1-D BN stage), compounding to ~1e17 after a few stages;
            # under XLA fusion that overflows to inf and turns the zero
            # cotangents of masked rows into inf*0=NaN weight gradients
            # (observed: drive run 2026-08-18, n=17 cohort, microbatch 4).
            mf2 = mask.astype(jnp.float32).reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1)
            )
            out = out * mf2
        return out.astype(dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch-default hyperparameters (momentum .1, eps 1e-5)
    and torch-exact running-stat semantics (see _TorchSemanticsBatchNorm).
    `mask` selects the valid samples of a wrap-padded batch (ragged-tail
    parity; see _TorchSemanticsBatchNorm.__call__).
    """

    use_running_average: bool
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None):
        return _TorchSemanticsBatchNorm(
            use_running_average=self.use_running_average,
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            dtype=self.dtype,
            name="BatchNorm_0",
        )(x, mask)


def max_pool(x, window: int, stride: int, padding: int, spatial_dims: int):
    """Max pool with symmetric integer padding (torch-style)."""
    dims = (1,) + (window,) * spatial_dims + (1,)
    strides = (1,) + (stride,) * spatial_dims + (1,)
    pad = ((0, 0),) + ((padding, padding),) * spatial_dims + ((0, 0),)
    return nn.max_pool(x, dims[1:-1], strides=strides[1:-1], padding=pad[1:-1])


def avg_pool(x, window: int, stride: int, spatial_dims: int):
    dims = (window,) * spatial_dims
    strides = (stride,) * spatial_dims
    return nn.avg_pool(x, dims, strides=strides, padding="VALID")


def global_avg_pool(x, spatial_dims: int):
    """Adaptive average pool to 1 + flatten: (N, ..., C) -> (N, C)."""
    axes = tuple(range(1, 1 + spatial_dims))
    return jnp.mean(x, axis=axes)


class ChannelDropout(nn.Module):
    """torch DropoutNd equivalent: zeroes entire channels (broadcast over
    spatial dims) — used inside dense layers (torch Dropout3d)."""

    rate: float
    spatial_dims: int
    deterministic: bool

    @nn.compact
    def __call__(self, x):
        if self.rate == 0.0:
            return x
        broadcast = tuple(range(1, 1 + self.spatial_dims))
        return nn.Dropout(
            rate=self.rate, broadcast_dims=broadcast, deterministic=self.deterministic
        )(x)


def conv(
    features: int,
    kernel: int | Sequence[int],
    spatial_dims: int,
    stride: int | Sequence[int] = 1,
    padding="SAME",
    use_bias: bool = False,
    dtype=None,
    name: str | None = None,
    kernel_init=kaiming_normal,
):
    """N-D convolution with torch-compatible integer padding semantics."""
    if isinstance(kernel, int):
        kernel = (kernel,) * spatial_dims
    if isinstance(stride, int):
        stride = (stride,) * spatial_dims
    if isinstance(padding, int):
        padding = [(padding, padding)] * spatial_dims
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel),
        strides=tuple(stride),
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=kernel_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )
