"""On-device augmentation pipeline: the reference's 12-op MONAI transform
stack re-built as a single pure-JAX function, vmapped over the batch inside
the jitted train step.

Reference pipeline (/root/reference/main.py:64-92):
    EnsureChannelFirst -> Normalize((img - mean*max)/(std*max))
    -> ScaleIntensity -> RandRotate(15, p=.5) -> RandAxisFlip(p=.5)
    -> RandZoom(.9-1.1, p=.5) -> Resize(64^3)
    -> RandShiftIntensity(.1, p=.3) -> RandAdjustContrast(p=.3)
    -> RandGaussianSmooth(p=.2) -> RandGaussianSharpen(p=.2)
    -> RandHistogramShift(p=.3) -> RandGaussianNoise(p=.3, std=.05) -> ToTensor
Validation: Normalize -> ScaleIntensity -> Resize (main.py:86-92).

TPU-first notes:
  * inputs are already 64^3 (host pipeline resizes per modality before
    stacking, matching ImageDatasets.py:599-602), so Resize is a no-op and
    every op below has static shapes;
  * PUBLIC layout is (D, H, W, C) channels-last per sample, but the
    pipeline BODY runs channels-LEADING (C, D, H, W): with C=2 minor the
    TPU's (8, 128) vector tiling pads the lane dimension 64x, so every
    elementwise pass costs ~64x its logical bytes (profiled round 3,
    docs/PERF.md — full-volume augment fusions at ~10 GB/s). One transpose
    in, one out, and every interior op runs on a 64-lane minor dim;
  * every resample — the rotation shears, zoom, flip, AND the Gaussian
    smooth/sharpen — is a banded (n, n) matrix multiply on the MXU (the
    Gaussians previously lowered to feature_group depthwise convolutions,
    which at C=2 are layout-hostile on TPU);
  * stochastic application uses jnp.where selects (branchless — cheap on VPU
    relative to the conv FLOPs, and vmap/jit friendly);
  * randomness: jax.random with per-sample key folding. Parity with MONAI's
    torch RNG stream is distributional, not bitwise (SURVEY.md §"hard parts").

Augmentation-parameter notes mirror MONAI defaults:
  * RandRotate(range_x=15): radians in MONAI (the reference's evident intent
    was degrees but the executed behavior is U(-15, 15) rad); rotation is in
    the plane of the first two spatial axes, bilinear, border padding.
  * RandZoom(0.9, 1.1): keep_size, edge padding.
  * RandAdjustContrast: gamma ~ U(0.5, 4.5).
  * RandGaussianSmooth: sigma ~ U(0.25, 1.5) per axis.
  * RandGaussianSharpen: sigma1 ~ U(0.5, 1.0) per axis, sigma2 = 0.5,
    alpha ~ U(10, 30); out = blur1 + alpha * (blur1 - blur2).
  * RandHistogramShift: 10 control points, monotone random remap.
  * RandGaussianNoise: std ~ U(0, 0.05).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from ..constants import IMAGE_DATA_MEAN, IMAGE_DATA_STDDEV

# Gaussian kernels: sigma <= 1.5 -> radius 6 covers 4 sigma.
_KERNEL_RADIUS = 6


def normalize(img, mean=IMAGE_DATA_MEAN, std=IMAGE_DATA_STDDEV):
    """(img - mean * max) / (std * max) — the reference's custom Normalize
    (/root/reference/utils/utils.py:348-355); max over the whole tensor."""
    mx = jnp.max(img)
    return (img - mean * mx) / (std * mx)


def scale_intensity(img):
    """Min-max to [0, 1] (MONAI ScaleIntensity default)."""
    mn, mx = jnp.min(img), jnp.max(img)
    return (img - mn) / jnp.maximum(mx - mn, 1e-12)


def _grid(shape):
    """(3, D, H, W) voxel-center coordinates."""
    d, h, w = shape
    ii = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 2)
    return ii, jj, kk


def _sample(vol, coords):
    """Trilinear sample (border clamp) per channel. vol: (D,H,W,C)."""
    def one_channel(c):
        return map_coordinates(c, coords, order=1, mode="nearest")

    return jax.vmap(one_channel, in_axes=-1, out_axes=-1)(vol)


def spatial_transform_gather(vol, theta, flip_axis, zoom_factor):
    """Fused rotate -> axis-flip -> center-zoom in ONE trilinear gather.

    Reference composition (Zoom(Flip(Rot(img))), clamp boundaries). Gathers
    are slow on the TPU's vector memory; `spatial_transform` (the default)
    computes the identical transform as MXU matmuls instead. Kept as the
    semantics oracle for tests and for non-TPU backends.

    flip_axis: 0/1/2, or 3 for "no flip".
    """
    d, h, w, _ = vol.shape
    ii, jj, kk = _grid((d, h, w))
    centers = ((d - 1) / 2.0, (h - 1) / 2.0, (w - 1) / 2.0)

    # zoom pullback
    g0 = (ii - centers[0]) / zoom_factor + centers[0]
    g1 = (jj - centers[1]) / zoom_factor + centers[1]
    g2 = (kk - centers[2]) / zoom_factor + centers[2]

    # flip pullback
    g0 = jnp.where(flip_axis == 0, (d - 1) - g0, g0)
    g1 = jnp.where(flip_axis == 1, (h - 1) - g1, g1)
    g2 = jnp.where(flip_axis == 2, (w - 1) - g2, g2)

    # rotation pullback (plane of axes 0,1)
    cos, sin = jnp.cos(-theta), jnp.sin(-theta)
    x0 = g0 - centers[0]
    x1 = g1 - centers[1]
    s0 = cos * x0 - sin * x1 + centers[0]
    s1 = sin * x0 + cos * x1 + centers[1]
    return _sample(vol, [s0, s1, g2])


def _interp_rows(src, n_in):
    """(n_out,) clamped source coords -> (n_out, n_in) linear-interp matrix.

    Each row holds the two-tap linear interpolation weights for one output
    position; out-of-range coords clamp to the edge (border/edge padding
    semantics). Applying the resample then becomes a matmul — the
    TPU-native formulation (banded matrix on the MXU instead of a gather).
    """
    src = jnp.clip(src, 0.0, n_in - 1.0)
    lo = jnp.floor(src)
    frac = (src - lo).astype(jnp.float32)
    lo = lo.astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    return (
        jax.nn.one_hot(lo, n_in, dtype=jnp.float32) * (1.0 - frac)[..., None]
        + jax.nn.one_hot(hi, n_in, dtype=jnp.float32) * frac[..., None]
    )


def _axis_coords(n):
    return jnp.arange(n, dtype=jnp.float32)


def _spatial_transform_cf(vol, theta, flip_axis, zoom_factor):
    """Channels-leading core: vol (C, D, H, W)."""
    _, d, h, w = vol.shape
    c0, c1, c2 = (d - 1) / 2.0, (h - 1) / 2.0, (w - 1) / 2.0

    # exact quarter-turn + residual in [-pi/4, pi/4] (keeps shear tangents
    # bounded for any wrapped angle)
    k = jnp.round(theta / (jnp.pi / 2.0))
    residual = theta - k * (jnp.pi / 2.0)
    k = jnp.asarray(k, jnp.int32) % 4

    def rot90_k(v):
        # image rotation by k quarter turns in the spatial (0,1) plane,
        # matching the continuous rotation convention of the gather oracle
        return jax.lax.switch(
            k,
            [
                lambda x: x,
                lambda x: jnp.flip(jnp.swapaxes(x, 1, 2), axis=1),
                lambda x: jnp.flip(jnp.flip(x, axis=1), axis=2),
                lambda x: jnp.flip(jnp.swapaxes(x, 1, 2), axis=2),
            ],
            v,
        )

    out = rot90_k(vol)

    t = jnp.tan(residual / 2.0)
    s = jnp.sin(residual)

    i_coord = _axis_coords(d)
    j_coord = _axis_coords(h)

    # shear_x(a): out[i, j] = in[i + a * (j - c1), j]
    def shear_x(v, a):
        src = i_coord[None, :] + a * (j_coord[:, None] - c1)  # (h, d)
        m = _interp_rows(src, d)  # (h, d_out, d_in)
        return jnp.einsum("jix,cxjw->cijw", m, v,
                          preferred_element_type=jnp.float32)

    # shear_y(b): out[i, j] = in[i, j + b * (i - c0)]
    def shear_y(v, b):
        src = j_coord[None, :] + b * (i_coord[:, None] - c0)  # (d, h)
        m = _interp_rows(src, h)  # (d, h_out, h_in)
        return jnp.einsum("ijy,ciyw->cijw", m, v,
                          preferred_element_type=jnp.float32)

    out = shear_x(out, t)
    out = shear_y(out, -s)
    out = shear_x(out, t)

    # flip (one axis or none) folded into the per-axis zoom matrices
    def axis_matrix(n, c, axis_id):
        src = (jnp.arange(n, dtype=jnp.float32) - c) / zoom_factor + c
        src = jnp.where(flip_axis == axis_id, (n - 1) - src, src)
        return _interp_rows(src, n)

    z0 = axis_matrix(d, c0, 0)
    z1 = axis_matrix(h, c1, 1)
    z2 = axis_matrix(w, c2, 2)
    out = jnp.einsum("ix,cxjw->cijw", z0, out,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("jy,ciyw->cijw", z1, out,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("kw,cijw->cijk", z2, out,
                     preferred_element_type=jnp.float32)
    return out.astype(vol.dtype)


def spatial_transform(vol, theta, flip_axis, zoom_factor):
    """Rotate -> axis-flip -> center-zoom, computed entirely as MXU matmuls.

    TPU-first design: per-voxel gathers (jax map_coordinates) serialize on
    TPU; instead the rotation is decomposed into three 1-D shears
    (R = Sx(tan t/2) Sy(-sin t) Sx(tan t/2)) plus an exact quarter-turn, and
    every 1-D resample (shear / zoom / flip) is a banded (n_out, n_in)
    interpolation-matrix multiply — batched matmuls straight onto the
    systolic array, computed in the channels-leading layout (see module
    docstring). Boundary handling is clamp (matching the reference's
    border/edge padding); interpolation is applied per 1-D stage, which is
    marginally smoother than a single trilinear pass — distributionally
    equivalent augmentation (the gather version remains as the oracle).

    vol: (D, H, W, C). flip_axis: 0/1/2, or 3 for "no flip".
    """
    out = _spatial_transform_cf(
        jnp.transpose(vol, (3, 0, 1, 2)), theta, flip_axis, zoom_factor
    )
    return jnp.transpose(out, (1, 2, 3, 0))


def rotate_plane01(vol, theta):
    """Rotate in the plane of spatial axes (0, 1) about the volume center."""
    return spatial_transform(vol, theta, jnp.asarray(3), jnp.asarray(1.0))


def zoom_keep_size(vol, factor):
    """Center zoom with keep_size semantics (edge padding when zooming out)."""
    return spatial_transform(vol, jnp.asarray(0.0), jnp.asarray(3), factor)


def axis_flip(vol, axis_idx):
    """Flip along one of the three spatial axes (index traced)."""
    return jax.lax.switch(
        axis_idx,
        [
            lambda v: v[::-1, :, :, :],
            lambda v: v[:, ::-1, :, :],
            lambda v: v[:, :, ::-1, :],
        ],
        vol,
    )


def _gaussian_kernel(sigma, radius=_KERNEL_RADIUS):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _toeplitz_blur_matrix(n, sigma, radius=_KERNEL_RADIUS):
    """(n, n) banded matrix applying a 1-D normalized Gaussian with ZERO
    padding (MONAI separable_filtering default): out = G @ in, with
    G[i, j] = k[i - j + radius] for |i - j| <= radius.

    A matmul formulation of the 1-D depthwise convolution — the conv
    version at C=2 forced layout-hostile feature-group convolutions on
    TPU (docs/PERF.md round 3); the matmul rides the MXU like every other
    resample in this pipeline.
    """
    k = _gaussian_kernel(sigma, radius)
    idx = jnp.arange(n)
    diff = idx[:, None] - idx[None, :] + radius  # in [.., 2*radius] on band
    on_band = (diff >= 0) & (diff <= 2 * radius)
    return jnp.where(on_band, k[jnp.clip(diff, 0, 2 * radius)], 0.0)


def _gaussian_blur_cf(vol, sigmas, radius=_KERNEL_RADIUS):
    """Separable 3D Gaussian blur as three banded matmuls. vol: (C,D,H,W)."""
    _, d, h, w = vol.shape
    g0 = _toeplitz_blur_matrix(d, sigmas[0], radius)
    g1 = _toeplitz_blur_matrix(h, sigmas[1], radius)
    g2 = _toeplitz_blur_matrix(w, sigmas[2], radius)
    out = jnp.einsum("ix,cxjw->cijw", g0, vol,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("jy,ciyw->cijw", g1, out,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("kw,cijw->cijk", g2, out,
                     preferred_element_type=jnp.float32)
    return out.astype(vol.dtype)


def gaussian_blur(vol, sigmas, radius=_KERNEL_RADIUS):
    """Separable 3D gaussian blur, per-axis sigma, zero ('SAME') padding
    matching MONAI's separable_filtering default. vol: (D, H, W, C)."""
    out = _gaussian_blur_cf(jnp.transpose(vol, (3, 0, 1, 2)), sigmas, radius)
    return jnp.transpose(out, (1, 2, 3, 0))


def adjust_contrast(img, gamma):
    mn, mx = jnp.min(img), jnp.max(img)
    rng = jnp.maximum(mx - mn, 1e-7)
    return ((img - mn) / rng) ** gamma * rng + mn


def histogram_shift(img, key, num_control_points=10):
    mn, mx = jnp.min(img), jnp.max(img)
    # monotone random control points: sorted uniforms with fixed endpoints
    u = jax.random.uniform(key, (num_control_points,))
    floating = jnp.sort(u)
    floating = (floating - floating[0]) / jnp.maximum(
        floating[-1] - floating[0], 1e-7
    )
    rng = jnp.maximum(mx - mn, 1e-7)
    unit = (img - mn) / rng
    # The reference grid is UNIFORM (linspace 0..1), so piecewise-linear
    # interpolation needs no search: it is the hat-basis expansion
    # y(x) = sum_k floating[k] * max(0, 1 - |x*(n-1) - k|), a short unrolled
    # chain of elementwise ops that XLA fuses into one VPU kernel.
    # (jnp.interp's searchsorted lowered to a per-element while-loop on TPU
    # and serialized ~90% of the training superstep — docs/PERF.md.)
    x = unit * (num_control_points - 1)
    shifted = jnp.zeros_like(x)
    for k in range(num_control_points):
        shifted = shifted + floating[k] * jnp.maximum(
            0.0, 1.0 - jnp.abs(x - k)
        )
    return shifted * rng + mn


def _maybe(key, prob, fn, img):
    """Apply fn with probability prob (branchless select)."""
    apply = jax.random.bernoulli(key, prob)
    return jnp.where(apply, fn(img), img)


def train_augment(
    vol: jax.Array,
    key: jax.Array,
    mean: float = IMAGE_DATA_MEAN,
    std: float = IMAGE_DATA_STDDEV,
) -> jax.Array:
    """Full stochastic train-time pipeline for one (D, H, W, C) sample.

    The body runs channels-leading (C, D, H, W): one transpose in, one out
    (see module docstring for the TPU lane-tiling rationale).
    """
    keys = jax.random.split(key, 20)
    img = jnp.transpose(vol, (3, 0, 1, 2))  # -> (C, D, H, W)
    img = scale_intensity(normalize(img, mean, std))

    # Fused spatial stage: RandRotate(15 rad, p=.5) -> RandAxisFlip(p=.5)
    # -> RandZoom(0.9-1.1, p=.5) in one resample. Identity parameters encode
    # "not applied", so the whole stage is skipped-ops-free.
    apply_rot = jax.random.bernoulli(keys[0], 0.5)
    theta = jnp.where(
        apply_rot,
        jax.random.uniform(keys[1], (), minval=-15.0, maxval=15.0),
        0.0,
    )
    apply_flip = jax.random.bernoulli(keys[2], 0.5)
    flip_axis = jnp.where(
        apply_flip, jax.random.randint(keys[3], (), 0, 3), 3
    )
    apply_zoom = jax.random.bernoulli(keys[4], 0.5)
    factor = jnp.where(
        apply_zoom,
        jax.random.uniform(keys[5], (), minval=0.9, maxval=1.1),
        1.0,
    )
    img = _spatial_transform_cf(img, theta, flip_axis, factor)

    # RandShiftIntensity(0.1, p=0.3)
    offset = jax.random.uniform(keys[7], (), minval=-0.1, maxval=0.1)
    img = _maybe(keys[6], 0.3, lambda v: v + offset, img)

    # RandAdjustContrast(p=0.3), gamma ~ U(0.5, 4.5)
    gamma = jax.random.uniform(keys[9], (), minval=0.5, maxval=4.5)
    img = _maybe(keys[8], 0.3, lambda v: adjust_contrast(v, gamma), img)

    # RandGaussianSmooth(p=0.2), sigma ~ U(0.25, 1.5) per axis
    sig = jax.random.uniform(keys[11], (3,), minval=0.25, maxval=1.5)
    img = _maybe(keys[10], 0.2, lambda v: _gaussian_blur_cf(v, sig), img)

    # RandGaussianSharpen(p=0.2)
    sig1 = jax.random.uniform(keys[13], (3,), minval=0.5, maxval=1.0)
    alpha = jax.random.uniform(keys[14], (), minval=10.0, maxval=30.0)

    def sharpen(v):
        b1 = _gaussian_blur_cf(v, sig1)
        b2 = _gaussian_blur_cf(v, jnp.full((3,), 0.5))
        return b1 + alpha * (b1 - b2)

    img = _maybe(keys[12], 0.2, sharpen, img)

    # RandHistogramShift(p=0.3)
    img = _maybe(keys[15], 0.3, lambda v: histogram_shift(v, keys[16]), img)

    # RandGaussianNoise(p=0.3, std ~ U(0, 0.05))
    noise_std = jax.random.uniform(keys[17], (), minval=0.0, maxval=0.05)
    noise = noise_std * jax.random.normal(keys[18], img.shape)
    apply_noise = jax.random.bernoulli(keys[19], 0.3)
    img = jnp.where(apply_noise, img + noise, img)

    return jnp.transpose(img, (1, 2, 3, 0))  # -> (D, H, W, C)


def eval_transform(
    vol: jax.Array, mean: float = IMAGE_DATA_MEAN, std: float = IMAGE_DATA_STDDEV
) -> jax.Array:
    """Deterministic validation/inference transform
    (/root/reference/main.py:86-92)."""
    return scale_intensity(normalize(vol, mean, std))


@partial(jax.jit, static_argnames=("train",))
def transform_batch(volumes, key, train: bool = True):
    """Vmapped batch transform: volumes (N, D, H, W, C), one key."""
    if not train:
        return jax.vmap(eval_transform)(volumes)
    keys = jax.random.split(key, volumes.shape[0])
    return jax.vmap(train_augment)(volumes, keys)
