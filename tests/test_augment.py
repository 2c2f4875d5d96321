"""On-device augmentation pipeline tests (small volumes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.ops import augment


def vol(rng, s=12, c=2):
    return jnp.asarray(rng.normal(size=(s, s, s, c)).astype(np.float32) ** 2 + 0.1)


def test_normalize_formula(rng):
    v = vol(rng)
    out = augment.normalize(v, mean=2.0, std=3.0)
    mx = float(jnp.max(v))
    want = (np.asarray(v) - 2.0 * mx) / (3.0 * mx)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_scale_intensity_range(rng):
    out = augment.scale_intensity(vol(rng))
    assert float(jnp.min(out)) == pytest.approx(0.0, abs=1e-6)
    assert float(jnp.max(out)) == pytest.approx(1.0, abs=1e-6)


def test_rotate_zero_is_identity(rng):
    v = vol(rng)
    out = augment.rotate_plane01(v, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)


def test_rotate_quarter_turn_matches_numpy(rng):
    v = vol(rng)
    out = augment.rotate_plane01(v, jnp.asarray(np.pi / 2))
    # 90-degree rotation in the (0,1) plane ~ transpose+flip of those axes
    want = np.rot90(np.asarray(v), k=1, axes=(0, 1))
    got = np.asarray(out)
    # interior should match exactly up to interpolation at edges
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=1e-3)


def test_zoom_identity(rng):
    v = vol(rng)
    out = augment.zoom_keep_size(v, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)


def test_zoom_out_pads_with_edge(rng):
    v = vol(rng)
    out = augment.zoom_keep_size(v, jnp.asarray(0.5))
    assert out.shape == v.shape
    assert np.isfinite(np.asarray(out)).all()


def test_axis_flip(rng):
    v = vol(rng)
    for axis in range(3):
        out = augment.axis_flip(v, jnp.asarray(axis))
        want = np.flip(np.asarray(v), axis=axis)
        np.testing.assert_allclose(np.asarray(out), want)


def test_gaussian_blur_preserves_interior_mean_reduces_var(rng):
    v = vol(rng, s=24)
    out = augment.gaussian_blur(v, jnp.asarray([1.0, 1.0, 1.0]))
    # zero ('SAME') padding darkens borders (MONAI separable_filtering
    # semantics); the interior mean is preserved and variance shrinks.
    inner = (slice(7, -7),) * 3
    assert float(jnp.mean(out[inner])) == pytest.approx(
        float(jnp.mean(v[inner])), rel=0.05
    )
    assert float(jnp.var(out)) < float(jnp.var(v))


def test_gaussian_blur_matches_explicit_taps(rng):
    v = vol(rng, s=10, c=1)
    sig = jnp.asarray([0.8, 1.2, 0.5])
    out = np.asarray(augment.gaussian_blur(v, sig))
    # explicit separable correlation with zero padding
    arr = np.asarray(v)
    for axis in range(3):
        k = np.asarray(augment._gaussian_kernel(sig[axis]))
        pad = [(0, 0)] * 4
        pad[axis] = (6, 6)
        padded = np.pad(arr, pad)
        res = np.zeros_like(arr)
        for t in range(13):
            sl = [slice(None)] * 4
            sl[axis] = slice(t, t + arr.shape[axis])
            res += k[t] * padded[tuple(sl)]
        arr = res
    np.testing.assert_allclose(out, arr, rtol=1e-4, atol=1e-5)


def test_adjust_contrast_preserves_range(rng):
    v = vol(rng)
    out = augment.adjust_contrast(v, jnp.asarray(2.0))
    assert float(jnp.min(out)) == pytest.approx(float(jnp.min(v)), abs=1e-4)
    assert float(jnp.max(out)) == pytest.approx(float(jnp.max(v)), abs=1e-4)


def test_histogram_shift_monotone(rng):
    v = vol(rng)
    out = augment.histogram_shift(v, jax.random.key(3))
    a = np.asarray(v).reshape(-1)
    b = np.asarray(out).reshape(-1)
    order = np.argsort(a)
    diffs = np.diff(b[order])
    assert (diffs >= -1e-5).all()  # monotone intensity remap


def test_matmul_resample_matches_gather_exact_cases(rng):
    """The MXU (shear/zoom matmul) resample equals the gather oracle exactly
    on separable / quarter-turn transforms."""
    v = vol(rng, s=14)
    cases = [
        (0.0, 3, 1.0),
        (0.0, 3, 1.07),
        (0.0, 0, 1.0),
        (0.0, 2, 0.9),
        (np.pi / 2, 3, 1.0),
        (np.pi, 3, 1.0),
        (-np.pi / 2, 3, 1.0),
    ]
    for theta, flip, zoom in cases:
        a = np.asarray(
            augment.spatial_transform(
                v, jnp.float32(theta), jnp.int32(flip), jnp.float32(zoom)
            )
        )
        b = np.asarray(
            augment.spatial_transform_gather(
                v, jnp.float32(theta), jnp.int32(flip), jnp.float32(zoom)
            )
        )
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=str((theta, flip, zoom)))


def test_matmul_resample_close_on_smooth_rotations(rng):
    """General rotations agree with the gather oracle up to interpolator
    smoothing (3x 1-D linear vs one trilinear pass) on smooth content."""
    from scipy.ndimage import gaussian_filter

    raw = rng.normal(size=(16, 16, 16, 2))
    smooth = np.stack(
        [gaussian_filter(raw[..., c], 2.0) for c in range(2)], -1
    ).astype(np.float32)
    v = jnp.asarray(smooth)
    for theta in [0.2, -0.7, 14.0]:
        a = np.asarray(
            augment.spatial_transform(v, jnp.float32(theta), jnp.int32(3),
                                      jnp.float32(1.0))
        )
        b = np.asarray(
            augment.spatial_transform_gather(v, jnp.float32(theta),
                                             jnp.int32(3), jnp.float32(1.0))
        )
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.99, (theta, corr)


def test_train_augment_shapes_and_finite(rng):
    v = vol(rng, s=16)
    out = augment.train_augment(v, jax.random.key(0))
    assert out.shape == v.shape
    assert np.isfinite(np.asarray(out)).all()


def test_transform_batch_eval_deterministic(rng):
    vb = jnp.stack([vol(rng, s=10), vol(rng, s=10)])
    a = augment.transform_batch(vb, jax.random.key(0), train=False)
    b = augment.transform_batch(vb, jax.random.key(1), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_transform_batch_train_varies_with_key(rng):
    vb = jnp.stack([vol(rng, s=10)])
    a = augment.transform_batch(vb, jax.random.key(0), train=True)
    b = augment.transform_batch(vb, jax.random.key(99), train=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_histogram_shift_matches_interp_oracle(rng):
    """The search-free hat-basis formulation equals jnp.interp on the same
    uniform control grid (the TPU-hostile searchsorted oracle)."""
    v = vol(rng)
    key = jax.random.key(9)
    out = augment.histogram_shift(v, key, num_control_points=10)

    mn, mx = float(jnp.min(v)), float(jnp.max(v))
    u = jax.random.uniform(key, (10,))
    floating = jnp.sort(u)
    floating = (floating - floating[0]) / jnp.maximum(
        floating[-1] - floating[0], 1e-7
    )
    ref = jnp.linspace(0.0, 1.0, 10)
    rng_ = max(mx - mn, 1e-7)
    unit = (np.asarray(v) - mn) / rng_
    oracle = np.interp(unit.reshape(-1), np.asarray(ref),
                       np.asarray(floating)).reshape(v.shape) * rng_ + mn
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-4)
