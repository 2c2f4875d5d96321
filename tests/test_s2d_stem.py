"""Space-to-depth stem conv: exact equivalence with the plain 7-tap
stride-2 convolution it reparametrizes (models/densenet.S2DStemConv;
docs/PERF.md round 3 — the stem was the profiled top op at 8.7 GB/s)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.models.densenet import S2DStemConv


def _plain_conv(x, kernel, sd, stride=2, pad=3):
    dn = ("NDHWC", "DHWIO", "NDHWC") if sd == 3 else ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(
        x, kernel, (stride,) * sd, [(pad, pad)] * sd, dimension_numbers=dn
    )


@pytest.mark.parametrize("sd,shape,c", [
    (3, (16, 16, 16), 2),
    (3, (12, 8, 16), 3),
    (2, (32, 32), 2),
])
def test_s2d_matches_plain_conv(rng, sd, shape, c):
    feat = 8
    x = jnp.asarray(rng.normal(size=(2,) + shape + (c,)).astype(np.float32))
    mod = S2DStemConv(features=feat, spatial_dims=sd)
    variables = mod.init(jax.random.key(0), x)
    got = mod.apply(variables, x)
    want = _plain_conv(x, variables["params"]["kernel"], sd)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_s2d_odd_extent_fallback(rng):
    x = jnp.asarray(rng.normal(size=(1, 9, 9, 9, 2)).astype(np.float32))
    mod = S2DStemConv(features=4, spatial_dims=3)
    variables = mod.init(jax.random.key(0), x)
    got = mod.apply(variables, x)
    want = _plain_conv(x, variables["params"]["kernel"], 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_s2d_param_tree_matches_nn_conv(rng):
    """The logical parameter keeps nn.Conv's name and shape, so existing
    checkpoints and the torch weight importer load unchanged."""
    x = jnp.zeros((1, 16, 16, 16, 2))
    variables = S2DStemConv(features=8, spatial_dims=3).init(
        jax.random.key(0), x
    )
    assert set(variables["params"].keys()) == {"kernel"}
    assert variables["params"]["kernel"].shape == (7, 7, 7, 2, 8)


def test_s2d_weight_gradient_flows(rng):
    """Autodiff through the re-scatter: grads land on the logical kernel
    and match the plain conv's weight gradient."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 2)).astype(np.float32))
    mod = S2DStemConv(features=4, spatial_dims=3)
    variables = mod.init(jax.random.key(0), x)

    def loss_s2d(params):
        return jnp.sum(mod.apply({"params": params}, x) ** 2)

    def loss_plain(params):
        return jnp.sum(_plain_conv(x, params["kernel"], 3) ** 2)

    g1 = jax.grad(loss_s2d)(variables["params"])["kernel"]
    g2 = jax.grad(loss_plain)(variables["params"])["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_s2d_input_gradient_matches_plain_conv(rng):
    """The custom-vjp conv (patches-GEMM weight grad, _s2d_conv_bwd) must
    also return the exact input cotangent of the conv it replaces."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 2)).astype(np.float32))
    mod = S2DStemConv(features=4, spatial_dims=3)
    variables = mod.init(jax.random.key(0), x)

    g1 = jax.grad(lambda a: jnp.sum(mod.apply(variables, a) ** 2))(x)
    g2 = jax.grad(
        lambda a: jnp.sum(_plain_conv(a, variables["params"]["kernel"], 3) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_s2d_weight_gradient_under_vmap(rng):
    """The grouped-microbatch superstep vmaps the model over group members
    (train/steps.py); the custom vjp must batch correctly."""
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, 8, 2)).astype(np.float32))
    mod = S2DStemConv(features=4, spatial_dims=3)
    variables = mod.init(jax.random.key(0), x[0])

    def loss(params, xb):
        return jnp.sum(mod.apply({"params": params}, xb) ** 2)

    def loss_plain(params, xb):
        return jnp.sum(_plain_conv(xb, params["kernel"], 3) ** 2)

    g1 = jax.grad(
        lambda p: jnp.sum(jax.vmap(lambda xb: loss(p, xb))(x))
    )(variables["params"])["kernel"]
    g2 = jax.grad(
        lambda p: jnp.sum(jax.vmap(lambda xb: loss_plain(p, xb))(x))
    )(variables["params"])["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_densenet_still_runs_with_s2d(rng):
    # 32^3 is the smallest grid densenet121's 5 downsamplings keep nonzero
    from mmnn_sts_tpu.models.densenet import densenet121

    model = densenet121(in_channels=2, out_channels=2, feature_channels=12)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 2)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 2)
    assert np.isfinite(np.asarray(out)).all()
