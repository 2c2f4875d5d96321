"""Pallas fused BN+ReLU+1x1conv kernel: numerics + gradients vs XLA reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.ops.pallas.fused_dense import (
    bn_relu_conv1x1,
    fused_bn_relu_matmul,
)


def reference(x, a, b, w):
    return jnp.maximum(x * a + b, 0.0) @ w


def test_forward_matches_reference(rng):
    m, cin, cout = 96, 32, 16
    x = jnp.asarray(rng.normal(size=(m, cin)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, cin).astype(np.float32))
    b = jnp.asarray(rng.normal(size=cin).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    got = fused_bn_relu_matmul(x, a, b, w, True)
    want = reference(x, a, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_forward_ragged_tile(rng):
    """M not a multiple of the tile size (grid edge masking)."""
    m, cin, cout = 700, 16, 8
    x = jnp.asarray(rng.normal(size=(m, cin)).astype(np.float32))
    a = jnp.ones((cin,))
    b = jnp.zeros((cin,))
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    got = fused_bn_relu_matmul(x, a, b, w, True)
    want = reference(x, a, b, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_reference(rng):
    m, cin, cout = 64, 8, 4
    x = jnp.asarray(rng.normal(size=(m, cin)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, cin).astype(np.float32))
    b = jnp.asarray(rng.normal(size=cin).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))

    def loss_fused(x, a, b, w):
        return jnp.sum(fused_bn_relu_matmul(x, a, b, w, True) * g)

    def loss_ref(x, a, b, w):
        return jnp.sum(reference(x, a, b, w) * g)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, a, b, w)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, a, b, w)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=1e-3, atol=1e-4)


def test_bn_entry_point_matches_batchnorm_math(rng):
    n, s, cin, cout = 2, 4, 8, 12
    x = jnp.asarray(rng.normal(size=(n, s, s, s, cin)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 2.0, cin).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cin).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=cin).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, cin).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))

    got = bn_relu_conv1x1(x, scale, bias, mean, var, w, interpret=True)
    normed = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    want = jnp.maximum(normed, 0.0) @ w
    assert got.shape == (n, s, s, s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_densenet_pallas_path_matches_unfused(rng):
    """Full TinyDenseNet forward: pallas bottleneck vs standard path, with
    parameters copied across layouts."""
    from mmnn_sts_tpu.models.densenet import tiny_densenet

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    ref_model = tiny_densenet(in_channels=1, out_channels=2,
                              feature_channels=4)
    pal_model = tiny_densenet(in_channels=1, out_channels=2,
                              feature_channels=4, use_pallas=True,
                              pallas_interpret=True)
    ref_vars = ref_model.init(jax.random.key(0), x, train=False)
    pal_vars = pal_model.init(jax.random.key(0), x, train=False)

    # copy unfused params into the fused layout
    import copy

    pal_params = jax.tree.map(lambda v: v, pal_vars["params"])
    pal_stats = jax.tree.map(lambda v: v, pal_vars["batch_stats"])
    for scope, tree in ref_vars["params"].items():
        if "fused1" in str(pal_params.get(scope, {})) or (
            isinstance(pal_params.get(scope), dict)
            and "fused1" in pal_params[scope]
        ):
            pal_params[scope]["fused1"]["scale"] = tree["norm1"]["BatchNorm_0"]["scale"]
            pal_params[scope]["fused1"]["bias"] = tree["norm1"]["BatchNorm_0"]["bias"]
            pal_params[scope]["fused1"]["kernel"] = tree["conv1"]["kernel"].reshape(
                tree["conv1"]["kernel"].shape[-2:]
            )
            for k in ("norm2", "conv2"):
                pal_params[scope][k] = tree[k]
            pal_stats[scope]["fused1"]["mean"] = (
                ref_vars["batch_stats"][scope]["norm1"]["BatchNorm_0"]["mean"]
            )
            pal_stats[scope]["fused1"]["var"] = (
                ref_vars["batch_stats"][scope]["norm1"]["BatchNorm_0"]["var"]
            )
            pal_stats[scope]["norm2"] = ref_vars["batch_stats"][scope]["norm2"]
        else:
            pal_params[scope] = tree
            if scope in ref_vars["batch_stats"]:
                pal_stats[scope] = ref_vars["batch_stats"][scope]

    want = ref_model.apply(ref_vars, x, train=False)
    got = pal_model.apply(
        {"params": pal_params, "batch_stats": pal_stats}, x, train=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
