"""Numerical parity vs torch with transplanted weights.

Validates the layout/semantics conventions the whole framework rests on:
channels-last flax convs vs torch NCDHW, BN eval-mode math, and the MLP
stage stack (matching the reference's architecture,
/root/reference/models/mlp.py) — eval mode, where dropout placement is
irrelevant.

Known deviation (documented): torch BatchNorm stores UNBIASED variance in
its running stats while flax stores the biased batch variance; for this
model family the normalization axis size is large enough (batch x spatial)
that the n/(n-1) factor is negligible, and eval-mode parity with copied
running stats (tested here) is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mmnn_sts_tpu.models.common import conv as flax_conv
from mmnn_sts_tpu.models.mlp import MLP


def test_conv3d_layout_parity(rng):
    """flax NDHWC conv == torch NCDHW conv with transposed kernels, for the
    two kernel geometries the encoders use (7^3/s2/p3 and 3^3/p1)."""
    x = rng.normal(size=(2, 16, 16, 16, 3)).astype(np.float32)
    for k, s, p in [(7, 2, 3), (3, 1, 1), (1, 1, 0)]:
        w = rng.normal(size=(k, k, k, 3, 5)).astype(np.float32) * 0.1

        mod = flax_conv(5, k, 3, stride=s, padding=p, use_bias=False)
        out_flax = mod.apply(
            {"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x)
        )

        tconv = torch.nn.Conv3d(3, 5, k, stride=s, padding=p, bias=False)
        with torch.no_grad():
            tconv.weight.copy_(
                torch.tensor(np.transpose(w, (4, 3, 0, 1, 2)))
            )
            out_torch = tconv(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
        out_torch = np.transpose(out_torch.numpy(), (0, 2, 3, 4, 1))
        np.testing.assert_allclose(
            np.asarray(out_flax), out_torch, rtol=1e-4, atol=1e-4,
            err_msg=f"k={k} s={s} p={p}",
        )


def test_avgpool_maxpool_parity(rng):
    from mmnn_sts_tpu.models.common import avg_pool, max_pool

    x = rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32)
    got = np.asarray(avg_pool(jnp.asarray(x), 2, 2, 3))
    want = torch.nn.AvgPool3d(2, 2)(
        torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    ).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)),
                               rtol=1e-5, atol=1e-6)

    got = np.asarray(max_pool(jnp.asarray(x), 3, 2, 1, 3))
    want = torch.nn.MaxPool3d(3, 2, 1)(
        torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    ).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)),
                               rtol=1e-5, atol=1e-6)


def _torch_mlp(in_ch, out_ch, feat):
    """Torch mirror of the reference MLP architecture (eval-mode math)."""
    import torch.nn as nn

    layers = []
    widths = [32, 16, 8, 8, 8]
    prev = in_ch
    for w in widths:
        layers += [nn.Linear(prev, w), nn.BatchNorm1d(w), nn.ReLU()]
        prev = w
    layers += [nn.Linear(prev, feat), nn.BatchNorm1d(feat), nn.ReLU()]
    layers += [nn.Linear(feat, out_ch)]
    return nn.Sequential(*layers)


def test_mlp_forward_parity(rng):
    in_ch, out_ch, feat = 11, 2, 12
    model = MLP(in_channels=in_ch, out_channels=out_ch, feature_channels=feat,
                dropout_prob=0.0)
    x = rng.normal(size=(6, in_ch)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    tm = _torch_mlp(in_ch, out_ch, feat).eval()
    params = variables["params"]
    stats = variables["batch_stats"]
    linear_idx = [0, 3, 6, 9, 12, 15, 18]
    names = [f"dense_{i}" for i in range(5)] + ["dense_features", "out"]
    bn_names = [f"bn_{i}" for i in range(5)] + ["bn_features"]
    with torch.no_grad():
        for t_i, name in zip(linear_idx, names):
            tm[t_i].weight.copy_(
                torch.tensor(np.asarray(params[name]["kernel"]).T)
            )
            tm[t_i].bias.copy_(torch.tensor(np.asarray(params[name]["bias"])))
        for t_i, name in zip([1, 4, 7, 10, 13, 16], bn_names):
            bnp = params[name]["BatchNorm_0"]
            bns = stats[name]["BatchNorm_0"]
            tm[t_i].weight.copy_(torch.tensor(np.asarray(bnp["scale"])))
            tm[t_i].bias.copy_(torch.tensor(np.asarray(bnp["bias"])))
            tm[t_i].running_mean.copy_(torch.tensor(np.asarray(bns["mean"])))
            tm[t_i].running_var.copy_(torch.tensor(np.asarray(bns["var"])))

        want = tm(torch.tensor(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batchnorm_eval_parity(rng):
    """Eval-mode BN with copied running stats matches torch exactly."""
    from mmnn_sts_tpu.models.common import BatchNorm

    x = rng.normal(size=(4, 10)).astype(np.float32)
    bn = BatchNorm(use_running_average=True)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    mean = rng.normal(size=10).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 10).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, 10).astype(np.float32)
    bias = rng.normal(size=10).astype(np.float32)
    variables = {
        "params": {"BatchNorm_0": {"scale": jnp.asarray(scale),
                                   "bias": jnp.asarray(bias)}},
        "batch_stats": {"BatchNorm_0": {"mean": jnp.asarray(mean),
                                        "var": jnp.asarray(var)}},
    }
    got = np.asarray(bn.apply(variables, jnp.asarray(x)))

    tbn = torch.nn.BatchNorm1d(10).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))
        tbn.running_mean.copy_(torch.tensor(mean))
        tbn.running_var.copy_(torch.tensor(var))
        want = tbn(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
