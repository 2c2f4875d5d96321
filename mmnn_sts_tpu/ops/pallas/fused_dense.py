"""Pallas TPU kernel: fused BatchNorm + ReLU + 1x1 convolution.

The DenseNet bottleneck's hot op (norm1 -> relu1 -> conv1, densenet.py's
DenseLayer; reference /root/reference/models/densenet.py:75-78): a 1x1x1
convolution is a matmul over (voxels x channels), and the BN+ReLU prologue is
a VPU elementwise chain on the SAME (M, Cin) tile the MXU is about to
consume. Fusing them keeps the normalized activation in VMEM — one HBM read
of x per tile instead of a BN round-trip — and feeds the systolic array
directly:

    out = relu(x * a + b) @ W,  a = scale / sqrt(var + eps),
                                b = bias - mean * a

Forward runs as a Pallas kernel tiled over the voxel axis (weights resident
in VMEM across the grid); backward is a custom VJP whose matmuls XLA already
schedules optimally (the only fusion-sensitive piece, the ReLU mask, fuses
into them).

Integration: models/densenet.py uses this for the bottleneck stage when
Config.tpu.use_pallas_fused_dense is set; numerics match the unfused path to
float tolerance (tests/test_pallas.py), and interpret mode makes the same
kernel runnable on CPU for tests.

MEASURED RESULT (v5e single chip, densenet121-3d 64^3x2ch blend superstep,
bf16): XLA path 16.8 ms/step vs 2.51 s/step with this kernel enabled — XLA's
native conv+elementwise fusion wins decisively here (inserting a custom
kernel 58x per microbatch forces (N,D,H,W,C)<->(M,C) relayouts and breaks
producer/consumer fusion around every bottleneck). The kernel therefore
stays OFF by default and exists as the measured-and-documented baseline for
future Pallas work where XLA fusion genuinely falls short.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 512


def _kernel(x_ref, a_ref, b_ref, w_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    h = jnp.maximum(x * a_ref[:] + b_ref[:], 0.0)
    o_ref[:] = jnp.dot(
        h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _forward(x, a, b, w, interpret: bool):
    m, cin = x.shape
    cout = w.shape[1]
    tile = min(_TILE_M, m)
    grid = (pl.cdiv(m, tile),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * cin * cout + 3 * m * cin,
            bytes_accessed=(m * cin + cin * cout + m * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, a.reshape(1, cin), b.reshape(1, cin), w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_bn_relu_matmul(x, a, b, w, interpret: bool = False):
    """relu(x * a + b) @ w with the elementwise prologue fused into the MXU
    feed. x: (M, Cin); a, b: (Cin,); w: (Cin, Cout)."""
    return _forward(x, a, b, w, interpret)


def _fwd(x, a, b, w, interpret):
    out = _forward(x, a, b, w, interpret)
    return out, (x, a, b, w)


def _bwd(interpret, res, g):
    x, a, b, w = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    z = x32 * a + b
    mask = (z > 0).astype(jnp.float32)
    h = z * mask
    gh = jnp.dot(g32, w.astype(jnp.float32).T)  # (M, Cin)
    gz = gh * mask
    dx = (gz * a).astype(x.dtype)
    da = jnp.sum(gz * x32, axis=0).astype(a.dtype)
    db = jnp.sum(gz, axis=0).astype(b.dtype)
    dw = jnp.dot(h.T, g32).astype(w.dtype)
    return dx, da, db, dw


fused_bn_relu_matmul.defvjp(_fwd, _bwd)


def bn_relu_conv1x1(
    x,
    scale,
    bias,
    mean,
    var,
    w,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Channels-last N-D entry point: x (..., Cin) -> (..., Cout).

    mean/var are whichever statistics apply (batch stats in training, running
    stats in eval) — the caller owns the BN state bookkeeping.
    """
    a = (scale * jax.lax.rsqrt(var.astype(jnp.float32) + eps)).astype(jnp.float32)
    b = (bias - mean * a).astype(jnp.float32)
    lead = x.shape[:-1]
    cin = x.shape[-1]
    out = fused_bn_relu_matmul(x.reshape(-1, cin), a, b, w, interpret)
    return out.reshape(lead + (w.shape[1],))
