"""Serving export: the trained forward pass as a portable StableHLO artifact.

The reference has no deployment artifact at all — serving means shipping the
whole Python/torch training stack plus a ``.pth`` state dict to a SageMaker
container (/root/reference/README.md:53-55, main.py:1001-1007) and re-running
``main.py --inference``. The TPU-native equivalent is ``jax.export``: the
eval-mode forward (deterministic normalize/scale preprocessing + model apply,
/root/reference/main.py:86-92 + 605-660 semantics) is jitted, the trained
parameters are baked in as constants, and the whole program is serialized to
one self-contained StableHLO blob. Any process with jax — no mmnn_sts_tpu, no
flax, no checkpoint plumbing — deserializes it and serves on CPU *or* TPU
(the artifact is lowered for both platforms).

The batch dimension is exported symbolically (``jax.export.symbolic_shape``)
so a single artifact serves any request size without recompilation at the
trace level; the serving runtime still XLA-compiles once per concrete batch
size it sees, so pad requests to a few canonical sizes for latency-critical
serving (ServingModel does this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.augment import eval_transform

_MAGIC_SUFFIX = ".stablehlo"


def _make_forward(state, blend: bool, preprocess: bool):
    """Eval-mode forward closing over the trained variables.

    Inputs arrive raw (as decoded from NIfTI/DICOM, before intensity
    normalization) when ``preprocess`` is True — the artifact then contains
    the full deploy-time pipeline, not just the network.
    """
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def forward(inputs):
        if preprocess:
            if isinstance(inputs, dict):
                inputs = dict(inputs)
                inputs["image"] = jax.vmap(eval_transform)(inputs["image"])
            else:
                inputs = jax.vmap(eval_transform)(inputs)
        out = state.apply_fn(variables, inputs, train=False)
        # Blend-mode models emit (k+1, N, C) stacked heads; the serving
        # prediction is the fused multimodal head (reference main.py:807-809
        # uses output[0] at inference).
        return out[0] if blend else out

    return forward


def export_forward(
    state,
    sample_inputs,
    *,
    blend: bool = False,
    preprocess: bool = True,
    platforms=("cpu", "tpu"),
    path: str | None = None,
) -> bytes:
    """Serialize the eval forward to a StableHLO artifact.

    ``sample_inputs`` supplies dtypes/shapes only (a dict for multimodal,
    a bare image array otherwise); its leading batch dimension is replaced
    by a symbolic size so the artifact accepts any batch.

    Returns the serialized bytes; also writes them to ``path`` if given.
    """
    from jax import export as jexport

    (b,) = jexport.symbolic_shape("b")

    def sym(x):
        x = jnp.asarray(x)
        return jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype)

    args = jax.tree.map(sym, sample_inputs)
    forward = _make_forward(state, blend=blend, preprocess=preprocess)
    exported = jexport.export(
        jax.jit(forward), platforms=list(platforms)
    )(args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported artifact -> callable(inputs) -> preds."""
    from jax import export as jexport

    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return exported.call


class ServingModel:
    """Deployment wrapper: canonical-batch padding over a loaded artifact.

    The symbolic-batch artifact accepts any batch size but XLA compiles once
    per concrete size; a production endpoint receiving ragged request sizes
    would compile dozens of variants. ServingModel pads every request up to
    the smallest canonical size (powers of two by default, like serving
    bucketing in production inference stacks) and slices the answer back, so
    at most ``len(batch_sizes)`` programs are ever compiled.
    """

    def __init__(self, path_or_bytes, batch_sizes=(1, 2, 4, 8, 16, 32)):
        self._call = load_exported(path_or_bytes)
        self.batch_sizes = tuple(sorted(batch_sizes))

    def _bucket(self, n: int) -> int:
        for s in self.batch_sizes:
            if s >= n:
                return s
        return n  # oversized request: run at its exact size

    def __call__(self, inputs):
        leaves = jax.tree.leaves(inputs)
        n = int(leaves[0].shape[0])
        m = self._bucket(n)
        if m != n:
            pad = lambda x: jnp.concatenate(  # noqa: E731
                [jnp.asarray(x),
                 jnp.zeros((m - n,) + tuple(x.shape[1:]),
                           jnp.asarray(x).dtype)],
                axis=0,
            )
            inputs = jax.tree.map(pad, inputs)
        out = self._call(inputs)
        return np.asarray(out)[:n]
