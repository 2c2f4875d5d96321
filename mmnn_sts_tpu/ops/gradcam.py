"""Grad-CAM 3D attention maps via jax.vjp (no hooks).

Parity: /root/reference/utils/utils.py:253-344 `MultiModalGradCAM` —
  * target layer: the LAST conv of the image backbone (utils.py:262-268);
    models expose it through `capture_gradcam`/`gradcam_probe`
    (models/densenet.py, models/tinycnn.py);
  * per class c: backprop the scalar output logit [batch 0, class c] to the
    activation (utils.py:302), channel-pool the gradient over
    (batch, spatial) (utils.py:308), weight the activation channels,
    average over channels, shift-min + normalize-max (utils.py:317-323),
    then trilinear-resize to the input volume shape (utils.py:339);
  * batch size must be 1 (utils.py:334).

Design: the activation is exposed as `act + probe` with a zeros probe, so
d(logit)/d(act) == d(logit)/d(probe); one jax.vjp pull per class reuses a
single linearized forward (the reference re-runs backward with
retain_graph per class). Unlike the reference (which scales the activation
buffer in place, leaking class-0 weights into class-1's map —
utils.py:313-314), each class weights a fresh copy of the activation; this
implements the evident intent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_maps(
    apply_fn,
    variables,
    inputs,
    num_classes: int,
    blend: bool = False,
):
    """Compute per-class 3D attention maps for a single-sample input.

    Args:
      apply_fn: model.apply
      variables: {'params': ..., 'batch_stats': ...}
      inputs: model inputs with batch size 1 (dict or array).
      num_classes: number of output classes C.
      blend: whether the model output is (K, N, C) head-stacked.

    Returns: (C, D, H, W) attention maps resized to the input spatial shape.
    """
    image = inputs["image"] if isinstance(inputs, dict) else inputs
    if image.shape[0] != 1:
        raise AssertionError(
            "Batch dimension found in attention map - Must use batch size 1 "
            "when computing attention maps"
        )
    spatial = image.shape[1:-1]

    # Shapes of the captured activation via abstract evaluation (no FLOPs).
    out_shape, act_shape = jax.eval_shape(
        lambda v, x: apply_fn(v, x, train=False, capture_gradcam=True),
        variables,
        inputs,
    )

    def forward(probe):
        out, act = apply_fn(
            variables, inputs, train=False, capture_gradcam=True,
            gradcam_probe=probe,
        )
        return out, act

    probe0 = jnp.zeros(act_shape.shape, act_shape.dtype)
    (out, act), vjp_fn = jax.vjp(forward, probe0)

    maps = []
    for cls in range(num_classes):
        cot_out = jnp.zeros(out.shape, out.dtype)
        if blend:
            cot_out = cot_out.at[0, 0, cls].set(1.0)
        else:
            cot_out = cot_out.at[0, cls].set(1.0)
        (grads,) = vjp_fn((cot_out, jnp.zeros(act.shape, act.dtype)))

        # pooled gradient per channel over (batch, spatial)
        pooled = jnp.mean(grads, axis=tuple(range(grads.ndim - 1)))
        weighted = act * pooled  # broadcast over trailing channel axis
        heatmap = jnp.mean(weighted, axis=-1)[0]  # (d', h', w')
        heatmap = heatmap - jnp.min(heatmap)
        heatmap = heatmap / jnp.maximum(jnp.max(heatmap), 1e-12)
        resized = jax.image.resize(heatmap, spatial, method="trilinear")
        maps.append(resized)

    return jnp.stack(maps, axis=0)
