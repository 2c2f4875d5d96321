"""Jitted train/eval steps (the hot loops).

TPU-first redesign of the reference's per-batch Python loops
(/root/reference/main.py:445-492 survival, 191-229 classification):

  * ONE `jax.jit`-compiled super-step per optimizer update. For survival, the
    64-sample super-batch is laid out as (accum_steps=8, batch=8, ...) and a
    `lax.scan` runs the 8 microbatches: forward+backward per microbatch,
    BatchNorm statistics updated per microbatch, gradients summed, a single
    optimizer/schedule step at the end — exactly the reference's gradient-
    accumulation semantics (main.py:403-407, 478-481; SURVEY.md "hard parts":
    Cox loss is computed per microbatch, NOT on the full super-batch).
  * augmentation runs on device inside the same jit (ops/augment.py), so a
    training step does zero host<->device transfers beyond the index gather.
  * data parallelism: the batch axis is sharded over the mesh's 'data' axis;
    XLA's SPMD partitioner inserts the psum over ICI for the gradient
    reduction. Nothing in this file mentions a collective explicitly.
  * donate_argnums on the state: parameters are updated in place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.augment import eval_transform, train_augment
from ..ops.blending import (
    blended_class_loss,
    blended_surv_loss,
)
from ..ops.cox import multi_cox_loss
from ..ops.losses import bce_with_logits
from .state import TrainState


def _augment_inputs(inputs, key, train: bool):
    """Apply the image transform pipeline to the image modality (if any)."""
    def transform(vol_batch):
        if train:
            keys = jax.random.split(key, vol_batch.shape[0])
            return jax.vmap(train_augment)(vol_batch, keys)
        return jax.vmap(eval_transform)(vol_batch)

    if isinstance(inputs, dict):
        if "image" in inputs:
            out = dict(inputs)
            out["image"] = transform(inputs["image"])
            return out
        return inputs
    if inputs.ndim >= 4:  # (B, *spatial, C) image batch
        return transform(inputs)
    return inputs  # clinical-only (B, F)


def _shard_batch(tree, data_axis: str | None, batch_dim: int,
                 space_axis: str | None = None):
    """Constrain the micro-batch axis of every leaf onto the mesh 'data'
    axis (SPMD data parallelism inside the fused epoch program); image
    leaves additionally constrain their depth axis onto `space_axis`
    (spatial partitioning of the volume grid — parallel/mesh.py). Each
    axis applies independently: a space-only mesh (data_axis None — the
    config whose point is activations too big for one chip's HBM) still
    constrains the depth axis, and non-image leaves there pin to
    replicated. No-op only when both axes are None (single chip).
    Requires a mesh context at trace time.
    """
    if data_axis is None and space_axis is None:
        return tree

    def constrain(x):
        spec = [None] * x.ndim
        spec[batch_dim] = data_axis
        if space_axis is not None and x.ndim >= batch_dim + 4:
            spec[batch_dim + 1] = space_axis
        return jax.lax.with_sharding_constraint(x, jax.P(*spec))

    return jax.tree.map(constrain, tree)


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_zeros_like(t):
    return jax.tree.map(jnp.zeros_like, t)


def _ordered_ema_merge(old_bs, stacked_bs, momentum: float):
    """Fold G per-microbatch BatchNorm running-stat updates computed in
    PARALLEL (each from the same pre-group value `old`) into the value
    sequential microbatch processing produces.

    Each parallel update is mut_g = m*old + (1-m)*stat_g. Applying the G
    updates in order gives
        new = m^G old + sum_g m^(G-1-g) (1-m) stat_g
            = m^G old + sum_g m^(G-1-g) (mut_g - m*old).
    Exact (up to f32 reassociation) because every batch-stats-owning module
    in this package shares models/common.BN_MOMENTUM.
    """

    def merge(old, muts):
        g = muts.shape[0]
        coeff = momentum ** jnp.arange(g - 1, -1, -1, dtype=old.dtype)
        coeff = coeff.reshape((g,) + (1,) * old.ndim)
        return (momentum ** g) * old + jnp.sum(
            coeff * (muts - momentum * old), axis=0
        )

    return jax.tree.map(merge, old_bs, stacked_bs)


def _group_microbatches(tree, group: int):
    """Reshape (A, B, ...) leaves to (A//group, group, B, ...)."""
    return jax.tree.map(
        lambda x: x.reshape((x.shape[0] // group, group) + x.shape[1:]), tree
    )


# ---------------------------------------------------------------------------
# Survival
# ---------------------------------------------------------------------------


def _survival_superstep_body(
    state: TrainState,
    inputs: Any,  # leaves (A, B, ...) — A microbatches of B samples
    events: jax.Array,  # (A, B, C)
    durations: jax.Array,  # (A, B, C)
    key: jax.Array,
    blend: bool,
    augment: bool,
    ties: str,
    group: int = 1,
    mask: jax.Array | None = None,
    data_axis: str | None = None,
    space_axis: str | None = None,
):
    """One optimizer update over A accumulated microbatches (traceable).

    data_axis/space_axis re-anchor each microbatch's sharding AFTER the
    augmentation stage (_shard_batch constraint): the augment chain's
    depth-global resamples (rotation shears, Gaussian separable passes)
    make the SPMD partitioner gather the volume, and with no interior
    constraint it then keeps the whole model body replicated — measured
    on the 128^3 memory probe as ZERO per-device temp reduction from a
    space-sharded input. The post-augment constraint pins the conv body
    back onto (batch='data', depth='space'), so XLA inserts the conv halo
    exchanges and per-device activation memory actually falls
    (benchmarks/space_axis_memory_probe.py, docs/SCALING.md).

    group > 1 executes `group` microbatches at a time as ONE vmapped
    program (a lax.scan over A/group iterations): within a superstep the
    only cross-microbatch dependency is the BatchNorm running-stat EMA
    (training-mode normalization uses the microbatch's own statistics, and
    parameters don't change until the optimizer step), so microbatches can
    run in parallel — per-microbatch BN batch statistics, per-microbatch
    Cox losses, and the per-microbatch augment/dropout RNG keys are all
    BIT-IDENTICAL to the sequential layout, and the running-stat EMA is
    folded in its sequential order in closed form (_ordered_ema_merge).
    The only numerical difference vs group=1 is float reassociation in the
    gradient summation. The gradient is computed as ONE backward of the
    summed group loss, so the convolutions (and their weight-grads) run on
    the merged group*B batch — the round-3 first attempt vmapped
    value_and_grad instead, which lowered per-member weight-grad
    convolutions costing group x the FLOPs and LOST ~17%
    (docs/PERF.md "Grouped microbatches"); sum-then-grad recovers the
    large-batch MXU efficiency the micro-batch sweep showed.
    """
    from ..models.common import BN_MOMENTUM

    num_micro = events.shape[0]
    keys = jax.random.split(key, num_micro * 2).reshape(num_micro, 2)
    group = max(1, min(group, num_micro))
    if num_micro % group:
        group = 1  # fall back rather than change microbatch boundaries
    if mask is not None:
        # masked (ragged-tail) supersteps run once per epoch; keep them on
        # the sequential path rather than specializing the grouped program
        group = 1

    def loss_fn(params, batch_stats, mb_inputs, mb_e, mb_d, dropout_key,
                mb_mask=None):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = state.apply_fn(
            variables,
            mb_inputs,
            train=True,
            rngs={"dropout": dropout_key},
            mutable=["batch_stats"],
            sample_mask=mb_mask,
        )
        if blend:
            loss, _selection = blended_surv_loss(state.blend, out, mb_e, mb_d,
                                                 ties, mb_mask)
        else:
            loss = multi_cox_loss(out, mb_e, mb_d, ties=ties, mask=mb_mask)
        return loss, (mutated["batch_stats"], out)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_micro(batch_stats, mb_inputs, mb_e, mb_d, ks, mb_mask=None):
        mb_inputs = _augment_inputs(mb_inputs, ks[0], train=augment)
        # post-augment re-anchor (see docstring): without this the space
        # axis buys no activation memory
        mb_inputs = _shard_batch(mb_inputs, data_axis, 0, space_axis)
        (loss, (new_bs, out)), grads = grad_fn(
            state.params, batch_stats, mb_inputs, mb_e, mb_d, ks[1], mb_mask
        )
        return loss, new_bs, out, grads

    if group == 1:
        def micro(carry, xs):
            batch_stats, grad_accum, loss_sum = carry
            loss, new_bs, out, grads = one_micro(batch_stats, *xs)
            return (new_bs, _tree_add(grad_accum, grads), loss_sum + loss), out

        xs = (inputs, events, durations, keys)
        if mask is not None:
            xs = xs + (mask,)
        init = (state.batch_stats, _tree_zeros_like(state.params),
                jnp.zeros(()))
        (new_bs, grads, loss_sum), outs = jax.lax.scan(micro, init, xs)
    else:
        def micro_group(carry, xs):
            batch_stats, grad_accum, loss_sum = carry
            g_inputs, g_e, g_d, g_ks = xs  # leaves (group, B, ...)

            # ONE backward for the whole group: differentiate the SUM of the
            # vmapped per-member losses instead of vmapping value_and_grad.
            # Under vmap the convolutions run on the merged (group*B) batch,
            # so the weight-gradient is a single contraction over group*B
            # samples (the large-batch MXU efficiency) — NOT `group`
            # separate batch-group convolutions, which is why the original
            # grad-then-sum formulation cost group x the gradient FLOPs
            # (docs/PERF.md "Grouped microbatches"). Per-member BN batch
            # statistics, Cox losses and RNG keys stay inside the vmap and
            # are bit-identical to the sequential layout; sum-then-grad vs
            # grad-then-sum differs only in float reassociation.
            def group_loss(params):
                def member(mb_inputs, mb_e, mb_d, ks):
                    mb_inputs = _augment_inputs(mb_inputs, ks[0],
                                                train=augment)
                    # post-augment re-anchor (see docstring); inside vmap
                    # the batch dim is still leaf dim 0
                    mb_inputs = _shard_batch(mb_inputs, data_axis, 0,
                                             space_axis)
                    return loss_fn(params, batch_stats, mb_inputs, mb_e,
                                   mb_d, ks[1])

                losses, (bs_g, outs) = jax.vmap(member)(g_inputs, g_e, g_d,
                                                        g_ks)
                return jnp.sum(losses), (losses, bs_g, outs)

            (_, (losses, bs_g, outs)), grads_sum = jax.value_and_grad(
                group_loss, has_aux=True
            )(state.params)
            new_bs = _ordered_ema_merge(batch_stats, bs_g, BN_MOMENTUM)
            grads = _tree_add(grad_accum, grads_sum)
            return (new_bs, grads, loss_sum + jnp.sum(losses)), outs

        init = (state.batch_stats, _tree_zeros_like(state.params),
                jnp.zeros(()))
        (new_bs, grads, loss_sum), outs = jax.lax.scan(
            micro_group,
            init,
            (
                _group_microbatches(inputs, group),
                _group_microbatches(events, group),
                _group_microbatches(durations, group),
                keys.reshape(num_micro // group, group, 2),
            ),
        )
        # (A/group, group, [K,] B, C) -> (A, [K,] B, C), preserving order
        outs = jax.tree.map(
            lambda x: x.reshape((num_micro,) + x.shape[2:]), outs
        )

    new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
    return new_state, {"loss": loss_sum, "preds": outs}


@partial(jax.jit, static_argnames=("blend", "augment", "ties", "group",
                                   "data_axis", "space_axis"),
         donate_argnums=(0,))
def survival_train_superstep(
    state: TrainState,
    inputs: Any,
    events: jax.Array,
    durations: jax.Array,
    key: jax.Array,
    blend: bool = False,
    augment: bool = True,
    ties: str = "breslow",
    group: int = 1,
    mask: jax.Array | None = None,
    data_axis: str | None = None,
    space_axis: str | None = None,
):
    """One jitted optimizer update (used by the streaming/host path and
    tests; device-resident epochs use survival_train_epoch).

    Returns (new_state, aux) where aux carries the summed loss and the raw
    per-microbatch head predictions (A, [K,] B, C) for epoch-level C-index
    and gradient-blending statistics. `group` executes that many
    microbatches as one vmapped program (semantics preserved — see
    _survival_superstep_body). `mask` (A, B) marks the valid samples of a
    wrap-padded ragged tail: masked samples are excluded from losses,
    gradients and BatchNorm statistics, reproducing the reference's smaller
    last batch (/root/reference/main.py:445-492,478-481) on static shapes.
    `data_axis`/`space_axis` (mesh axis names) anchor each microbatch's
    SPMD sharding after augmentation — required for the 'space' axis to
    actually reduce per-device activation memory (see
    _survival_superstep_body).
    """
    return _survival_superstep_body(
        state, inputs, events, durations, key, blend, augment, ties, group,
        mask, data_axis, space_axis,
    )


def _survival_eval_body(state, inputs, events, durations, blend, ties):
    inputs = _augment_inputs(inputs, jax.random.key(0), train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = state.apply_fn(variables, inputs, train=False)
    if blend:
        loss, selection = blended_surv_loss(state.blend, out, events,
                                            durations, ties)
    else:
        loss = multi_cox_loss(out, events, durations, ties=ties)
        selection = loss
    return {"loss": loss, "selection_loss": selection, "preds": out}


@partial(jax.jit,
         static_argnames=("blend", "augment", "ties", "with_val", "data_axis",
                          "group", "space_axis"),
         donate_argnums=(0,))
def survival_train_epoch(
    state: TrainState,
    inputs: Any,  # full resident split, leaves (N, ...)
    events: jax.Array,  # (N, C)
    durations: jax.Array,  # (N, C)
    idx: jax.Array,  # (S, A, B) int32 — per-step gather indices
    key: jax.Array,
    val_inputs: Any = None,
    val_events: jax.Array | None = None,
    val_durations: jax.Array | None = None,
    blend: bool = False,
    augment: bool = True,
    ties: str = "breslow",
    with_val: bool = False,
    data_axis: str | None = None,
    group: int = 1,
    tail_idx: jax.Array | None = None,  # (A, B) — ragged last superstep
    tail_mask: jax.Array | None = None,  # (A, B) 0/1 validity of tail_idx
    space_axis: str | None = None,
):
    """A FULL training epoch (+ optional fused validation) as one XLA
    program: lax.scan over optimizer supersteps, each gathering its
    (A, B, ...) super-batch from the device-resident split by index.

    When the epoch is ragged (N not a multiple of the super-batch), the
    wrap-padded last superstep is passed separately as tail_idx/tail_mask
    and executed with masked semantics (losses, gradients and BatchNorm
    statistics over the valid samples only) — exactly the reference's
    smaller final batch + step-on-last-batch behavior
    (/root/reference/main.py:478-481).

    This exists because per-step dispatch is the real epoch cost on a
    tunneled single chip (~0.1-0.3s per eager op round-trip, measured in
    docs/PERF.md): a 1-superstep epoch at n=48 spent 2.6s on ~15 dispatches
    while the device computed for ~10ms. One epoch = ONE dispatch + one
    readback. The reference's per-batch Python loop
    (/root/reference/main.py:445-492) has no analogue — this is the
    TPU-native replacement.

    Validation fusion (with_val=True) runs the eval forward inside the same
    program after the last optimizer step — identical semantics to calling
    survival_eval_step afterwards, without a second dispatch.

    Returns (new_state, out) with out["loss"] (S,) per-step losses,
    out["preds"] (S, A, [K,] B, C), and when with_val:
    out["val_preds"/"val_loss"/"val_selection"].
    """
    num_steps = idx.shape[0]
    keys = jax.random.split(
        key, num_steps + (1 if tail_idx is not None else 0)
    )

    def step(st, xs, mask=None):
        step_idx, k = xs  # (A, B) indices
        mb_inputs = _shard_batch(
            jax.tree.map(lambda x: x[step_idx], inputs), data_axis, 1,
            space_axis,
        )
        st, aux = _survival_superstep_body(
            st, mb_inputs,
            _shard_batch(events[step_idx], data_axis, 1),
            _shard_batch(durations[step_idx], data_axis, 1),
            k, blend, augment, ties, group,
            mask, data_axis, space_axis,
        )
        return st, (aux["loss"], aux["preds"])

    state, (losses, preds) = jax.lax.scan(
        step, state, (idx, keys[:num_steps])
    )
    if tail_idx is not None:
        state, (tail_loss, tail_preds) = step(
            state, (tail_idx, keys[num_steps]),
            mask=_shard_batch(tail_mask, data_axis, 1),
        )
        losses = jnp.concatenate([losses, tail_loss[None]])
        preds = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b[None]], axis=0),
            preds, tail_preds,
        )
    out = {"loss": losses, "preds": preds}
    if with_val:
        ev = _survival_eval_body(state, val_inputs, val_events,
                                 val_durations, blend, ties)
        out["val_preds"] = ev["preds"]
        out["val_loss"] = ev["loss"]
        out["val_selection"] = ev["selection_loss"]
    return state, out


@partial(jax.jit, static_argnames=("blend", "ties"))
def survival_eval_step(
    state: TrainState,
    inputs: Any,  # leaves (B, ...)
    events: jax.Array,
    durations: jax.Array,
    blend: bool = False,
    ties: str = "breslow",
):
    """Validation forward pass (running BN stats, no dropout)."""
    return _survival_eval_body(state, inputs, events, durations, blend, ties)


# ---------------------------------------------------------------------------
# Classification
# ---------------------------------------------------------------------------


def _classification_step_body(state, inputs, labels, pos_weight, key,
                              blend, augment, mask=None,
                              data_axis=None, space_axis=None):
    aug_key, dropout_key = jax.random.split(key)
    inputs = _augment_inputs(inputs, aug_key, train=augment)
    # post-augment sharding re-anchor — same rationale as
    # _survival_superstep_body: without it the partitioner may replicate
    # the conv body after the augment chain's depth-global resamples and
    # the 'space' axis buys no activation memory (docs/SCALING.md).
    inputs = _shard_batch(inputs, data_axis, 0, space_axis)

    def loss_fn(params, batch_stats):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = state.apply_fn(
            variables,
            inputs,
            train=True,
            rngs={"dropout": dropout_key},
            mutable=["batch_stats"],
            sample_mask=mask,
        )
        if blend:
            loss, _sel = blended_class_loss(state.blend, out, labels,
                                            pos_weight, mask)
        else:
            loss = bce_with_logits(out, labels, pos_weight, reduction="sum",
                                   mask=mask)
        return loss, (mutated["batch_stats"], out)

    (loss, (new_bs, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats
    )
    new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
    return new_state, {"loss": loss, "preds": out}


@partial(jax.jit, static_argnames=("blend", "augment", "data_axis",
                                   "space_axis"),
         donate_argnums=(0,))
def classification_train_step(
    state: TrainState,
    inputs: Any,  # leaves (B, ...)
    labels: jax.Array,  # (B, C)
    pos_weight: jax.Array,
    key: jax.Array,
    blend: bool = False,
    augment: bool = True,
    mask: jax.Array | None = None,
    data_axis: str | None = None,
    space_axis: str | None = None,
):
    """One optimizer step per batch (no accumulation —
    /root/reference/main.py:205-217). `mask` (B,) marks the valid samples
    of a wrap-padded ragged last batch (masked loss/grads/BN statistics —
    the reference's smaller final loader batch). `data_axis`/`space_axis`
    anchor the post-augment sharding on a mesh (see
    survival_train_superstep)."""
    return _classification_step_body(state, inputs, labels, pos_weight, key,
                                     blend, augment, mask, data_axis,
                                     space_axis)


def _classification_eval_body(state, inputs, labels, pos_weight, blend):
    inputs = _augment_inputs(inputs, jax.random.key(0), train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = state.apply_fn(variables, inputs, train=False)
    head = out[0] if blend else out
    elementwise = bce_with_logits(head, labels, pos_weight, reduction="none")
    if blend:
        loss, _sel = blended_class_loss(state.blend, out, labels, pos_weight)
    else:
        loss = jnp.sum(elementwise)
    return {"loss": loss, "preds": out, "elementwise": elementwise}


@partial(jax.jit,
         static_argnames=("blend", "augment", "with_val", "data_axis",
                          "space_axis"),
         donate_argnums=(0,))
def classification_train_epoch(
    state: TrainState,
    inputs: Any,  # full resident split, leaves (N, ...)
    labels: jax.Array,  # (N, C)
    pos_weight: jax.Array,
    idx: jax.Array,  # (S, B) int32
    key: jax.Array,
    val_inputs: Any = None,
    val_labels: jax.Array | None = None,
    blend: bool = False,
    augment: bool = True,
    with_val: bool = False,
    data_axis: str | None = None,
    tail_idx: jax.Array | None = None,  # (B,) — ragged last batch
    tail_mask: jax.Array | None = None,  # (B,) 0/1 validity of tail_idx
    space_axis: str | None = None,
):
    """A full classification epoch (+ optional fused validation) as one XLA
    program — see survival_train_epoch for the dispatch-latency rationale.

    A ragged last batch is passed separately as tail_idx/tail_mask and runs
    with masked semantics (see classification_train_step).

    Returns (new_state, out): out["loss"] (S,), out["preds"]
    (S, [K,] B, C); with_val adds val_preds/val_elementwise/val_loss.
    """
    num_steps = idx.shape[0]
    keys = jax.random.split(
        key, num_steps + (1 if tail_idx is not None else 0)
    )

    def step(st, xs, mask=None):
        step_idx, k = xs  # (B,) indices
        mb_inputs = _shard_batch(
            jax.tree.map(lambda x: x[step_idx], inputs), data_axis, 0,
            space_axis,
        )
        st, aux = _classification_step_body(
            st, mb_inputs, _shard_batch(labels[step_idx], data_axis, 0),
            pos_weight, k, blend, augment, mask, data_axis, space_axis
        )
        return st, (aux["loss"], aux["preds"])

    state, (losses, preds) = jax.lax.scan(
        step, state, (idx, keys[:num_steps])
    )
    if tail_idx is not None:
        state, (tail_loss, tail_preds) = step(
            state, (tail_idx, keys[num_steps]),
            mask=_shard_batch(tail_mask, data_axis, 0),
        )
        losses = jnp.concatenate([losses, tail_loss[None]])
        preds = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b[None]], axis=0),
            preds, tail_preds,
        )
    out = {"loss": losses, "preds": preds}
    if with_val:
        ev = _classification_eval_body(state, val_inputs, val_labels,
                                       pos_weight, blend)
        out["val_preds"] = ev["preds"]
        out["val_elementwise"] = ev["elementwise"]
        out["val_loss"] = ev["loss"]
    return state, out


@partial(jax.jit, static_argnames=("blend",))
def classification_eval_step(
    state: TrainState,
    inputs: Any,
    labels: jax.Array,
    pos_weight: jax.Array,
    blend: bool = False,
):
    # unreduced losses feed the LossTracker diagnostics
    # (/root/reference/main.py:260, utils/utils.py:409-429)
    return _classification_eval_body(state, inputs, labels, pos_weight, blend)
