"""Epoch-level training loops for classification and survival.

Orchestration parity with /root/reference/main.py:
  * train_survival (main.py:385-601): SGD+OneCycle per super-batch of 64 with
    gradient accumulation; per-epoch train C-index over the epoch's logged
    predictions; validation loss + C-indices; best-model selection on the
    UNWEIGHTED multimodal-head loss (main.py:572-577); gradient-blender
    weight update every blend_update_interval epochs from concatenated
    train+val epoch statistics (main.py:584-588); loss/c-score plots and
    gblend history CSV at the end.
  * train_classification (main.py:125-327): BCE pos_weight from class
    frequencies, optimizer step per batch, epoch F1 from thresholded sigmoid
    predictions, LossTracker diagnostics, best checkpoint on mean F1.

All hot work happens inside the jitted steps (train/steps.py); this module
only shuffles indices, reads back epoch summaries, and writes artifacts.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CLASSIFICATION_THRESHOLD, SUPER_BATCH_SIZE
from ..data.loader import DeviceDataset, EpochBatcher, gather_superbatch
from ..ops import blending
from ..ops.losses import pos_weight_from_frequencies
from ..ops.metrics import c_indices_per_class, f1_scores
from ..train import checkpoint as ckpt_lib
from ..utils.logging import MetricsWriter, get_logger
from ..utils.plotting import (
    LossTracker,
    save_blend_history,
    save_c_score_curves,
    save_f1_curves,
    save_loss_curves,
)
from .evaluate import classification_eval_split, survival_eval_split
from .steps import (
    classification_train_epoch,
    classification_train_step,
    survival_train_epoch,
    survival_train_superstep,
)

logger = get_logger()


@dataclass
class LoopConfig:
    epochs: int = 100
    batch_size: int = 8
    super_batch: int = SUPER_BATCH_SIZE
    blend: bool = False
    blend_update_interval: int = 5
    seed: int = 42
    output_dir: str = "."
    val_interval: int = 1
    augment: bool = True
    checkpoint_dir: str = ""
    save_params_name: str = ""
    metrics_path: str = "metrics.jsonl"
    profile_dir: str = ""
    ties: str = "breslow"  # Cox tie handling: "breslow" | "efron"
    # validation forward chunk size; 0 = auto (whole split when device-
    # resident, DEFAULT_EVAL_CHUNK when streaming from host)
    eval_chunk: int = 0
    # whole-epoch-as-one-XLA-program (TPU.fused_epoch); see config.py
    fused_epoch: bool = False
    # microbatches per vmapped group inside a superstep
    # (TPU.microbatch_group; semantics-preserving — see train/steps.py)
    microbatch_group: int = 1


@dataclass
class TrainResult:
    state: object
    best_metric: float
    best_epoch: int
    history: dict = field(default_factory=dict)


def _epoch_batches(ds, batcher: EpochBatcher, epoch: int, mesh):
    """Yield device batches for one epoch: direct gathers for device-resident
    datasets, prefetched H2D streaming for host-resident ones."""
    from ..data.streaming import HostDataset, prefetched_epoch

    if isinstance(ds, HostDataset):
        yield from prefetched_epoch(ds, batcher, epoch, mesh)
    else:
        for idx in batcher.epoch_indices(epoch):
            yield gather_superbatch(ds, idx, mesh)


def _flatten_epoch_preds(preds: np.ndarray, blend: bool) -> np.ndarray:
    """(steps, A, [K,] B, C) -> ([K,] N, C) concatenated along samples."""
    if blend:
        # (S, A, K, B, C) -> (K, S*A*B, C)
        s, a, k, b, c = preds.shape
        return preds.transpose(2, 0, 1, 3, 4).reshape(k, s * a * b, c)
    s, a, b, c = preds.shape
    return preds.reshape(s * a * b, c)


def _dedup_epoch(flat_preds: np.ndarray, n: int, blend: bool) -> np.ndarray:
    """Drop wrap-padded duplicate rows from the epoch prediction stream.

    The epoch stream is the shuffled order followed by wrap-padding
    (EpochBatcher.epoch_indices), so its first `n` rows are exactly the
    unique samples. Epoch statistics (train C-index / F1, gradient-blend
    updates) must exclude the pad or duplicated samples bias them relative
    to the reference's ragged last batch (/root/reference/main.py:495-498).
    """
    return flat_preds[:, :n] if blend else flat_preds[:n]


def train_survival(
    state,
    train_ds: DeviceDataset,
    val_ds: DeviceDataset,
    cfg: LoopConfig,
) -> TrainResult:
    mesh = _mesh_of(train_ds)
    accum = max(1, cfg.super_batch // cfg.batch_size)
    batcher = EpochBatcher(
        train_ds.num_samples, cfg.batch_size, accum, seed=cfg.seed,
        two_level=True,
    )
    metrics = MetricsWriter(os.path.join(cfg.output_dir, cfg.metrics_path))
    manager = (
        ckpt_lib.CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    )
    npz_saver = ckpt_lib.AsyncNpzSaver()

    best_loss = np.inf
    best_epoch = -1
    best_c_indices = None
    train_losses, val_losses = [], []
    train_cs, val_cs = [], []
    blend_history = [np.asarray(state.blend.weights)]
    # Blend updates consume validation predictions. Track which epoch they
    # came from: with val_interval > 1 and a misaligned blend_update_interval
    # the last validation's predictions are STALE (older parameters) and the
    # update must recompute them (the reference validates every epoch so
    # never hits this — /root/reference/main.py:398,585).
    val_preds = None
    val_preds_epoch = -1

    profiled = False

    from ..data.streaming import HostDataset

    resident_train = not isinstance(train_ds, HostDataset)
    resident_val = not isinstance(val_ds, HostDataset)
    # Fused-validation epoch program: one dispatch + one readback per epoch
    # (opt-in via TPU.fused_epoch; see config.py for why it ships off).
    # Falls back to separate eval when chunking was requested or a split
    # streams from host.
    use_fused = resident_train and cfg.fused_epoch
    fuse_val = use_fused and resident_val and not cfg.eval_chunk

    # one split for the whole run: a single dispatch instead of per-epoch
    # (per-step) eager key ops — each eager op is a full tunnel round-trip
    epoch_keys = jax.random.split(jax.random.key(cfg.seed), cfg.epochs)
    key = jax.random.key(cfg.seed)  # streaming-path per-step chain

    # Host snapshots of the targets: epoch statistics gather from these by
    # index so the hot loop never reads a device array back per step.
    host_events = np.asarray(train_ds.events)
    host_durations = np.asarray(train_ds.durations)
    n_unique = train_ds.num_samples

    # Ragged epochs: the wrap-padded last superstep runs with masked
    # semantics (loss/grads/BN stats over valid samples only — the
    # reference's smaller last batch, /root/reference/main.py:478-481).
    # The mask is epoch-independent (pad positions are always trailing).
    tail_mask = (
        jnp.asarray(batcher.pad_mask()[-1]) if batcher.ragged else None
    )
    steps_total = batcher.steps_per_epoch()

    for epoch in range(cfg.epochs):
        logger.info("-" * 10)
        logger.info(f"epoch {epoch + 1}/{cfg.epochs}")

        if cfg.profile_dir and epoch == 1 and not profiled:
            jax.profiler.start_trace(cfg.profile_dir)

        epoch_t0 = time.perf_counter()
        do_val = (epoch + 1) % cfg.val_interval == 0
        val_out = None

        if use_fused:
            # whole epoch (and validation, when fused) = ONE XLA program
            idx_all = jnp.asarray(batcher.epoch_indices(epoch), dtype=jnp.int32)
            idx = idx_all[:-1] if batcher.ragged else idx_all
            with mesh:
                state, out = survival_train_epoch(
                    state,
                    train_ds.model_inputs(),
                    train_ds.events,
                    train_ds.durations,
                    idx,
                    epoch_keys[epoch],
                    val_inputs=val_ds.model_inputs() if fuse_val else None,
                    val_events=val_ds.events if fuse_val else None,
                    val_durations=val_ds.durations if fuse_val else None,
                    blend=cfg.blend,
                    augment=cfg.augment,
                    ties=cfg.ties,
                    with_val=fuse_val and do_val,
                    data_axis=_data_axis(mesh, cfg.batch_size),
                    group=cfg.microbatch_group,
                    tail_idx=idx_all[-1] if batcher.ragged else None,
                    tail_mask=tail_mask,
                    space_axis=_space_axis(mesh, train_ds),
                )
            res = jax.device_get(out)
            epoch_loss = float(np.sum(res["loss"]))
            preds_host = res["preds"]
            if fuse_val and do_val:
                val_out = {
                    "preds": np.asarray(res["val_preds"]),
                    "loss": float(res["val_loss"]),
                    "selection_loss": float(res["val_selection"]),
                }
        else:
            # streaming/host path: per-superstep dispatch with H2D prefetch
            step_losses, step_preds = [], []
            for s, batch in enumerate(
                _epoch_batches(train_ds, batcher, epoch, mesh)
            ):
                key, k = jax.random.split(key)
                with mesh:
                    state, aux = survival_train_superstep(
                        state,
                        batch["inputs"],
                        batch["events"],
                        batch["durations"],
                        k,
                        blend=cfg.blend,
                        augment=cfg.augment,
                        ties=cfg.ties,
                        group=cfg.microbatch_group,
                        mask=tail_mask if s == steps_total - 1 else None,
                        data_axis=_data_axis(mesh, cfg.batch_size),
                        space_axis=_space_axis(mesh, train_ds),
                    )
                step_losses.append(aux["loss"])
                step_preds.append(aux["preds"])
            # single epoch-end readback
            epoch_loss, preds_host = jax.device_get(
                (jnp.sum(jnp.stack(step_losses)), jnp.stack(step_preds))
            )
            epoch_loss = float(epoch_loss)

        if cfg.profile_dir and epoch == 1 and not profiled:
            jax.profiler.stop_trace()
            profiled = True

        flat_order = batcher.epoch_indices(epoch).reshape(-1)
        epoch_samples = int(flat_order.size)
        train_preds = _dedup_epoch(
            _flatten_epoch_preds(np.asarray(preds_host), cfg.blend),
            n_unique, cfg.blend,
        )
        train_events = host_events[flat_order[:n_unique]]
        train_durations = host_durations[flat_order[:n_unique]]
        head0 = train_preds[0] if cfg.blend else train_preds
        try:
            train_c = c_indices_per_class(head0, train_events, train_durations)
        except ZeroDivisionError:
            train_c = [float("nan")] * head0.shape[1]
        train_cs.append(float(np.mean(train_c)))

        epoch_dt = time.perf_counter() - epoch_t0
        epoch_loss = epoch_loss / train_ds.num_samples
        train_losses.append(epoch_loss)
        logger.info(
            f"epoch {epoch + 1} average loss: {epoch_loss:.4f} "
            f"({epoch_samples / max(epoch_dt, 1e-9):.1f} samples/s)"
        )

        # Validation
        if do_val:
            out = val_out if val_out is not None else survival_eval_split(
                state, val_ds, blend=cfg.blend, ties=cfg.ties,
                chunk=cfg.eval_chunk,
            )
            val_preds = out["preds"]
            val_preds_epoch = epoch
            v_head0 = val_preds[0] if cfg.blend else val_preds
            try:
                c_indices = c_indices_per_class(
                    v_head0, np.asarray(val_ds.events), np.asarray(val_ds.durations)
                )
            except ZeroDivisionError:
                c_indices = [float("nan")] * v_head0.shape[1]
            mean_c = float(np.mean(c_indices))
            val_cs.append(mean_c)
            val_loss = out["loss"] / val_ds.num_samples
            val_losses.append(val_loss)
            selection_loss = out["selection_loss"]
            logger.info(f"All C-indexes: {c_indices}")
            logger.info(f"Mean C-index: {mean_c}")
            logger.info(f"validation loss: {val_loss}")

            if selection_loss < best_loss:
                best_loss = selection_loss
                best_epoch = epoch + 1
                best_c_indices = c_indices
                if manager:
                    manager.save(
                        epoch + 1, state, {"selection_metric": -selection_loss}
                    )
                if cfg.save_params_name:
                    # Snapshot on device + background write: a synchronous
                    # npz save here fences the training stream for the full
                    # device->host parameter fetch (docs/PERF.md).
                    snap = ckpt_lib.snapshot_params(
                        {"p": state.params, "b": state.batch_stats}
                    )
                    npz_saver.submit(
                        os.path.join(cfg.output_dir, cfg.save_params_name),
                        snap["p"],
                        snap["b"],
                    )
                logger.info("saved new best metric model")
            logger.info(
                f"current epoch: {epoch + 1} current loss: {selection_loss:.4f}"
                f" best loss: {best_loss:.4f} at epoch: {best_epoch}"
                f" best c_indices: {best_c_indices}"
            )
            metrics.write(
                kind="survival_epoch",
                epoch=epoch + 1,
                train_loss=epoch_loss,
                val_loss=val_loss,
                train_c=train_cs[-1],
                val_c=mean_c,
                selection_loss=selection_loss,
                epoch_seconds=epoch_dt,
                samples_per_sec=epoch_samples / max(epoch_dt, 1e-9),
            )

        # Gradient-blender weight update
        if cfg.blend and (epoch + 1) % cfg.blend_update_interval == 0:
            if val_preds is None or val_preds_epoch != epoch:
                # no validation this epoch (val_interval misaligned with
                # blend_update_interval): stored predictions are missing or
                # stale — recompute against the CURRENT parameters
                out = survival_eval_split(
                    state, val_ds, blend=cfg.blend, ties=cfg.ties,
                    chunk=cfg.eval_chunk,
                )
                val_preds = out["preds"]
                val_preds_epoch = epoch
            logger.info("Updating gradient blender weights")
            tr_head = blending.surv_head_losses(
                jnp.asarray(train_preds),
                jnp.asarray(train_events),
                jnp.asarray(train_durations),
                ties=cfg.ties,
            )
            va_head = blending.surv_head_losses(
                jnp.asarray(val_preds),
                jnp.asarray(np.asarray(val_ds.events)),
                jnp.asarray(np.asarray(val_ds.durations)),
                ties=cfg.ties,
            )
            new_blend = blending.blend_update(state.blend, tr_head, va_head, True)
            state = state.replace(blend=new_blend)
            blend_history.append(np.asarray(new_blend.weights))
            logger.info(f"new weights : {np.asarray(new_blend.weights)}")

        state = state.replace(epoch=state.epoch + 1)

    if cfg.blend:
        save_blend_history(blend_history, cfg.output_dir)
    save_loss_curves(train_losses, val_losses, cfg.output_dir)
    save_c_score_curves(train_cs, val_cs, cfg.output_dir)
    npz_saver.close()
    if manager:
        manager.wait()
    metrics.close()
    return TrainResult(
        state=state,
        best_metric=best_loss,
        best_epoch=best_epoch,
        history={
            "train_loss": train_losses,
            "val_loss": val_losses,
            "train_c": train_cs,
            "val_c": val_cs,
            "best_c_indices": best_c_indices,
        },
    )


def train_classification(
    state,
    train_ds: DeviceDataset,
    val_ds: DeviceDataset,
    cfg: LoopConfig,
    class_freqs=None,
) -> TrainResult:
    mesh = _mesh_of(train_ds)
    if class_freqs is None:
        class_freqs = np.asarray(train_ds.labels).mean(axis=0)
    pos_weight = pos_weight_from_frequencies(np.asarray(class_freqs))

    batcher = EpochBatcher(train_ds.num_samples, cfg.batch_size, 1, seed=cfg.seed)
    metrics = MetricsWriter(os.path.join(cfg.output_dir, cfg.metrics_path))
    manager = (
        ckpt_lib.CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    )
    npz_saver = ckpt_lib.AsyncNpzSaver()
    tracker = LossTracker()

    best_metric = -1.0
    best_epoch = -1
    best_f1s = None
    train_losses, val_losses = [], []
    train_f1s, val_f1s = [], []
    blend_history = [np.asarray(state.blend.weights)]
    # see the survival loop: blend updates must not consume predictions from
    # an older epoch's parameters when val/blend intervals are misaligned
    val_logits = None
    val_logits_epoch = -1

    from ..data.streaming import HostDataset

    resident_train = not isinstance(train_ds, HostDataset)
    resident_val = not isinstance(val_ds, HostDataset)
    use_fused = resident_train and cfg.fused_epoch
    fuse_val = use_fused and resident_val and not cfg.eval_chunk

    epoch_keys = jax.random.split(jax.random.key(cfg.seed), cfg.epochs)
    key = jax.random.key(cfg.seed)  # streaming-path per-step chain
    pos_weight_dev = jnp.asarray(pos_weight)
    host_labels = np.asarray(train_ds.labels)
    n_unique = train_ds.num_samples

    # ragged last batch: masked semantics (see train_survival)
    tail_mask = (
        jnp.asarray(batcher.pad_mask()[-1]) if batcher.ragged else None
    )
    steps_total = batcher.steps_per_epoch()

    for epoch in range(cfg.epochs):
        logger.info("-" * 10)
        logger.info(f"epoch {epoch + 1}/{cfg.epochs}")
        epoch_t0 = time.perf_counter()
        do_val = (epoch + 1) % cfg.val_interval == 0
        val_out = None

        if use_fused:
            idx_all = jnp.asarray(batcher.epoch_indices(epoch), dtype=jnp.int32)
            idx = idx_all[:-1] if batcher.ragged else idx_all
            with mesh:
                state, out = classification_train_epoch(
                    state,
                    train_ds.model_inputs(),
                    train_ds.labels,
                    pos_weight_dev,
                    idx,
                    epoch_keys[epoch],
                    val_inputs=val_ds.model_inputs() if fuse_val else None,
                    val_labels=val_ds.labels if fuse_val else None,
                    blend=cfg.blend,
                    augment=cfg.augment,
                    with_val=fuse_val and do_val,
                    data_axis=_data_axis(mesh, cfg.batch_size),
                    tail_idx=idx_all[-1] if batcher.ragged else None,
                    tail_mask=tail_mask,
                    space_axis=_space_axis(mesh, train_ds),
                )
            res = jax.device_get(out)
            epoch_loss = float(np.sum(res["loss"]))
            logits_host = res["preds"]
            if fuse_val and do_val:
                val_out = {
                    "preds": np.asarray(res["val_preds"]),
                    "elementwise": np.asarray(res["val_elementwise"]),
                    "loss": float(res["val_loss"]),
                }
        else:
            # device-side collection; one readback per epoch
            step_losses, step_logits = [], []
            for s, batch in enumerate(
                _epoch_batches(train_ds, batcher, epoch, mesh)
            ):
                key, k = jax.random.split(key)
                with mesh:
                    state, aux = classification_train_step(
                        state,
                        batch["inputs"],
                        batch["labels"],
                        pos_weight,
                        k,
                        blend=cfg.blend,
                        augment=cfg.augment,
                        mask=tail_mask if s == steps_total - 1 else None,
                        data_axis=_data_axis(mesh, cfg.batch_size),
                        space_axis=_space_axis(mesh, train_ds),
                    )
                step_losses.append(aux["loss"])
                step_logits.append(aux["preds"])

            epoch_loss, logits_host = jax.device_get(
                (jnp.sum(jnp.stack(step_losses)), jnp.stack(step_logits))
            )
            epoch_loss = float(epoch_loss)
        flat_order = batcher.epoch_indices(epoch).reshape(-1)
        logits_host = np.asarray(logits_host)
        if cfg.blend:
            # (S, K, B, C) -> (K, S*B, C)
            s, kk, b, c = logits_host.shape
            tr_logits = logits_host.transpose(1, 0, 2, 3).reshape(kk, s * b, c)
        else:
            s, b, c = logits_host.shape
            tr_logits = logits_host.reshape(s * b, c)
        tr_logits = _dedup_epoch(tr_logits, n_unique, cfg.blend)
        tr_labels = host_labels[flat_order[:n_unique]]

        head = tr_logits[0] if cfg.blend else tr_logits
        probs = 1.0 / (1.0 + np.exp(-head))
        pred_lbl = probs > CLASSIFICATION_THRESHOLD
        tps = ((pred_lbl == 1) & (tr_labels == 1)).sum(axis=0)
        fps = ((pred_lbl == 1) & (tr_labels == 0)).sum(axis=0)
        fns = ((pred_lbl == 0) & (tr_labels == 1)).sum(axis=0)

        f1s = f1_scores(tps, fps, fns)
        train_f1s.append(float(np.nanmean(f1s)))
        epoch_dt = time.perf_counter() - epoch_t0
        epoch_loss = float(epoch_loss) / train_ds.num_samples
        train_losses.append(epoch_loss)
        logger.info(
            f"epoch {epoch + 1} average loss: {epoch_loss:.4f} "
            f"({train_ds.num_samples / max(epoch_dt, 1e-9):.1f} samples/s)"
        )

        if do_val:
            out = val_out if val_out is not None else classification_eval_split(
                state, val_ds, pos_weight, blend=cfg.blend,
                chunk=cfg.eval_chunk,
            )
            val_logits = out["preds"]
            val_logits_epoch = epoch
            labels = np.asarray(val_ds.labels)
            head = val_logits[0] if cfg.blend else val_logits
            probs = 1.0 / (1.0 + np.exp(-head))
            pred_lbl = (probs > CLASSIFICATION_THRESHOLD).astype(np.float64)
            elementwise = out["elementwise"]
            tracker.update(pred_lbl, labels, elementwise)
            test_loss = float(elementwise.sum()) / val_ds.num_samples
            val_losses.append(test_loss)
            logger.info(f"Validation loss: {test_loss}")

            tp = ((pred_lbl == 1) & (labels == 1)).sum(axis=0)
            fp = ((pred_lbl == 1) & (labels == 0)).sum(axis=0)
            fn = ((pred_lbl == 0) & (labels == 1)).sum(axis=0)
            f1s = np.array(f1_scores(tp, fp, fn))
            mean_f1 = float(np.nanmean(f1s))
            val_f1s.append(mean_f1)
            if mean_f1 > best_metric:
                best_metric = mean_f1
                best_f1s = f1s
                best_epoch = epoch + 1
                if manager:
                    manager.save(epoch + 1, state, {"selection_metric": mean_f1})
                if cfg.save_params_name:
                    snap = ckpt_lib.snapshot_params(
                        {"p": state.params, "b": state.batch_stats}
                    )
                    npz_saver.submit(
                        os.path.join(cfg.output_dir, cfg.save_params_name),
                        snap["p"],
                        snap["b"],
                    )
                logger.info("saved new best metric model")
            logger.info(
                f"current epoch: {epoch + 1} current f1: {mean_f1:.4f}"
                f" best f1: {best_metric:.4f} at epoch: {best_epoch}"
            )
            metrics.write(
                kind="classification_epoch",
                epoch=epoch + 1,
                train_loss=epoch_loss,
                val_loss=test_loss,
                train_f1=train_f1s[-1],
                val_f1=mean_f1,
                epoch_seconds=epoch_dt,
                samples_per_sec=train_ds.num_samples / max(epoch_dt, 1e-9),
            )

        if cfg.blend and (epoch + 1) % cfg.blend_update_interval == 0:
            # NOTE (intent vs reference): the reference feeds sigmoid probs
            # (train) and thresholded 0/1 preds (val) back through
            # BCEWithLogits for the blend update (/root/reference/main.py:222,
            # 268, GradientBlender.py:113-117 — a double-sigmoid quirk);
            # the evident intent — raw logits for both — is used here.
            logger.info("Updating gradient blender weights")
            if val_logits is None or val_logits_epoch != epoch:
                out = classification_eval_split(
                    state, val_ds, pos_weight, blend=cfg.blend,
                    chunk=cfg.eval_chunk,
                )
                val_logits = out["preds"]
                val_logits_epoch = epoch
            tr_head = blending.class_head_losses(
                jnp.asarray(tr_logits), jnp.asarray(tr_labels), pos_weight
            )
            va_head = blending.class_head_losses(
                jnp.asarray(val_logits), jnp.asarray(np.asarray(val_ds.labels)),
                pos_weight,
            )
            new_blend = blending.blend_update(state.blend, tr_head, va_head, False)
            state = state.replace(blend=new_blend)
            blend_history.append(np.asarray(new_blend.weights))
            logger.info(f"new weights : {np.asarray(new_blend.weights)}")

        state = state.replace(epoch=state.epoch + 1)

    tracker.save_plots(cfg.output_dir)
    if cfg.blend:
        save_blend_history(blend_history, cfg.output_dir)
    save_loss_curves(train_losses, val_losses, cfg.output_dir)
    save_f1_curves(train_f1s, val_f1s, cfg.output_dir)
    if cfg.save_params_name:
        ckpt_lib.save_params_npz(
            os.path.join(cfg.output_dir, "final_" + cfg.save_params_name),
            state.params,
            state.batch_stats,
        )
    npz_saver.close()
    if manager:
        manager.wait()
    metrics.close()
    return TrainResult(
        state=state,
        best_metric=best_metric,
        best_epoch=best_epoch,
        history={
            "train_loss": train_losses,
            "val_loss": val_losses,
            "train_f1": train_f1s,
            "val_f1": val_f1s,
            "best_f1s": None if best_f1s is None else best_f1s.tolist(),
        },
    )


def _data_axis(mesh, micro_batch: int):
    """'data' when the micro-batch divides the mesh's data axis (real DP
    sharding constraint inside the fused epoch program), else None."""
    from ..parallel.mesh import data_axis_size, has_data_axis

    n_data = data_axis_size(mesh)
    if (has_data_axis(mesh) and mesh.devices.size > 1
            and micro_batch % n_data == 0):
        return "data"
    return None


def _space_axis(mesh, train_ds):
    """'space' when the mesh has a spatial-partitioning axis that divides
    the volume depth (parallel/mesh.py), else None."""
    from ..parallel.mesh import space_axis_size

    sp = space_axis_size(mesh)
    img = train_ds.inputs.get("image") if hasattr(train_ds, "inputs") else None
    if sp > 1 and img is not None and img.ndim >= 4 and img.shape[1] % sp == 0:
        return "space"
    return None


def _mesh_of(ds):
    mesh = getattr(ds, "mesh", None)
    if mesh is not None:
        return mesh
    leaf = next(iter(ds.inputs.values()))
    return leaf.sharding.mesh
