"""Inference: test-set evaluation, bootstrap CIs, Grad-CAM export, CSVs.

Parity targets in /root/reference/main.py:
  * inference (605-747): classification — per-patient sigmoid/threshold,
    final per-class F1s, model_probabilities.csv (uids, probs, labels),
    Grad-CAM NIfTI export with correctness-encoded directory names (664-717);
  * inference_survival (750-887): survival — C-indices over the test set,
    survival_model_predictions.csv with MRN/VS_pred/DM_pred/..._event/
    ..._duration columns (869-877), attention-map export (816-845), and
    bootstrap mode: 50 resamples-with-replacement, per-resample C-indices,
    mean/SD across resamples, degenerate resamples skipped (767-768,
    856-860, 882-887).

TPU-first redesign of the bootstrap: the reference re-runs the whole
batch-size-1 inference loop per resample (50x forward passes of the same
deterministic model). Here the forward pass runs ONCE over the unique test
set; each resample is a multiplicity-count vector and the C-index is
computed on device with pair weights w_i * w_j — mathematically identical
(duplicate self-pairs are never admissible) — via a single vmap over the
(R, N) count matrix. 50 resamples cost one forward pass + one tiny kernel.

NOTE (intent): the reference evaluates on UIDs loaded from
`train_uid_location` (main.py:757) although a test_uid_location exists —
SURVEY.md §4 flags this as a latent bug; we evaluate the test split.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    CLASSIFICATION_THRESHOLD,
    NUM_BOOTSTRAP_ITERATIONS,
)
from ..data.loader import DeviceDataset
from ..data.nifti import save_attention_maps
from ..ops.gradcam import attention_maps
from ..ops.metrics import (
    c_indices_per_class,
    concordance_index_jax,
    f1_scores,
)
from ..utils.logging import get_logger
from .artifacts import save_probabilities_csv, save_survival_predictions_csv

logger = get_logger()


@dataclass
class InferenceConfig:
    blend: bool = False
    bootstrap: bool = False
    num_bootstrap: int = NUM_BOOTSTRAP_ITERATIONS
    gradcam: bool = True
    output_dir: str = "."
    seed: int = 42
    save_preds: bool = True
    # forward-pass chunk size; 0 = auto (whole split when device-resident,
    # fixed chunks when streaming from host) — see train/evaluate.py
    eval_chunk: int = 0
    # post-inference prediction upload (reference main.py:877-880);
    # empty bucket = disabled
    bucket: str = ""
    dest_prefix: str = "models"
    # Cox tie handling for the reported forward loss ("breslow" | "efron");
    # must match Hyperparameters.cox_ties so any surfaced loss is consistent
    # with training
    ties: str = "breslow"


@jax.jit
def _bootstrap_cindices(preds, events, durations, counts):
    """(R,) resample count vectors -> (R, C) c-indices + (R, C) admissible.

    preds/events/durations: (N, C); counts: (R, N) float multiplicities.
    """
    def one_class(p, e, d):
        def one_resample(w):
            return concordance_index_jax(d, p, e, w)

        return jax.vmap(one_resample)(counts)

    cs, adms = jax.vmap(one_class, in_axes=(1, 1, 1), out_axes=(0, 0))(
        preds, events, durations
    )
    return cs.T, adms.T  # (R, C)


def _forward_all(state, ds: DeviceDataset, blend: bool, chunk: int = 0,
                 ties: str = "breslow"):
    from ..train.evaluate import survival_eval_split

    out = survival_eval_split(state, ds, blend=blend, ties=ties, chunk=chunk)
    preds = out["preds"]
    return preds[0] if blend else preds


def inference_survival(state, ds: DeviceDataset, cfg: InferenceConfig):
    """Survival inference over a device-resident test split."""
    preds = _forward_all(state, ds, cfg.blend, chunk=cfg.eval_chunk,
                         ties=cfg.ties)
    events = np.asarray(ds.events)
    durations = np.asarray(ds.durations)

    if cfg.gradcam:
        export_attention_maps(state, ds, cfg, survival=True)

    if cfg.bootstrap:
        # Bitwise-parity resample stream: the reference calls sklearn
        # `resample(uids)` per iteration (/root/reference/main.py:767-768),
        # whose index draw is `random_state.randint(0, n, size=n)` on a
        # NumPy MT19937 stream. The reference never seeds numpy (only
        # torch.manual_seed, main.py:340), so its stream is the UNSEEDED
        # global RandomState; we keep the exact index formula but seed the
        # stream with cfg.seed for reproducibility (PARITY.md "bootstrap
        # resample RNG"). tests/test_inference.py checks the stream against
        # sklearn.utils.resample directly.
        rng = np.random.RandomState(cfg.seed)
        n = ds.num_samples
        counts = np.zeros((cfg.num_bootstrap, n), dtype=np.float32)
        for r in range(cfg.num_bootstrap):
            picks = rng.randint(0, n, size=n)
            np.add.at(counts[r], picks, 1.0)
        cs, adms = _bootstrap_cindices(
            jnp.asarray(preds), jnp.asarray(events), jnp.asarray(durations),
            jnp.asarray(counts),
        )
        cs = np.asarray(cs)
        adms = np.asarray(adms)
        valid = (adms > 0).all(axis=1)  # a degenerate class voids the resample
        cs = cs[valid]
        means = cs.mean(axis=0)
        stds = cs.std(axis=0)
        logger.info(f"Mean c indices: {means}")
        logger.info(f"Std. devs: {stds}")
        return {"mean_c": means, "std_c": stds, "resample_c": cs}

    c_indices = c_indices_per_class(preds, events, durations)
    logger.info(f"Inference complete - C-Indices: {c_indices}")
    logger.info(f"Mean C-Index: {np.mean(c_indices)}")
    if cfg.save_preds:
        save_survival_predictions_csv(
            os.path.join(cfg.output_dir, "survival_model_predictions.csv"),
            ds.uids,
            preds,
            events,
            durations,
        )
        if cfg.bucket:
            from ..utils.store import upload_artifacts

            upload_artifacts(
                cfg.bucket, cfg.output_dir,
                ["survival_model_predictions.csv"], cfg.dest_prefix,
            )
    return {"c_indices": c_indices, "preds": preds}


def inference_classification(state, ds: DeviceDataset, cfg: InferenceConfig):
    """Classification inference (parity: /root/reference/main.py:605-747)."""
    from ..train.evaluate import classification_eval_split

    out = classification_eval_split(
        state,
        ds,
        jnp.ones((int(np.asarray(ds.labels).shape[-1]),)),
        blend=cfg.blend,
        chunk=cfg.eval_chunk,
    )
    logits = out["preds"]
    head = logits[0] if cfg.blend else logits
    probs = 1.0 / (1.0 + np.exp(-head))
    pred_lbl = (probs > CLASSIFICATION_THRESHOLD).astype(np.float64)
    labels = np.asarray(ds.labels)

    if cfg.gradcam:
        export_attention_maps(
            state, ds, cfg, survival=False, pred_labels=pred_lbl,
            labels=labels, probs=probs,
        )

    tp = ((pred_lbl == 1) & (labels == 1)).sum(axis=0)
    fp = ((pred_lbl == 1) & (labels == 0)).sum(axis=0)
    fn = ((pred_lbl == 0) & (labels == 1)).sum(axis=0)
    f1s = f1_scores(tp, fp, fn)
    logger.info(f"{f1s}")
    logger.info(f"{np.nanmean(f1s)}")
    if cfg.save_preds:
        save_probabilities_csv(
            os.path.join(cfg.output_dir, "model_probabilities.csv"),
            ds.uids,
            probs,
            labels,
        )
    return {"f1s": f1s, "probs": probs}


def export_attention_maps(
    state,
    ds: DeviceDataset,
    cfg: InferenceConfig,
    survival: bool,
    pred_labels=None,
    labels=None,
    probs=None,
):
    """Per-patient Grad-CAM NIfTI export.

    Survival naming: attention_maps/_patient_{uid}/ (main.py:829);
    classification prepends correctness/label/pred bit-strings
    (main.py:668-700). The exported map is the class-0 (VitalStatus) map,
    matching main.py:827.
    """
    att_dir = os.path.join(cfg.output_dir, "attention_maps")
    os.makedirs(att_dir, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    for i, uid in enumerate(ds.uids):
        inputs = ds.model_inputs(idx=slice(i, i + 1))
        from ..ops.augment import eval_transform

        if isinstance(inputs, dict):
            inputs = dict(inputs)
            inputs["image"] = jax.vmap(eval_transform)(inputs["image"])
            image = inputs["image"]
        else:
            inputs = jax.vmap(eval_transform)(inputs)
            image = inputs
        maps = np.asarray(
            attention_maps(
                state.apply_fn,
                variables,
                inputs,
                num_classes=int(ds.events.shape[-1] if survival else ds.labels.shape[-1]),
                blend=cfg.blend,
            )
        )
        image = np.asarray(image)
        t1 = image[0, ..., 0]
        t2 = image[0, ..., 1] if image.shape[-1] > 1 else image[0, ..., 0]

        if survival or pred_labels is None:
            dirname = f"_patient_{uid}"
            preds_out = _forward_single(state, inputs, cfg.blend)
            preds_filename = "preds.txt"
        else:
            correct = "".join(
                "1" if pred_labels[i, c] == labels[i, c] else "0"
                for c in range(labels.shape[1])
            )
            lbl = "".join(str(int(x)) for x in labels[i])
            prd = "".join(str(int(x)) for x in pred_labels[i])
            dirname = f"{correct}_{lbl}_{prd}__patient_{uid}"
            preds_out = probs[i] if probs is not None else pred_labels[i]
            preds_filename = "probabilities.txt"

        save_attention_maps(
            os.path.join(att_dir, dirname), t1, t2, maps[0], preds_out,
            preds_filename=preds_filename,
            extra_maps={c: maps[c] for c in range(1, maps.shape[0])},
        )


def _forward_single(state, inputs, blend: bool):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = np.asarray(state.apply_fn(variables, inputs, train=False))
    return (out[0] if blend else out)[0]
