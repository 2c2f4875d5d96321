"""Two-level configuration: CLI flags + YAML config file.

Contract parity with the reference (/root/reference/parser/parser.py:21-198 and
main.py:897-993): the same YAML sections (Data / ImageModel / ClinicalModel /
RadiomicsModel / Preprocessing / Hyperparameters) and the same CLI flags select
task x modality; internally everything is normalized into typed dataclasses.

Validation parity: t1t2 modality requires in_channels == 2
(/root/reference/parser/parser.py:39-40).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml

from . import constants as C
from .exceptions import ConfigurationError


@dataclass
class DataConfig:
    data_loc: str = ""
    image_loc: str = ""
    key_loc: str = ""
    rad_loc: str = ""
    t1_path: str = "t1"
    t2_path: str = "t2"
    # on-disk image format under image_loc: "nifti" (scan_*/mask .nii.gz per
    # patient folder) or "dicom" (per-patient image/ + mask/ DICOM series,
    # the reference's S3DicomDataset layout, ImageDatasets.py:101-126)
    image_format: str = "nifti"
    # post-run artifact upload target (reference BUCKET_NAME,
    # /root/reference/main.py:63,365-383); empty = disabled. Artifacts land
    # under <Preprocessing.output_dir>/<name> keys.
    bucket: str = ""


@dataclass
class ImageModelConfig:
    name: str = "densenet121"
    modality: str = "t1t2"
    feature_layers: int = 12
    num_classes: int = 2
    spatial_dims: int = 3
    in_channels: int = 2
    dropout_prob: float = 0.2
    # model input grid; the reference hardcodes 64^3 (main.py:60). Fixed at
    # cohort-build time so every XLA program sees static shapes.
    spatial_size: list[int] = field(default_factory=lambda: [64, 64, 64])


@dataclass
class ClinicalModelConfig:
    headers_to_convert: list[str] = field(
        default_factory=lambda: list(C.HEADERS_TO_CONVERT)
    )
    pre_op_predictors: list[str] = field(
        default_factory=lambda: list(C.PRE_OP_PREDICTORS)
    )
    post_op_predictors: list[str] = field(
        default_factory=lambda: list(C.POST_OP_PREDICTORS)
    )
    targets_binary: list[str] = field(default_factory=lambda: list(C.TARGETS_BINARY))
    targets_time: list[str] = field(default_factory=lambda: list(C.TARGETS_TIME))
    survival_start_date: str = "Surgery_Date"
    # standardize predictors with TRAIN-split mean/std before training.
    # Default False = reference parity (raw columns straight into the MLP,
    # which makes untrained logits scale with TumorVolume ~1e3).
    standardize: bool = False


@dataclass
class RadiomicsModelConfig:
    exclude_columns: list[str] = field(
        default_factory=lambda: list(C.RADIOMICS_EXCLUDE_COLUMNS)
    )
    label_columns: list[str] = field(
        default_factory=lambda: list(C.RADIOMICS_LABEL_COLUMNS)
    )
    surv_label_columns: list[str] = field(
        default_factory=lambda: list(C.RADIOMICS_SURV_LABEL_COLUMNS)
    )


@dataclass
class PreprocessingConfig:
    uid: str = C.UID
    header_pairs: list[tuple[str, str]] = field(
        default_factory=lambda: list(C.HEADER_PAIRS)
    )
    train_uid_location: str = "./stratified_train_uids.txt"
    val_uid_location: str = "./stratified_val_uids.txt"
    test_uid_location: str = "./stratified_test_uids.txt"
    output_dir: str = "models"
    num_workers: int = 4


@dataclass
class HyperparametersConfig:
    epochs: int = 100
    learning_rate: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 1e-4
    train_batch_size: int = 8
    test_batch_size: int = 4
    seed: int = 42
    log_interval: int = 100
    num_gpus: int = 1  # kept for YAML contract parity; ignored on TPU
    pretrained_weights: str = ""
    model_weights: str = ""
    # Cox partial-likelihood tie handling: "breslow" (reference/pycox
    # formulation) or "efron" (tie-corrected, beyond-reference)
    cox_ties: str = "breslow"


@dataclass
class TPUConfig:
    """TPU-native knobs (new in this framework; absent keys default sanely)."""

    # Device mesh. Default: one 'data' axis over all devices (pure DP).
    # mesh_axes: [data, space] adds SPATIAL partitioning: volume depth
    # shards over 'space' (XLA inserts conv halo exchanges + BN cross-shard
    # reductions) — the sequence-parallel analogue for volumetric MRI,
    # for resolutions whose activations exceed one chip's HBM
    # (parallel/mesh.py; tests/test_spatial_parallel.py).
    mesh_shape: list[int] = field(default_factory=lambda: [-1])  # -1: all devices
    mesh_axes: list[str] = field(default_factory=lambda: ["data"])
    compute_dtype: str = "float32"  # or "bfloat16"
    device_resident_dataset: bool = True
    # validation/inference forward chunk size; 0 = auto (whole split when
    # device-resident, fixed chunks when streaming) — train/evaluate.py.
    # NOTE: the Cox partial likelihood couples samples, so this value changes
    # the numerical validation/selection loss (sum over chunks != whole-split
    # value) and can change which epoch is checkpointed as best. For the
    # closest comparison to the reference's chunked-sum val loss, set it to
    # the reference batch size; see PARITY.md "Best-epoch selection loss".
    eval_chunk_size: int = 0
    # run each training epoch as ONE XLA program (lax.scan over supersteps
    # with fused validation; train/steps.survival_train_epoch). The right
    # design for directly-attached TPUs; ships OFF because the tunneled
    # single-chip dev environment executes that program pathologically
    # (~2.5 s/epoch vs ~20 ms for per-superstep dispatch — docs/PERF.md).
    fused_epoch: bool = False
    # number of gradient-accumulation microbatches executed as ONE vmapped
    # program per scan iteration (train/steps._survival_superstep_body).
    # Training semantics are preserved at any value (per-microbatch BN
    # statistics, per-microbatch Cox losses, per-microbatch RNG streams,
    # sequential running-stat EMA order — equivalence-tested in
    # tests/test_steps.py); only throughput changes. Ships at 1: on v5e the
    # grouped program is a measured 17-23% REGRESSION (112.7 -> 136-147 ms/
    # superstep at group 2/4/8, same true FLOPs and conv count) — the cost
    # is the layout/fusion churn of keeping per-member BN statistics and
    # augment RNG in (group, B, ...) structure against the merged
    # (group*B)-batch convolutions, plus group x activation memory in the
    # joint backward — see docs/PERF.md "Grouped microbatches". Must divide
    # the accumulation count (super_batch/batch_size) or it falls back to 1.
    microbatch_group: int = 1
    debug_nans: bool = False
    profile_dir: str = ""
    # Pallas fused BN+ReLU+1x1conv in DenseNet bottlenecks (perf option;
    # parameter layout differs from the unfused path — see
    # models/densenet.FusedBottleneck)
    use_pallas_fused_dense: bool = False
    # rematerialize DenseNet backbone activations in the backward pass
    # (jax.checkpoint per dense layer / transition), for volumes/batches
    # whose activations approach one chip's HBM (pairs with mesh_axes
    # [data, space]). Numerics identical (tests/test_remat.py). Measured
    # on v5e (docs/PERF.md round 4): the scan accumulation already bounds
    # live activations to one microbatch, so at <=96^3 this trades only
    # -8..-13% temp HBM for +2..+8% step time — keep OFF until temp
    # memory is the binding constraint.
    remat: bool = False


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    image_model: ImageModelConfig = field(default_factory=ImageModelConfig)
    clinical_model: ClinicalModelConfig = field(default_factory=ClinicalModelConfig)
    radiomics_model: RadiomicsModelConfig = field(default_factory=RadiomicsModelConfig)
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    hyperparameters: HyperparametersConfig = field(
        default_factory=HyperparametersConfig
    )
    tpu: TPUConfig = field(default_factory=TPUConfig)


_YAML_SECTION_KEYS = {
    "Data": ("data", DataConfig, {}),
    "ImageModel": ("image_model", ImageModelConfig, {}),
    "ClinicalModel": (
        "clinical_model",
        ClinicalModelConfig,
        {
            "HEADERS_TO_CONVERT": "headers_to_convert",
            "PRE_OP_PREDICTORS": "pre_op_predictors",
            "POST_OP_PREDICTORS": "post_op_predictors",
            "TARGETS_BINARY": "targets_binary",
            "TARGETS_TIME": "targets_time",
            "SURVIVAL_START_DATE": "survival_start_date",
        },
    ),
    "RadiomicsModel": (
        "radiomics_model",
        RadiomicsModelConfig,
        {
            "RADIOMICS_EXCLUDE_COLUMNS": "exclude_columns",
            "RADIOMICS_LABEL_COLUMNS": "label_columns",
            "RADIOMICS_SURV_LABEL_COLUMNS": "surv_label_columns",
        },
    ),
    "Preprocessing": (
        "preprocessing",
        PreprocessingConfig,
        {"UID": "uid", "HEADER_PAIRS": "header_pairs"},
    ),
    "Hyperparameters": ("hyperparameters", HyperparametersConfig, {}),
    "TPU": ("tpu", TPUConfig, {}),
}


def _build_section(cls, raw: dict[str, Any], aliases: dict[str, str]):
    known = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in raw.items():
        name = aliases.get(key, key)
        if name in known:
            if name == "header_pairs":
                value = [tuple(v) for v in value]
            kwargs[name] = value
    return cls(**kwargs)


def parse_config(path: str) -> Config:
    """Load + validate a YAML config file into a typed Config."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config()
    for section, (attr, cls, aliases) in _YAML_SECTION_KEYS.items():
        if section in raw and isinstance(raw[section], dict):
            setattr(cfg, attr, _build_section(cls, raw[section], aliases))
    validate_config(cfg)
    return cfg


def validate_config(cfg: Config) -> None:
    if (
        cfg.image_model.modality.lower().startswith("t1t2")
        and cfg.image_model.in_channels != 2
    ):
        raise ConfigurationError(
            "T1T2 ImageModel modality requires 2 input channels - current "
            f"number of in_channels: {cfg.image_model.in_channels}"
        )
    if cfg.data.image_format not in ("nifti", "dicom"):
        raise ConfigurationError(
            f"Unsupported Data.image_format: {cfg.data.image_format} "
            "(options: 'nifti', 'dicom')"
        )
    if cfg.tpu.compute_dtype not in ("float32", "bfloat16"):
        raise ConfigurationError(
            f"Unsupported compute_dtype: {cfg.tpu.compute_dtype}"
        )
    if cfg.hyperparameters.cox_ties not in ("breslow", "efron"):
        raise ConfigurationError(
            f"Unsupported cox_ties: {cfg.hyperparameters.cox_ties} "
            "(options: 'breslow', 'efron')"
        )


def get_image_path(cfg: Config):
    """modality -> image path(s); tuple for t1t2
    (parity: /root/reference/parser/parser.py:184-198)."""
    import os

    modality = cfg.image_model.modality.lower()
    if modality.startswith("t1t2"):
        return (
            os.path.join(cfg.data.image_loc, cfg.data.t1_path),
            os.path.join(cfg.data.image_loc, cfg.data.t2_path),
        )
    if modality.startswith("t1"):
        return os.path.join(cfg.data.image_loc, cfg.data.t1_path)
    if modality.startswith("t2"):
        return os.path.join(cfg.data.image_loc, cfg.data.t2_path)
    raise ConfigurationError(
        f"Could not recognize requested Image Modality {cfg.image_model.modality}"
        " \n Options are 't1', 't2', or 't1t2'"
    )
