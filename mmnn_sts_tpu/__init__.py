"""mmnn_sts_tpu — a TPU-native (JAX/XLA/Pallas) multimodal prognostic-modeling framework.

A ground-up rebuild of the capabilities of the DigITs-AIML/MMNN_STS reference
(3D-MRI encoder + clinical MLP, multilabel classification and Cox time-to-event
survival, gradient blending, bootstrap CI evaluation, Grad-CAM attention maps),
re-designed for TPU hardware:

- all dense compute (3D convs, MLPs) runs as XLA programs on the MXU in NDHWC
  layout, with optional bfloat16 compute;
- preprocessing/augmentation is a single jitted, vmapped function on device
  (replacing the reference's per-worker MONAI/SimpleITK host pipeline);
- the training step is `jit`-compiled over a `jax.sharding.Mesh` with
  batch-axis data parallelism (psum gradient reduction over ICI);
- the dataset is preprocessed eagerly once and lives device-resident in HBM,
  so the hot loop does zero host<->device transfers;
- bootstrap confidence intervals vmap over resample index arrays on device.

Reference parity notes are cited per-module as /root/reference/<file>:<line>.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import mmnn_sts_tpu` light; heavy deps load
    on first use)."""
    _API = {
        "parse_config": ("mmnn_sts_tpu.config", "parse_config"),
        "Config": ("mmnn_sts_tpu.config", "Config"),
        "build_model": ("mmnn_sts_tpu.models", "build_model"),
        "build_image_model": ("mmnn_sts_tpu.models", "build_image_model"),
        "TaskFlags": ("mmnn_sts_tpu.pipeline", "TaskFlags"),
        "load_cohort": ("mmnn_sts_tpu.pipeline", "load_cohort"),
        "make_split_dataset": ("mmnn_sts_tpu.pipeline", "make_split_dataset"),
        "create_train_state": ("mmnn_sts_tpu.train.state", "create_train_state"),
        "train_survival": ("mmnn_sts_tpu.train.loop", "train_survival"),
        "train_classification": ("mmnn_sts_tpu.train.loop",
                                 "train_classification"),
        "LoopConfig": ("mmnn_sts_tpu.train.loop", "LoopConfig"),
        "inference_survival": ("mmnn_sts_tpu.infer.run", "inference_survival"),
        "inference_classification": ("mmnn_sts_tpu.infer.run",
                                     "inference_classification"),
        "InferenceConfig": ("mmnn_sts_tpu.infer.run", "InferenceConfig"),
        "make_mesh": ("mmnn_sts_tpu.parallel.mesh", "make_mesh"),
        "cli_main": ("mmnn_sts_tpu.cli", "main"),
    }
    if name in _API:
        import importlib

        module, attr = _API[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'mmnn_sts_tpu' has no attribute {name!r}")
