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
