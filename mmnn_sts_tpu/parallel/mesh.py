"""Device mesh + sharding layout.

The reference imports torch.distributed but never initializes it
(/root/reference/main.py:12, 336, 975 — single-process always; SURVEY.md §2.8).
Here distribution is first-class: a 1-axis `data` mesh spans all local devices
(v5e-8 slice by default), batches are sharded on their leading axis, and
parameters/optimizer state are replicated. XLA inserts the psum gradient
all-reduce over ICI during `jit` partitioning — there is no hand-written
collective in the training step.

A `model` axis is reserved in the mesh API for tensor-parallel layouts
(unused by default: the largest model here is ~11M params, SURVEY.md §2
checklist), so multi-axis meshes can be configured without code changes.

A `space` axis adds SPATIAL partitioning of the MRI volumes — the
sequence-parallel analogue for this workload (SURVEY.md §5 "long-context"
row: the context knob is voxel resolution, not tokens). With
`TPU.mesh_axes: [data, space]` the depth axis of every (…, D, H, W, C)
volume is sharded over `space`; XLA's SPMD partitioner inserts the halo
exchanges for the 3D convolutions and the cross-shard reductions for
BatchNorm/pooling automatically. This is what lets volumes larger than
64^3 (whose activations exceed one chip's HBM at training batch sizes)
train without changing a line of model code. The reference has no
analogue of any of this (torch.distributed imported, never used).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed for multi-host (multi-slice) runs.

    No-op unless the standard coordinator env vars are present
    (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES/JAX_PROCESS_ID], or a
    supported cluster environment auto-detected by jax.distributed). The
    reference never initialized its torch.distributed import
    (/root/reference/main.py:12, SURVEY.md §2.8); here multi-host is one
    env-var away: data-parallel batches shard over all processes' devices
    and XLA routes the psum over ICI within a slice / DCN across slices.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False


def make_mesh(shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    shape: list of ints, -1 means "all remaining devices on this axis".
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [-1]
    shape = list(shape)
    known = int(np.prod([s for s in shape if s > 0])) if any(
        s > 0 for s in shape
    ) else 1
    shape = [n // known if s == -1 else s for s in shape]
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names[: len(shape)])


def has_data_axis(mesh: Mesh) -> bool:
    return "data" in getattr(mesh, "axis_names", ())


def batch_sharding(mesh: Mesh, leading_axis: int = 0) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis (replicated
    when the mesh has no 'data' axis — e.g. a pure ['space'] mesh — so the
    spec never names a nonexistent axis)."""
    spec = [None] * (leading_axis + 1)
    if has_data_axis(mesh):
        spec[leading_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def microbatched_sharding(mesh: Mesh) -> NamedSharding:
    """(accum_steps, batch, ...) layout: scan axis replicated, batch sharded."""
    return NamedSharding(
        mesh, P(None, "data") if has_data_axis(mesh) else P()
    )


def data_axis_size(mesh: Mesh) -> int:
    """Size of the 'data' (batch-parallel) mesh axis, 1 if absent."""
    try:
        return mesh.shape["data"]
    except (KeyError, TypeError):
        return 1


def space_axis_size(mesh: Mesh) -> int:
    """Size of the 'space' (spatial-partitioning) mesh axis, 1 if absent."""
    try:
        return mesh.shape["space"]
    except (KeyError, TypeError):
        return 1


def volume_sharding(mesh: Mesh, batch_dim: int = 0) -> NamedSharding:
    """Sharding for an image batch (…, B, D, H, W, C): batch over 'data',
    volume depth over 'space' (when the mesh has one). batch_dim is the
    index of B; D is batch_dim + 1."""
    spec = [None] * (batch_dim + 2)
    if has_data_axis(mesh):
        spec[batch_dim] = "data"
    if space_axis_size(mesh) > 1:
        spec[batch_dim + 1] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of (B, ...) arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
