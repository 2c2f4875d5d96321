"""Streaming input pipeline for cohorts too large for device memory.

The default path (data/loader.py) keeps the whole cohort in HBM — right for
this dataset (~10^2 patients). When `Config.tpu.device_resident_dataset` is
false (or the cohort exceeds a memory budget), this module provides the
classic host pipeline instead: per-epoch shuffled index batches are gathered
from HOST numpy arrays and copied to device with one-batch lookahead
(double buffering), so the H2D copy of batch i+1 overlaps step i's compute.

This replaces the reference's DataLoader worker-process prefetching
(/root/reference/main.py:134-135, num_workers): decode/preprocess already
happened once (or runs in the C++ threaded loader, data/native.py), so the
only per-step host work is a numpy gather + an async device_put.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .loader import EpochBatcher, _space_ok
from ..parallel.mesh import batch_sharding, data_axis_size, microbatched_sharding, volume_sharding


@dataclass
class HostDataset:
    """One split kept on host; mirrors DeviceDataset's interface."""

    uids: np.ndarray
    inputs: dict  # numpy arrays
    labels: np.ndarray | None = None
    events: np.ndarray | None = None
    durations: np.ndarray | None = None
    mesh: object | None = None  # target mesh for prefetched placement

    @property
    def num_samples(self) -> int:
        return len(self.uids)

    @property
    def multimodal(self) -> bool:
        return len(self.inputs) > 1

    def model_inputs(self, idx=None):
        sel = (lambda x: x) if idx is None else (lambda x: x[idx])
        if self.multimodal:
            return {k: sel(v) for k, v in self.inputs.items()}
        (only,) = self.inputs.values()
        return sel(only)


def _gather(ds: HostDataset, idx: np.ndarray):
    flat = idx.reshape(-1)
    shape = idx.shape

    def take(x):
        return x[flat].reshape(shape + x.shape[1:])

    out = {"inputs": jax.tree.map(take, ds.model_inputs())}
    for name in ("labels", "events", "durations"):
        v = getattr(ds, name)
        if v is not None:
            out[name] = take(v)
    return out


def prefetched_epoch(
    ds: HostDataset,
    batcher: EpochBatcher,
    epoch: int,
    mesh,
):
    """Yield device-resident batches with one-batch lookahead."""
    n_dev = mesh.devices.size
    two_level = batcher.accum_steps > 1 or batcher.two_level
    if n_dev == 1 or batcher.micro_batch % data_axis_size(mesh) != 0:
        sharding = None  # replicate / auto-place (batch not divisible)
    else:
        sharding = microbatched_sharding(mesh) if two_level else batch_sharding(mesh)
    batch_dims = 2 if two_level else 1

    def put(host_batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, host_batch)

        def one(x):
            sh = sharding
            if _space_ok(x, mesh, batch_dims):
                sh = volume_sharding(mesh, batch_dims - 1)
            return jax.device_put(x, sh)

        return jax.tree.map(one, host_batch)

    pending = None
    for idx in batcher.epoch_indices(epoch):
        ready = put(_gather(ds, idx))  # async dispatch
        if pending is not None:
            yield pending
        pending = ready
    if pending is not None:
        yield pending
