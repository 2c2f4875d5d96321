"""Device-resident dataset + batch assembly.

The TPU-first replacement for the reference's DataLoader/worker/collate stack
(/root/reference/utils/utils.py:37-119, main.py:134-135): the whole split
(volumes + clinical features + targets) is transferred to HBM once; a
training step receives device-side gathers by index. The collate functions'
observable behavior (stacked float32 modality dicts, (B, C) event/duration
tensors) is preserved by construction.

Batch layout for gradient accumulation: (accum_steps, micro_batch, ...) with
the micro-batch axis sharded over the mesh 'data' axis. The final, ragged
super-batch of an epoch is wrap-padded from the epoch's shuffled order so
every compiled step sees one static shape; the pad positions are flagged by
`EpochBatcher.pad_mask` and the padded step runs with MASKED semantics
(losses, gradients and BatchNorm statistics over valid samples only,
train/steps.py), reproducing the reference's smaller ragged last batch
(/root/reference/main.py:445-492) exactly on static shapes. Optimizer step
count per epoch matches ceil(N / SUPER_BATCH) (the reference steps on the
last batch of an epoch too, main.py:478-481).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (
    batch_sharding,
    data_axis_size,
    microbatched_sharding,
    space_axis_size,
    volume_sharding,
)


def _space_ok(x, mesh, batch_dims: int) -> bool:
    """True when x is an image batch whose depth axis divides the mesh's
    'space' axis (…, B, D, H, W, C with batch_dims leading batch axes)."""
    sp = space_axis_size(mesh)
    return (
        sp > 1
        and x.ndim >= batch_dims + 4
        and x.shape[batch_dims] % sp == 0
    )


@dataclass
class DeviceDataset:
    """One split's arrays, device-resident."""

    uids: np.ndarray  # host (N,)
    inputs: dict  # {'image': (N,D,H,W,C)?, 'clinical': (N,F)?} jnp arrays
    labels: jnp.ndarray | None = None  # (N, C) binary targets
    events: jnp.ndarray | None = None  # (N, C)
    durations: jnp.ndarray | None = None  # (N, C)
    mesh: object | None = None

    @property
    def num_samples(self) -> int:
        return len(self.uids)

    @property
    def multimodal(self) -> bool:
        return len(self.inputs) > 1

    def model_inputs(self, idx=None):
        """The pytree handed to the model: dict for multimodal, bare array
        otherwise (parity with the reference's input contract,
        /root/reference/main.py:197-203)."""
        sel = (lambda x: x) if idx is None else (lambda x: x[idx])
        if self.multimodal:
            return {k: sel(v) for k, v in self.inputs.items()}
        (only,) = self.inputs.values()
        return sel(only)


def build_device_dataset(
    uids,
    mesh,
    image_volumes=None,
    clinical=None,
    labels=None,
    events=None,
    durations=None,
) -> DeviceDataset:
    """Place a split's arrays on device.

    The resident arrays are sharded on the sample axis only when the split
    size divides the mesh's 'data' axis; volumes additionally shard their
    depth axis over a 'space' mesh axis when one is configured (spatial
    partitioning — parallel/mesh.py), which divides the resident cohort's
    HBM footprint across the space group. Otherwise they stay
    replicated/unsharded (batch gathers re-shard anyway)."""
    n_dev = mesh.devices.size
    n_data = data_axis_size(mesh)

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x, dtype=jnp.float32)
        if n_dev == 1:
            # single chip: keep arrays uncommitted so jit in/out shardings
            # always match (committed/uncommitted mixes force host copies)
            return jax.device_put(x)
        if x.shape[0] % n_data == 0:
            if _space_ok(x, mesh, 1):
                return jax.device_put(x, volume_sharding(mesh, 0))
            return jax.device_put(x, batch_sharding(mesh))
        return jax.device_put(x, jax.NamedSharding(mesh, jax.P()))

    inputs = {}
    if image_volumes is not None:
        inputs["image"] = put(image_volumes)
    if clinical is not None:
        inputs["clinical"] = put(clinical)
    if not inputs:
        raise ValueError("dataset needs at least one modality")
    return DeviceDataset(
        uids=np.asarray(uids),
        inputs=inputs,
        labels=put(labels),
        events=put(events),
        durations=put(durations),
        mesh=mesh,
    )


@dataclass
class EpochBatcher:
    """Shuffled index batches with static shapes.

    yields (accum, micro) index arrays for survival supersteps, or (micro,)
    for classification steps. Wrap-pads the tail from the epoch's own
    shuffled order.
    """

    num_samples: int
    micro_batch: int
    accum_steps: int = 1
    seed: int = 42
    # survival supersteps always consume (accum, micro) two-level batches,
    # even when accum_steps == 1 (lax.scan over one microbatch); set this so
    # the layout matches the step's expectation regardless of accum count.
    two_level: bool = False
    _epoch: int = field(default=0)

    def steps_per_epoch(self) -> int:
        per_step = self.micro_batch * self.accum_steps
        return int(np.ceil(self.num_samples / per_step))

    @property
    def ragged(self) -> bool:
        """True when the last step is wrap-padded (N not a multiple of the
        step size) and must run with masked semantics (train/steps.py)."""
        per_step = self.micro_batch * self.accum_steps
        return self.num_samples % per_step != 0

    def pad_mask(self) -> np.ndarray:
        """0/1 validity per epoch position, shaped like epoch_indices().

        The pad is always appended after the N real positions (epoch_indices
        concatenates the shuffled order, then the wrap-pad), so the mask is
        epoch-independent: 1 for the first N flattened positions, 0 after.
        Only the LAST step can contain zeros.
        """
        per_step = self.micro_batch * self.accum_steps
        total = self.steps_per_epoch() * per_step
        m = (np.arange(total) < self.num_samples).astype(np.float32)
        if self.accum_steps > 1 or self.two_level:
            return m.reshape(-1, self.accum_steps, self.micro_batch)
        return m.reshape(-1, self.micro_batch)

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(self.num_samples)
        per_step = self.micro_batch * self.accum_steps
        total = self.steps_per_epoch() * per_step
        if total > len(order):
            pad = order[: total - len(order)]
            if len(pad) < total - len(order):  # dataset smaller than one step
                reps = int(np.ceil((total - len(order)) / len(order)))
                pad = np.tile(order, reps)[: total - len(order)]
            order = np.concatenate([order, pad])
        if self.accum_steps > 1 or self.two_level:
            return order.reshape(-1, self.accum_steps, self.micro_batch)
        return order.reshape(-1, self.micro_batch)


def gather_superbatch(ds: DeviceDataset, idx: np.ndarray, mesh):
    """Assemble one (A, B, ...) super-batch from device-resident arrays.

    The micro-batch axis is sharded over the 'data' mesh axis when its size
    divides that axis; volume depth additionally shards over a 'space' axis
    when configured. Smaller batches fall back to replication (correct,
    just without the data-parallel split)."""
    flat = idx.reshape(-1)
    shape = idx.shape  # (A, B) or (B,)
    micro = shape[-1]
    batch_dims = idx.ndim
    if mesh.devices.size == 1:
        sh = None
    elif micro % data_axis_size(mesh) == 0:
        sh = microbatched_sharding(mesh) if idx.ndim == 2 else batch_sharding(mesh)
    else:
        sh = jax.NamedSharding(mesh, jax.P())

    def take(x):
        out = x[flat].reshape(shape + x.shape[1:])
        if sh is None:
            return out
        use = sh
        # volumes additionally shard depth over 'space' — independent of
        # whether the mesh has a 'data' axis (volume_sharding emits only
        # the axes the mesh actually has)
        if _space_ok(out, mesh, batch_dims):
            use = volume_sharding(mesh, batch_dims - 1)
        return jax.device_put(out, use)

    inputs = jax.tree.map(take, ds.model_inputs())
    out = {"inputs": inputs}
    for name in ("labels", "events", "durations"):
        v = getattr(ds, name)
        if v is not None:
            out[name] = take(v)
    return out
