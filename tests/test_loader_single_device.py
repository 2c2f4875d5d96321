"""Single-device dataset placement (regression: _mesh_of failed on
SingleDeviceSharding when running the CLI on one chip)."""

import jax
import numpy as np

from mmnn_sts_tpu.data.loader import build_device_dataset, gather_superbatch
from mmnn_sts_tpu.parallel.mesh import make_mesh
from mmnn_sts_tpu.train.loop import _mesh_of


def test_single_device_mesh_roundtrip(rng):
    mesh = make_mesh(devices=jax.devices()[:1])
    ds = build_device_dataset(
        np.arange(10),
        mesh,
        clinical=rng.normal(size=(10, 4)).astype(np.float32),
        events=np.ones((10, 2), np.float32),
        durations=np.ones((10, 2), np.float32),
    )
    assert _mesh_of(ds) is mesh
    batch = gather_superbatch(ds, np.arange(8).reshape(2, 4), mesh)
    assert batch["inputs"].shape == (2, 4, 4)
    assert batch["events"].shape == (2, 4, 2)
