"""Streaming (host-resident) pipeline + segmentation cohort tests."""

import numpy as np
import pytest

from mmnn_sts_tpu.data.loader import EpochBatcher
from mmnn_sts_tpu.data.streaming import HostDataset, prefetched_epoch
from mmnn_sts_tpu.parallel.mesh import make_mesh

from fixtures import make_full_cohort


def _host_ds(rng, n=20, f=5):
    return HostDataset(
        uids=np.arange(n),
        inputs={"clinical": rng.normal(size=(n, f)).astype(np.float32)},
        events=(rng.random((n, 2)) < 0.7).astype(np.float32),
        durations=rng.integers(1, 100, size=(n, 2)).astype(np.float32),
    )


def test_prefetched_epoch_covers_all_batches(rng):
    ds = _host_ds(rng)
    mesh = make_mesh()
    batcher = EpochBatcher(ds.num_samples, micro_batch=4, accum_steps=2, seed=0)
    batches = list(prefetched_epoch(ds, batcher, epoch=0, mesh=mesh))
    assert len(batches) == batcher.steps_per_epoch()
    for b in batches:
        # single-modality datasets yield the bare array (input contract
        # parity with the reference's unimodal loaders)
        assert b["inputs"].shape == (2, 4, 5)
        assert b["events"].shape == (2, 4, 2)


def test_prefetched_values_match_direct_gather(rng):
    ds = _host_ds(rng)
    mesh = make_mesh()
    batcher = EpochBatcher(ds.num_samples, micro_batch=4, accum_steps=1, seed=3)
    batches = list(prefetched_epoch(ds, batcher, epoch=1, mesh=mesh))
    idxs = list(batcher.epoch_indices(1))
    for b, idx in zip(batches, idxs):
        np.testing.assert_array_equal(
            np.asarray(b["inputs"]),
            ds.inputs["clinical"][idx.reshape(-1)].reshape(
                idx.shape + (5,)
            ),
        )


def test_epoch_batcher_wrap_pad():
    b = EpochBatcher(10, micro_batch=4, accum_steps=1, seed=0)
    idx = b.epoch_indices(0)
    assert idx.shape == (3, 4)  # ceil(10/4) steps, wrap-padded
    flat = idx.reshape(-1)
    # every sample appears at least once
    assert set(flat.tolist()) == set(range(10))


def test_segmentation_cohort(tmp_path):
    from mmnn_sts_tpu.data.images import build_segmentation_cohort

    paths, uids = make_full_cohort(str(tmp_path), n=4)
    imgs, masks = build_segmentation_cohort(
        paths["t1"], paths["key"], spatial_size=(10, 10, 10)
    )
    assert imgs.volumes.shape == (4, 10, 10, 10, 1)
    assert masks.volumes.shape == (4, 10, 10, 10, 1)
    assert set(np.unique(masks.volumes)) <= {0.0, 1.0}
    np.testing.assert_array_equal(imgs.uids, masks.uids)


def test_cli_segmentation_raises(tmp_path):
    from mmnn_sts_tpu.cli import main

    with pytest.raises(NotImplementedError, match="segmentation"):
        main(["--segmentation", "--config", "/nonexistent.yaml"])
