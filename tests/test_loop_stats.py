"""Epoch-statistic correctness: wrap-pad de-biasing + chunked evaluation.

The reference computes epoch statistics over a ragged last batch
(/root/reference/main.py:495-498); this framework wrap-pads the tail for
static XLA shapes, so the loop must exclude the padded duplicates from the
train C-index / F1 / blend-update statistics (train/loop._dedup_epoch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmnn_sts_tpu.data.loader import EpochBatcher, build_device_dataset
from mmnn_sts_tpu.data.streaming import HostDataset
from mmnn_sts_tpu.models.mlp import MLP
from mmnn_sts_tpu.ops.metrics import c_indices_per_class
from mmnn_sts_tpu.parallel.mesh import make_mesh
from mmnn_sts_tpu.train.evaluate import (
    classification_eval_split,
    survival_eval_split,
)
from mmnn_sts_tpu.train.loop import LoopConfig, train_survival
from mmnn_sts_tpu.train.state import create_train_state


def _clinical_split(rng, n, f=5, mesh=None):
    mesh = mesh or make_mesh()
    return build_device_dataset(
        uids=np.arange(n),
        mesh=mesh,
        clinical=rng.normal(size=(n, f)).astype(np.float32),
        events=(rng.random((n, 2)) < 0.8).astype(np.float32),
        durations=rng.integers(1, 100, size=(n, 2)).astype(np.float32),
    )


def test_epoch_stream_head_is_unique_permutation():
    """First N positions of the padded epoch stream are exactly the unique
    samples (the invariant _dedup_epoch relies on)."""
    for n, b, a in [(10, 4, 1), (13, 4, 2), (7, 8, 1), (48, 8, 8)]:
        batcher = EpochBatcher(n, micro_batch=b, accum_steps=a, seed=1)
        flat = batcher.epoch_indices(3).reshape(-1)
        assert sorted(flat[:n].tolist()) == list(range(n))


@pytest.mark.parametrize("fused", [False, True])
def test_train_c_index_excludes_wrap_padding(rng, tmp_path, fused):
    """N % batch != 0: the recorded train C-index equals the statistic over
    the unpadded epoch stream, computed independently — on both the
    per-superstep path and the fused whole-epoch program."""
    n, b, f = 10, 4, 5
    x = rng.normal(size=(n, f)).astype(np.float32)
    e = (rng.random((n, 2)) < 0.8).astype(np.float32)
    d = rng.integers(1, 100, size=(n, 2)).astype(np.float32)

    mesh = make_mesh()
    train_ds = build_device_dataset(np.arange(n), mesh, clinical=x,
                                    events=e, durations=d)
    val_ds = build_device_dataset(np.arange(4), mesh, clinical=x[:4],
                                  events=e[:4], durations=d[:4])

    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    # lr=0: parameters are frozen, so every forward of the same microbatch
    # yields identical predictions and the expected statistic is replayable.
    state = create_train_state(model, optax.sgd(0.0), jnp.zeros((b, f)), seed=0)

    cfg = LoopConfig(epochs=1, batch_size=b, super_batch=b, blend=False,
                     seed=3, output_dir=str(tmp_path), augment=False,
                     fused_epoch=fused)
    # host snapshot before training: the superstep donates the state buffers
    params0 = jax.tree.map(np.asarray, state.params)
    bstats0 = jax.tree.map(np.asarray, state.batch_stats)
    result = train_survival(state, train_ds, val_ds, cfg)

    # Independent replay: same deterministic batch order, same (frozen)
    # params, train-mode BN (per-batch statistics) — with the loop's masked
    # semantics on the wrap-padded final microbatch (train/steps.py passes
    # pad_mask there, so its valid samples normalize over valid-only stats).
    batcher = EpochBatcher(n, micro_batch=b, accum_steps=1, seed=cfg.seed,
                           two_level=True)
    idx = batcher.epoch_indices(0)
    flat = idx.reshape(-1)
    pad_rows = batcher.pad_mask().reshape(-1, b)
    variables = {"params": params0, "batch_stats": bstats0}
    preds = []
    for row, mrow in zip(idx.reshape(-1, b), pad_rows):
        out, _ = state.apply_fn(
            variables, jnp.asarray(x[row]), train=True,
            rngs={"dropout": jax.random.key(0)}, mutable=["batch_stats"],
            sample_mask=None if mrow.min() > 0 else jnp.asarray(mrow),
        )
        preds.append(np.asarray(out))
    stream_preds = np.concatenate(preds, axis=0)

    expected = np.mean(c_indices_per_class(
        stream_preds[:n], e[flat[:n]], d[flat[:n]]
    ))
    padded = np.mean(c_indices_per_class(stream_preds, e[flat], d[flat]))

    assert result.history["train_c"][0] == pytest.approx(expected, abs=1e-12)
    # the padded statistic is genuinely different on this data — the bias
    # the de-dup removes is real, not a no-op
    assert abs(padded - expected) > 1e-9


def test_survival_eval_split_chunked_matches_whole(rng):
    n, f = 10, 5
    mesh = make_mesh()
    ds = _clinical_split(rng, n, f, mesh)
    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    state = create_train_state(model, optax.sgd(1e-2), jnp.zeros((2, f)),
                               seed=0)

    whole = survival_eval_split(state, ds, blend=False, ties="breslow")
    chunked = survival_eval_split(state, ds, blend=False, ties="breslow",
                                  chunk=4)
    # eval-mode BN is batch-independent: predictions are bitwise identical
    np.testing.assert_allclose(whole["preds"], chunked["preds"],
                               rtol=1e-6, atol=1e-6)
    assert np.isfinite(chunked["loss"])
    # chunked loss = sum over chunk Cox losses (the reference's
    # sum-over-batches contract, main.py:549-556); it need not equal the
    # single-program Cox loss because the partial likelihood couples samples.


def test_classification_eval_split_chunked_exact(rng):
    n, f = 11, 5
    mesh = make_mesh()
    labels = (rng.random((n, 2)) < 0.5).astype(np.float32)
    ds = build_device_dataset(
        np.arange(n), mesh,
        clinical=rng.normal(size=(n, f)).astype(np.float32),
        labels=labels,
    )
    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    state = create_train_state(model, optax.sgd(1e-2), jnp.zeros((2, f)),
                               seed=0)
    pw = jnp.ones((2,))

    whole = classification_eval_split(state, ds, pw, blend=False)
    chunked = classification_eval_split(state, ds, pw, blend=False, chunk=4)
    np.testing.assert_allclose(whole["preds"], chunked["preds"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(whole["elementwise"], chunked["elementwise"],
                               rtol=1e-6, atol=1e-6)
    # BCE decomposes over samples: summed losses agree exactly
    assert chunked["loss"] == pytest.approx(whole["loss"], rel=1e-5)


def test_streaming_validation_chunks_larger_split(rng, tmp_path):
    """Host-resident val split larger than the chunk size: training runs and
    validates without a whole-split program (VERDICT item 8)."""
    n_train, n_val, f = 8, 20, 5
    mesh = make_mesh()
    train_ds = _clinical_split(rng, n_train, f, mesh)
    val_ds = HostDataset(
        uids=np.arange(n_val),
        inputs={"clinical": rng.normal(size=(n_val, f)).astype(np.float32)},
        events=(rng.random((n_val, 2)) < 0.8).astype(np.float32),
        durations=rng.integers(1, 100, size=(n_val, 2)).astype(np.float32),
        mesh=mesh,
    )
    model = MLP(in_channels=f, out_channels=2, feature_channels=4,
                dropout_prob=0.0)
    state = create_train_state(model, optax.sgd(1e-2), jnp.zeros((4, f)),
                               seed=0)
    cfg = LoopConfig(epochs=2, batch_size=4, super_batch=4, seed=0,
                     output_dir=str(tmp_path), augment=False, eval_chunk=8)
    result = train_survival(state, train_ds, val_ds, cfg)
    assert len(result.history["val_loss"]) == 2
    assert all(np.isfinite(v) for v in result.history["val_loss"])


def test_blend_update_recomputes_stale_val_preds(rng, tmp_path, monkeypatch):
    """val_interval=2, blend_update_interval=3: the epoch-3 blend update must
    NOT reuse epoch-2's validation predictions (stale parameters) — it
    recomputes them against the current state (VERDICT r2 weak #3)."""
    from mmnn_sts_tpu.models.multimodal import MultiModalModel
    from mmnn_sts_tpu.models.tinycnn import TinyCNN
    from mmnn_sts_tpu.train import loop as loop_mod

    n, f, s = 8, 5, 8
    x_img = rng.normal(size=(n, s, s, s, 2)).astype(np.float32)
    x_cli = rng.normal(size=(n, f)).astype(np.float32)
    e = np.ones((n, 2), np.float32)
    d = rng.integers(1, 100, size=(n, 2)).astype(np.float32)

    mesh = make_mesh()
    train_ds = build_device_dataset(np.arange(n), mesh, image_volumes=x_img,
                                    clinical=x_cli, events=e, durations=d)
    val_ds = build_device_dataset(np.arange(4), mesh,
                                  image_volumes=x_img[:4], clinical=x_cli[:4],
                                  events=e[:4], durations=d[:4])

    image_model = TinyCNN(in_channels=2, out_channels=2, feature_channels=4,
                          dropout_prob=0.0)
    model = MultiModalModel(image_model=image_model, num_clinical_inputs=f,
                            num_classes=2, num_features=4, blend=True)
    sample = {"image": jnp.zeros((2, s, s, s, 2)), "clinical": jnp.zeros((2, f))}
    state = create_train_state(model, optax.sgd(1e-3), sample, seed=0)

    eval_epochs = []
    real_eval = loop_mod.survival_eval_split

    def spy_eval(state, *args, **kwargs):
        eval_epochs.append(int(state.epoch))
        return real_eval(state, *args, **kwargs)

    monkeypatch.setattr(loop_mod, "survival_eval_split", spy_eval)

    cfg = LoopConfig(epochs=3, batch_size=4, super_batch=4, blend=True,
                     blend_update_interval=3, val_interval=2, seed=3,
                     output_dir=str(tmp_path), augment=False)
    result = train_survival(state, train_ds, val_ds, cfg)

    # validation ran at epoch 2 (state.epoch==1); the blend update at epoch 3
    # (state.epoch==2) must have triggered a FRESH eval with the current state
    assert eval_epochs == [1, 2]
    # and the update actually happened (blend state now carries history)
    assert bool(result.state.blend.has_history)
