"""Object-store layer tests (offline: boto3 gated paths)."""

import pytest

from mmnn_sts_tpu.utils import store


def test_is_remote():
    assert store.is_remote("s3://bucket/key.csv")
    assert store.is_remote("gs://bucket/key.csv")
    assert not store.is_remote("/local/path.csv")
    assert not store.is_remote("relative/path.csv")


def test_local_uid_list(tmp_path):
    p = tmp_path / "uids.txt"
    p.write_text("101\n102\n\n103\n")
    assert store.load_uids_any(str(p)) == [101, 102, 103]


def test_local_csv(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\n")
    df = store.read_csv_any(str(p))
    assert list(df.columns) == ["a", "b"]


def test_remote_without_boto3_raises():
    if store.HAVE_BOTO3:
        pytest.skip("boto3 present")
    with pytest.raises(RuntimeError, match="boto3"):
        with store.open_remote("s3://bucket/key"):
            pass
    with pytest.raises(ValueError, match="not a valid S3 URI"):
        with store.open_remote("/local/file"):
            pass


def test_upload_artifacts_swallows_failures(tmp_path):
    # parity: /root/reference/main.py:380-383 — upload failure is logged,
    # never raised
    ok = store.upload_artifacts("bucket", str(tmp_path), ["nope.png"], "pfx")
    assert ok is False or ok is True  # never raises


def test_fetch_local_passthrough(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hi")
    assert store.fetch_to_local(str(p)) == str(p)

class _FakeBucket:
    def __init__(self, log):
        self.log = log

    def upload_file(self, local, key):
        self.log.append((local, key))


class _FakeS3:
    def __init__(self, log):
        self.log = log

    def Bucket(self, name):  # noqa: N802 — boto3 API shape
        self.log.append(("bucket", name))
        return _FakeBucket(self.log)


class _FakeBoto3:
    def __init__(self):
        self.log = []

    def resource(self, kind):
        assert kind == "s3"
        return _FakeS3(self.log)


def test_train_artifact_upload_key_layout(tmp_path, monkeypatch):
    """Mocked boto3: survival train artifacts land under the reference's
    key layout (/root/reference/main.py:365-373), including the
    c_score->f1 rename and best_surv_model->model rename."""
    fake = _FakeBoto3()
    monkeypatch.setattr(store, "boto3", fake)
    monkeypatch.setattr(store, "HAVE_BOTO3", True)
    for name in ("train_val_loss.png", "train_val_c_score.png",
                 "best_surv_model.npz", "gblend_weights_history.csv"):
        (tmp_path / name).write_text("x")

    ok = store.upload_artifacts(
        "my-bucket", str(tmp_path),
        store.train_artifact_names(survival=True, blend=True), "models/run1",
    )
    assert ok
    keys = [k for op, k in fake.log if op != "bucket"]
    assert keys == [
        "models/run1/train_val_loss.png",
        "models/run1/train_val_f1.png",
        "models/run1/model.npz",
        "models/run1/gblend_weights_history.csv",
    ]
    assert ("bucket", "my-bucket") in fake.log


def test_classification_artifact_names():
    names = dict(store.train_artifact_names(survival=False, blend=False))
    assert names["model.npz"] == "model.npz"
    assert "final_model.npz" in names
    assert "val_loss_by_cm.png" in names


def test_inference_upload_called(tmp_path, monkeypatch):
    """inference_survival uploads survival_model_predictions.csv when a
    bucket is configured (/root/reference/main.py:877-880)."""
    fake = _FakeBoto3()
    monkeypatch.setattr(store, "boto3", fake)
    monkeypatch.setattr(store, "HAVE_BOTO3", True)

    import jax.numpy as jnp
    import numpy as np

    from mmnn_sts_tpu.data.loader import build_device_dataset
    from mmnn_sts_tpu.infer.run import InferenceConfig, inference_survival
    from mmnn_sts_tpu.models.mlp import MLP
    from mmnn_sts_tpu.parallel.mesh import make_mesh
    from mmnn_sts_tpu.train.state import create_train_state
    import optax

    rng = np.random.default_rng(0)
    n, f = 8, 5
    ds = build_device_dataset(
        np.arange(n), make_mesh(),
        clinical=rng.normal(size=(n, f)).astype(np.float32),
        events=np.ones((n, 2), np.float32),
        durations=np.arange(1, n + 1, dtype=np.float32)[:, None].repeat(2, 1),
    )
    state = create_train_state(
        MLP(in_channels=f, out_channels=2, feature_channels=4,
            dropout_prob=0.0),
        optax.sgd(1e-2), jnp.zeros((2, f)), seed=0,
    )
    cfg = InferenceConfig(gradcam=False, output_dir=str(tmp_path),
                          bucket="b", dest_prefix="models/x")
    inference_survival(state, ds, cfg)
    keys = [k for op, k in fake.log if op != "bucket"]
    assert keys == ["models/x/survival_model_predictions.csv"]
