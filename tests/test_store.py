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
