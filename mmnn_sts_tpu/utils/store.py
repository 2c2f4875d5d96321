"""Object-store IO layer: transparent s3:// (and gs://) path handling.

Parity with the reference's S3 integration, gated on boto3 availability so
the framework is fully functional offline:
  * `open_remote` — the S3Open context manager
    (/root/reference/utils/utils.py:136-173): yields a local file object for
    a remote URI via tempfile download.
  * `load_uids_any` — local txt or S3 URI uid lists
    (/root/reference/utils/utils.py:175-209).
  * `read_csv_any` — readCSVS3 equivalent (/root/reference/data/s3utils.py:12-23).
  * `upload_artifacts` — best-effort post-training artifact upload with
    swallowed failures (/root/reference/main.py:365-383).
  * `list_prefix` — bucket listing for manifest building
    (getNiftiFilenames / parseS3ImageFolder, s3utils.py:106-226).
"""

from __future__ import annotations

import contextlib
import os
import tempfile

import pandas as pd

from .logging import get_logger

logger = get_logger()

try:  # boto3 ships in AWS images; absent here — every call path is gated.
    import boto3  # type: ignore

    HAVE_BOTO3 = True
except Exception:  # noqa: BLE001
    boto3 = None
    HAVE_BOTO3 = False


def is_remote(path: str) -> bool:
    return isinstance(path, str) and (
        path.startswith("s3://") or path.startswith("gs://")
    )


def _split_s3(uri: str):
    rest = uri.replace("s3://", "")
    parts = rest.split("/")
    return parts[0], "/".join(parts[1:])


@contextlib.contextmanager
def open_remote(uri: str, mode: str = "rb"):
    """Yield a local readable file object for an s3:// URI."""
    if not uri.startswith("s3://"):
        raise ValueError(f"{uri} is not a valid S3 URI")
    if not HAVE_BOTO3:
        raise RuntimeError(
            "boto3 is not installed; cannot read S3 URIs in this environment"
        )
    bucket_name, key = _split_s3(uri)
    s3 = boto3.resource("s3")
    obj = s3.Bucket(bucket_name).Object(key)
    with tempfile.NamedTemporaryFile() as tmp:
        with open(tmp.name, "rb+") as f:
            obj.download_fileobj(f)
            f.seek(0)
            yield f


def fetch_to_local(uri: str, suffix: str = "") -> str:
    """Download a remote object to a temp path; local paths pass through."""
    if not is_remote(uri):
        return uri
    if not HAVE_BOTO3:
        raise RuntimeError("boto3 unavailable for remote fetch")
    bucket_name, key = _split_s3(uri)
    s3 = boto3.resource("s3")
    fd, tmp_path = tempfile.mkstemp(suffix=suffix or os.path.splitext(key)[1])
    os.close(fd)
    s3.Bucket(bucket_name).download_file(key, tmp_path)
    return tmp_path


def read_csv_any(path: str, **kwargs) -> pd.DataFrame:
    if is_remote(path):
        with open_remote(path) as f:
            return pd.read_csv(f, **kwargs)
    return pd.read_csv(path, **kwargs)


def load_uids_any(path: str):
    """uid-per-line txt, local or S3."""
    if is_remote(path):
        with open_remote(path) as f:
            return [int(line.strip()) for line in f.read().decode().splitlines()
                    if line.strip()]
    with open(path) as f:
        return [int(line.strip()) for line in f if line.strip()]


def list_prefix(uri: str):
    """List object keys under an s3:// prefix."""
    if not HAVE_BOTO3:
        raise RuntimeError("boto3 unavailable for bucket listing")
    bucket_name, prefix = _split_s3(uri)
    s3 = boto3.resource("s3")
    return [o.key for o in s3.Bucket(bucket_name).objects.filter(Prefix=prefix)]


def upload_artifacts(bucket: str, output_dir: str, filenames, dest_prefix: str):
    """Best-effort artifact upload; failures are logged and swallowed
    (parity: /root/reference/main.py:380-383).

    filenames: iterable of local names, or (local_name, dest_name) pairs —
    the reference renames some artifacts on upload (e.g. best_surv_model ->
    model, main.py:370).
    """
    if not HAVE_BOTO3:
        logger.info("Could not save to s3 bucket - no connection to S3")
        return False
    try:
        s3 = boto3.resource("s3")
        for name in filenames:
            local_name, dest_name = (
                name if isinstance(name, (tuple, list)) else (name, name)
            )
            local = os.path.join(output_dir, local_name)
            if os.path.exists(local):
                s3.Bucket(bucket).upload_file(
                    local, f"{dest_prefix}/{dest_name}"
                )
        return True
    except Exception as e:  # noqa: BLE001
        logger.info("Could not save to s3 bucket - no connection to S3")
        logger.info(str(e))
        return False


def train_artifact_names(survival: bool, blend: bool):
    """(local, dest) pairs the reference uploads after training
    (/root/reference/main.py:365-379), with .pth weights as .npz here."""
    if survival:
        names = [
            ("train_val_loss.png", "train_val_loss.png"),
            # the reference keys the c-score curve as train_val_f1.png
            # (main.py:369) — contract preserved
            ("train_val_c_score.png", "train_val_f1.png"),
            ("best_surv_model.npz", "model.npz"),
        ]
        if blend:
            names.append(
                ("gblend_weights_history.csv", "gblend_weights_history.csv")
            )
        return names
    return [
        ("train_val_loss.png", "train_val_loss.png"),
        ("train_val_f1.png", "train_val_f1.png"),
        ("model.npz", "model.npz"),
        ("final_model.npz", "final_model.npz"),
        ("val_loss_by_class.png", "val_loss_by_class.png"),
        ("val_loss_by_cm.png", "val_loss_by_cm.png"),
    ]
