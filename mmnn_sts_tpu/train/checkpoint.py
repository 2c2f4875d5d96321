"""Checkpointing: Orbax full-train-state save/restore + torch .pth import.

Improves on the reference's save-only torch.save(state_dict)
(/root/reference/main.py:300, 315, 577 — no optimizer/epoch state, no
resume; SURVEY.md §5): here the entire TrainState (params, BN stats,
optimizer state, blending state, epoch, RNG key) is checkpointed, so
training resumes exactly.

Also keeps the reference's artifact contract: a "best" checkpoint is
maintained alongside "final" (model.pth / final_model.pth /
best_surv_model.pth roles).

The BHB-10K contrastive-pretrained DenseNet121 backbone import
(/root/reference/utils/utils.py:368-387: 'module.' strip + '.layers'
key-path insertion, strict=False) is reimplemented as a torch->flax
parameter mapping for our channels-last DenseNet.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _abstract(tree):
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)


class CheckpointManager:
    """Thin orbax wrapper with 'best' + 'latest' semantics."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("selection_metric", 0.0),
                best_mode="max",
            ),
        )

    def save(self, step: int, state, metrics: dict | None = None):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(_strip_static(state)),
            metrics=metrics or {},
        )

    def restore(self, state_template, step: int | None = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(_abstract(_strip_static(state_template))),
        )
        return _merge_static(state_template, restored)

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _strip_static(state):
    """TrainState -> pure pytree dict (drop apply_fn/tx)."""
    return {
        "step": state.step,
        "epoch": state.epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "blend": state.blend,
        "rng": jax.random.key_data(state.rng),
    }


def _merge_static(template, restored: dict):
    return template.replace(
        step=restored["step"],
        epoch=restored["epoch"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        blend=restored["blend"],
        rng=jax.random.wrap_key_data(restored["rng"]),
    )


def save_params_npz(path: str, params: Any, batch_stats: Any = None):
    """Flat .npz export of params (+BN stats) — the portable 'model.pth'
    equivalent artifact."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "params/" + "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[key] = np.asarray(leaf)
    if batch_stats:
        for kp, leaf in jax.tree_util.tree_flatten_with_path(batch_stats)[0]:
            key = "batch_stats/" + "/".join(str(getattr(k, "key", k)) for k in kp)
            flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


@jax.jit
def snapshot_params(tree):
    """Copy a params/batch-stats pytree into FRESH device buffers.

    The training superstep donates its input state (steps.py
    donate_argnums), so a best-model save that reads the live buffers
    later — e.g. from a background writer thread — would find them
    deleted. One jitted copy is a single dispatch and returns
    immediately; the copies are independent of any later donation.
    """
    return jax.tree.map(jnp.copy, tree)


class AsyncNpzSaver:
    """Background, coalescing best-model .npz writer.

    A synchronous save_params_npz at improvement time fences the training
    stream: np.savez's device_get pulls the full parameter set through
    the relay (~45 MB at ~60 MB/s on the tunneled dev chip — 0.8-8 s per
    improving epoch, docs/PERF.md "Operational notes"). The loop instead
    snapshots the improving params on device (snapshot_params) and hands
    them here; a daemon thread performs the device->host fetch and file
    write while training continues. Writes coalesce per path: if a newer
    improvement lands while one is being written, intermediate snapshots
    are skipped (only the latest best ever matters). wait() drains the
    queue and re-raises the first writer error, preserving the
    save-failure semantics of the synchronous path.

    Durability: the training loop logs "saved new best metric model" when
    the snapshot is QUEUED. So that a crash in a later epoch cannot lose a
    logged best model (the synchronous save was durable at log time), the
    saver registers an atexit drain — any interpreter exit short of
    SIGKILL flushes pending snapshots to disk; writer errors are also
    logged the moment they happen, not only re-raised at wait().
    """

    def __init__(self):
        import atexit
        import threading

        self._lock = threading.Lock()
        self._pending: dict[str, tuple] = {}
        self._wake = threading.Condition(self._lock)
        self._busy = 0
        self._error: BaseException | None = None
        self._closed = False
        self._thread = threading.Thread(
            target=self._run, name="mmnn-npz-saver", daemon=True
        )
        self._thread.start()
        atexit.register(self._drain_at_exit)

    def submit(self, path: str, params, batch_stats=None):
        with self._lock:
            if self._closed:
                raise RuntimeError("AsyncNpzSaver is closed")
            self._pending[os.path.abspath(path)] = (params, batch_stats)
            self._wake.notify_all()

    def _run(self):
        while True:
            with self._lock:
                while not self._pending and not self._closed:
                    self._wake.wait()
                if not self._pending and self._closed:
                    return
                path, (params, stats) = next(iter(self._pending.items()))
                del self._pending[path]
                self._busy += 1
            try:
                save_params_npz(path, params, stats)
            except BaseException as e:  # noqa: BLE001 — surfaced via wait()
                from ..utils.logging import get_logger

                get_logger().error(f"best-model npz write failed: {e!r}")
                with self._lock:
                    if self._error is None:
                        self._error = e
            finally:
                with self._lock:
                    self._busy -= 1
                    self._wake.notify_all()

    def wait(self, timeout: float | None = None):
        """Block until every submitted snapshot is on disk; re-raise the
        first writer error. With `timeout`, give up after that many
        seconds (work may still be pending)."""
        import time as _time

        deadline = None if timeout is None else _time.monotonic() + timeout
        with self._lock:
            while self._pending or self._busy:
                remaining = None
                if deadline is not None:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        return
                self._wake.wait(remaining)
            if self._error is not None:
                err, self._error = self._error, None
                raise err

    def _drain_at_exit(self):
        # Bounded: the writer's device_get can stall indefinitely on the
        # tunneled relay (docs/PERF.md), and an unbounded atexit wait would
        # turn a crashed run into a process that never exits. 120 s covers
        # the slowest observed full-parameter fetch (~17 s) with margin.
        try:
            with self._lock:
                done = self._closed and not self._pending and not self._busy
            if not done:
                self.wait(timeout=120.0)
        except Exception:  # noqa: BLE001 — already logged by the writer
            pass

    def close(self):
        import atexit

        self.wait()
        with self._lock:
            self._closed = True
            self._wake.notify_all()
        self._thread.join(timeout=60)
        atexit.unregister(self._drain_at_exit)


def load_params_npz(path: str, params_template: Any, batch_stats_template=None):
    """Restore from save_params_npz, validating shapes."""
    data = np.load(path)

    def fill(template, prefix):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new = []
        for kp, leaf in leaves:
            key = prefix + "/".join(str(getattr(k, "key", k)) for k in kp)
            arr = data[key]
            if arr.shape != leaf.shape:
                raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
            new.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, new)

    params = fill(params_template, "params/")
    if batch_stats_template is not None:
        return params, fill(batch_stats_template, "batch_stats/")
    return params


# ---------------------------------------------------------------------------
# Torch .pth (BHB-10K pretrained DenseNet backbone) import
# ---------------------------------------------------------------------------

_DENSE_KEY = re.compile(
    r"features\.denseblock(\d+)\.denselayer(\d+)\.(norm|conv)([12])\.(.+)"
)
_TRANS_KEY = re.compile(r"features\.transition(\d+)\.(norm|conv)\.(.+)")


def import_bhb10k_backbone(pth_path: str, params, batch_stats):
    """Map a torch DenseNet121 3D backbone checkpoint onto our flax DenseNet.

    Source layout (after the reference's 'module.' strip,
    /root/reference/utils/utils.py:375-381): monai-style keys
    features.conv0.weight, features.denseblockB.denselayerL.{norm,conv}{1,2}.*,
    features.transitionT.{norm,conv}.*, features.norm5.*.

    Torch conv kernels are (out, in, *k); flax channels-last expects
    (*k, in, out). BatchNorm scale/bias/mean/var map 1:1. Head layers are
    left untouched (strict=False semantics).

    Returns (params, batch_stats) with backbone leaves replaced.
    """
    import torch

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)

    def _get(tree, path):
        node = tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = value

    def put_conv(scope, torch_w):
        """scope: path segments of the flax Conv module."""
        w = np.asarray(torch_w)
        w = np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))  # OIk... -> k...IO
        path = tuple(scope) + ("kernel",)
        tgt = _get(params, path)
        if tgt is None or tgt.shape != w.shape:
            return 0
        _set(params, path, w.astype(tgt.dtype))
        return 1

    def put_bn(scope, prefix):
        """scope: path segments of the wrapping BatchNorm module (the inner
        flax nn.BatchNorm is auto-named BatchNorm_0)."""
        ok = 0
        for flax_name, torch_name, tree in [
            ("scale", "weight", params),
            ("bias", "bias", params),
            ("mean", "running_mean", batch_stats),
            ("var", "running_var", batch_stats),
        ]:
            src = sd.get(prefix + "." + torch_name)
            path = tuple(scope) + ("BatchNorm_0", flax_name)
            tgt = _get(tree, path)
            if src is None or tgt is None or tuple(src.shape) != tuple(tgt.shape):
                continue
            _set(tree, path, np.asarray(src).astype(tgt.dtype))
            ok = 1
        return ok

    loaded = 0
    for key, value in sd.items():
        if key == "features.conv0.weight":
            loaded += put_conv(("conv0",), value)
        elif key == "features.norm0.weight":
            loaded += put_bn(("norm0",), "features.norm0")
        elif key == "features.norm5.weight":
            loaded += put_bn(("norm5",), "features.norm5")
        else:
            m = _DENSE_KEY.match(key)
            t = _TRANS_KEY.match(key)
            if m:
                b, l, kind, idx, leaf = m.groups()
                scope = f"block{b}_layer{l}"
                if kind == "conv" and leaf == "weight":
                    loaded += put_conv((scope, f"conv{idx}"), value)
                elif kind == "norm" and leaf == "weight":
                    loaded += put_bn(
                        (scope, f"norm{idx}"), key.rsplit(".", 1)[0]
                    )
            elif t:
                tn, kind, leaf = t.groups()
                if kind == "conv" and leaf == "weight":
                    loaded += put_conv((f"transition{tn}", "conv"), value)
                elif kind == "norm" and leaf == "weight":
                    loaded += put_bn(
                        (f"transition{tn}", "norm"), key.rsplit(".", 1)[0]
                    )
    return params, batch_stats, loaded
