"""Model server (infer/server.py): SageMaker /ping + /invocations contract
over an exported StableHLO artifact, JSON and npz payloads."""

import io
import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from mmnn_sts_tpu.infer.export import ServingModel, export_forward
from mmnn_sts_tpu.infer.server import ModelServer
from mmnn_sts_tpu.models import build_model
from mmnn_sts_tpu.config import Config
from mmnn_sts_tpu.train.schedule import make_optimizer
from mmnn_sts_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = Config()
    model = build_model(cfg, images=False, preop=True, postop=False,
                        blend=False, num_tabular_inputs=11)
    x = jnp.zeros((2, 11), jnp.float32)
    state = create_train_state(model, make_optimizer(1e-3, 2, 2), x, seed=0)
    path = str(tmp_path_factory.mktemp("srv") / "mlp.stablehlo")
    export_forward(state, x, blend=False, preprocess=False,
                   platforms=("cpu",), path=path)
    srv = ModelServer(path, host="127.0.0.1", port=0)  # ephemeral port
    srv.start_background()
    yield srv, path
    srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.port}{path}"


def test_ping(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/ping")) as r:
        assert r.status == 200


def test_invocations_json_matches_direct_call(server):
    srv, path = server
    x = np.linspace(-1, 1, 33, dtype=np.float32).reshape(3, 11)
    req = urllib.request.Request(
        _url(srv, "/invocations"),
        data=json.dumps({"inputs": x.tolist()}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        preds = np.asarray(json.loads(r.read())["predictions"])
    want = ServingModel(path)(jnp.asarray(x))
    np.testing.assert_allclose(preds, want, rtol=1e-5, atol=1e-6)


def test_invocations_npz_roundtrip(server):
    srv, path = server
    x = np.linspace(0, 2, 22, dtype=np.float32).reshape(2, 11)
    buf = io.BytesIO()
    np.savez(buf, inputs=x)
    req = urllib.request.Request(
        _url(srv, "/invocations"),
        data=buf.getvalue(),
        headers={"Content-Type": "application/x-npz"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-npz"
        with np.load(io.BytesIO(r.read())) as data:
            preds = np.asarray(data["predictions"])
    want = ServingModel(path)(jnp.asarray(x))
    np.testing.assert_allclose(preds, want, rtol=1e-5, atol=1e-6)


def test_invocations_bad_payload_is_400(server):
    srv, _ = server
    req = urllib.request.Request(
        _url(srv, "/invocations"),
        data=b"not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_invocations_wrong_shape_is_400(server):
    """Inputs the artifact rejects (wrong feature width) are the client's
    fault — 400, not a server fault."""
    srv, _ = server
    x = np.zeros((2, 7), np.float32)  # model expects (B, 11)
    req = urllib.request.Request(
        _url(srv, "/invocations"),
        data=json.dumps({"inputs": x.tolist()}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_model_fault_is_500(server):
    """Execution faults (artifact incompatibility, XLA failure, resource
    exhaustion) must surface as 5xx so endpoint monitoring sees a server
    fault, not an invalid-input signal."""
    srv, _ = server
    orig = srv.model

    class Boom:
        def __call__(self, inputs):
            raise RuntimeError("XLA compile failure")

    srv.model = Boom()
    try:
        req = urllib.request.Request(
            _url(srv, "/invocations"),
            data=json.dumps({"inputs": [[0.0] * 11]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 500
        assert "error" in json.loads(ei.value.read())
    finally:
        srv.model = orig


def test_unknown_path_is_404(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(srv, "/nope"))
    assert ei.value.code == 404
