"""Model server: the SageMaker hosting contract over an exported artifact.

The reference trains and deploys on SageMaker (/root/reference/README.md:53-55
and the string-boolean CLI mirrors, /root/reference/main.py:910-916) — but
serving there means shipping the whole torch training stack into the
container and re-running main.py. Here the servable is the self-contained
StableHLO artifact from ``--export_path`` (infer/export.py), and this module
serves it with the exact endpoint contract a SageMaker real-time endpoint
container must implement:

  * ``GET /ping``         -> 200 when the model is loaded (health check)
  * ``POST /invocations`` -> predictions

Payloads (request and response symmetric):
  * ``application/json``: ``{"inputs": {...}}`` with nested-list arrays —
    fine for clinical-only models; or ``{"inputs": [[...]]}`` for a bare
    single-modality input.
  * ``application/x-npz``: an .npz body — one array per modality (e.g.
    ``image`` + ``clinical``), or a single ``inputs`` array. This is the
    right format for 64^3 MRI volumes (8 MB binary vs ~50 MB of JSON).

Everything is stdlib (http.server) + numpy + jax: no web framework in the
serving container.

Run:  python -m mmnn_sts_tpu.infer.server model.stablehlo [--port 8080]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .export import ServingModel

JSON = "application/json"
NPZ = "application/x-npz"


def _decode_request(body: bytes, content_type: str):
    """Request bytes -> model inputs (dict of arrays or a bare array)."""
    ctype = (content_type or JSON).split(";")[0].strip().lower()
    if ctype == NPZ or ctype == "application/octet-stream":
        with np.load(io.BytesIO(body)) as data:
            arrays = {k: np.asarray(data[k], np.float32) for k in data.files}
    elif ctype == JSON:
        payload = json.loads(body.decode("utf-8"))
        inputs = payload.get("inputs", payload) if isinstance(payload, dict) \
            else payload
        if isinstance(inputs, dict):
            arrays = {k: np.asarray(v, np.float32) for k, v in inputs.items()}
        else:
            arrays = {"inputs": np.asarray(inputs, np.float32)}
    else:
        raise ValueError(f"unsupported content type {content_type!r}")
    if not arrays:
        raise ValueError("empty request")
    if set(arrays) == {"inputs"}:
        return arrays["inputs"], ctype
    return arrays, ctype


def _encode_response(preds: np.ndarray, ctype: str) -> tuple[bytes, str]:
    if ctype == JSON:
        return (
            json.dumps({"predictions": np.asarray(preds).tolist()}).encode(),
            JSON,
        )
    buf = io.BytesIO()
    np.savez(buf, predictions=np.asarray(preds))
    return buf.getvalue(), NPZ


class ModelServer:
    """Loads one artifact and serves it until shutdown."""

    def __init__(self, artifact_path: str, host: str = "0.0.0.0",
                 port: int = 8080, batch_sizes=(1, 2, 4, 8, 16, 32)):
        self.model = ServingModel(artifact_path, batch_sizes=batch_sizes)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through our logger
                from ..utils.logging import get_logger

                get_logger().info("serve: " + fmt % args)

            def _reply(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/ping":
                    self._reply(200, b"{}", JSON)
                else:
                    self._reply(404, b'{"error": "not found"}', JSON)

            def do_POST(self):
                if self.path != "/invocations":
                    self._reply(404, b'{"error": "not found"}', JSON)
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    inputs, ctype = _decode_request(
                        self.rfile.read(n), self.headers.get("Content-Type")
                    )
                except Exception as e:  # noqa: BLE001 — malformed request
                    self._reply(
                        400, json.dumps({"error": str(e)}).encode(), JSON
                    )
                    return
                try:
                    preds = server.model(inputs)
                    body, out_type = _encode_response(preds, ctype)
                except (ValueError, TypeError) as e:
                    # the model rejecting the inputs (wrong modality set,
                    # shape/rank/dtype mismatch) is still the client's fault
                    self._reply(
                        400, json.dumps({"error": str(e)}).encode(), JSON
                    )
                    return
                except Exception as e:  # noqa: BLE001 — model/server fault
                    # execution faults (artifact incompatible with the local
                    # jax, XLA compile failure, resource exhaustion) are
                    # 5xx, so endpoint monitoring/retries see a server
                    # fault, not an invalid-input signal
                    self._reply(
                        500, json.dumps({"error": str(e)}).encode(), JSON
                    )
                    return
                self._reply(200, body, out_type)

        self.httpd = ThreadingHTTPServer((host, port), Handler)

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mmnn_sts_tpu.infer.server")
    ap.add_argument("artifact", help="StableHLO artifact from --export_path")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    srv = ModelServer(args.artifact, args.host, args.port)
    from ..utils.logging import get_logger

    get_logger().info(f"serving {args.artifact} on :{srv.port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
