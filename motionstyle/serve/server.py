"""HTTP serving frontend over the ServingEngine (stdlib-only).

Endpoints:
  POST /v1/sample   body: JSON request; returns {"motion": [[...]], ...}
  POST /v1/stream   same body; NDJSON response — one {"offset", "motion"}
                    line per completed long-form window (first motion after
                    ONE window's latency), final {"done": true} line
  GET  /healthz     liveness
  GET  /stats       batcher statistics: counters (requests, batches, mean
                    batch size, padded items) + a sliding 2048-observation
                    window of end-to-end latency p50/p90/p99, device batch
                    p50, and current queue depth — the autoscaler/LB poll

The JSON contract is translated to engine Requests by a `decode` callable so
the same server fronts any workload (style transfer, prior sampling, ...);
`cli/serve.py` wires the style-transfer default. ThreadingHTTPServer gives
one thread per connection; all device work still funnels through the
batcher's single worker (the TPU execution model), so concurrency buys
COALESCING, not device-side parallelism.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

import numpy as np

from motionstyle.serve.engine import Request, ServingEngine


def encode_motion(motion, payload: dict) -> dict:
    """Response motion fields: {"motion": nested lists} by default, or —
    when the request set "encoding": "b64" — {"motion_b64": base64 of raw
    little-endian float32 (C order), "shape": [...]}. The binary form cuts
    response encode cost ~20x (JSON float serialization dominates e2e HTTP
    latency at these payload sizes; measured in BASELINE.md)."""
    m = np.ascontiguousarray(np.asarray(motion, np.float32))
    if payload.get("encoding") == "b64":
        import base64

        return {"motion_b64": base64.b64encode(m.tobytes()).decode("ascii"),
                "shape": list(m.shape)}
    return {"motion": m.tolist()}


def default_decode(payload: dict) -> Request:
    """Generic JSON -> Request: 'cond' {name: nested list}, optional
    'init_image', 'inpainting_mask', 'seed'."""
    cond = {k: np.asarray(v, np.float32) for k, v in payload.get("cond", {}).items()}
    get = lambda k: (np.asarray(payload[k], np.float32)
                     if payload.get(k) is not None else None)
    return Request(cond, init_image=get("init_image"),
                   inpainting_mask=get("inpainting_mask"),
                   seed=payload.get("seed", 0))


class MotionServer:
    def __init__(self, engine: ServingEngine, host: str = "127.0.0.1",
                 port: int = 8500, decode: Callable = default_decode,
                 handle: Callable | None = None,
                 stream: Callable | None = None):
        """handle(payload) -> np.ndarray overrides the default
        engine.sample(decode(payload)) — e.g. the long-form handler in
        cli/serve.py that chains windowed requests through the batcher.
        stream(payload) -> iterator of JSON-able dicts enables /v1/stream
        (progressive long-form delivery)."""
        self.engine = engine
        self.decode = decode
        self.handle = handle or (lambda payload: engine.sample(decode(payload)))
        self.stream = stream
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet access log
                pass

            def _json(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._json(200, outer.engine.stats())
                else:
                    self._json(404, {"error": f"unknown path {self.path}"})

            def _read_payload(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def _stream(self, payload: dict):
                """NDJSON: chunk lines as windows complete, then a done line.
                Errors BEFORE the first chunk get a clean JSON 500; after
                headers are sent, an error becomes a terminal NDJSON line
                (the status line is already on the wire)."""
                try:
                    gen = iter(outer.stream(payload))
                    first = next(gen, None)
                except Exception as ex:  # noqa: BLE001 — pre-headers
                    self._json(500, {"error": f"{type(ex).__name__}: {ex}"})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.end_headers()

                def line(obj):
                    self.wfile.write((json.dumps(obj) + "\n").encode())
                    self.wfile.flush()

                try:
                    n_chunks = 0
                    if first is not None:
                        line(first)
                        n_chunks = 1
                    for obj in gen:
                        line(obj)
                        n_chunks += 1
                    line({"done": True, "chunks": n_chunks,
                          "seed": payload.get("seed", 0)})
                except BrokenPipeError:
                    pass  # client went away mid-stream; nothing to salvage
                except Exception as ex:  # noqa: BLE001 — mid-stream
                    try:
                        line({"error": f"{type(ex).__name__}: {ex}"})
                    except Exception:  # noqa: BLE001
                        pass

            def do_POST(self):
                # read the body FIRST, even on error paths: responding with
                # the request still unread in the socket buffer triggers a
                # TCP RST that can discard the response mid-upload
                try:
                    payload = self._read_payload()
                except Exception as ex:  # noqa: BLE001 — malformed JSON/body
                    self._json(400, {"error": f"{type(ex).__name__}: {ex}"})
                    return
                if self.path == "/v1/stream":
                    if outer.stream is None:
                        self._json(404, {"error": "streaming not configured"})
                    else:
                        self._stream(payload)
                    return
                if self.path != "/v1/sample":
                    self._json(404, {"error": f"unknown path {self.path}"})
                    return
                responded = False
                try:
                    motion = outer.handle(payload)
                    body = json.dumps({**encode_motion(motion, payload),
                                       "seed": payload.get("seed", 0)}).encode()
                    responded = True  # body built: past here a failure is a
                    # WRITE failure — never start a second response on the
                    # same half-written/dead socket
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as ex:  # surface as a JSON 500, keep serving
                    if not responded:
                        self._json(500, {"error": f"{type(ex).__name__}: {ex}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None
        self._serving = False

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start_background(self):
        self._serving = True
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self._serving = True
        self.httpd.serve_forever()

    def close(self):
        if self._serving:
            # shutdown() waits on an event only a running serve_forever loop
            # sets — calling it on a never-started server deadlocks forever
            self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        self.engine.close()
