"""HTTP front for the serving daemon: the network edge of the deployment path.

Completes the serving stack the reference never had (training ends at
Lightning ``.test()``, run.py:179-326):

    compiled program (core/serve.py ``build_inference_fn``)
      -> static-bucket batching (``ServingEngine``)
        -> micro-batching dispatcher (core/daemon.py ``ServingDaemon``)
          -> THIS: a threaded stdlib HTTP server

Design notes, TPU-first:

- The server is ``ThreadingHTTPServer``: one thread per connection, but
  every request funnels into the daemon's single dispatcher thread, so
  concurrency at the network edge becomes BATCH SIZE at the device — the
  only way a TPU converts parallel requests into throughput. Handler
  threads block on a ``Future`` while the GIL is released in the device
  call, so N concurrent clients ride one program launch.
- JSON in / JSON out (stdlib only, zero new dependencies — the vendored
  xlsx writer precedent). At reference feature sizes (<= 3072 floats per
  view) JSON encode/decode is microseconds against the ~ms device call;
  a binary protocol would be premature here.
- The daemon's row-exact slice-back means a client is oblivious to who it
  shared a batch with; errors in a coalesced batch propagate to every
  rider as HTTP 500 (same contract as ``ServingDaemon``).

Protocol:

- ``POST /v1/infer`` body ``{"views": [[row...], ...per view]}`` (each view
  a (rows, dim) nested list; row counts must agree across views). Optional
  ``"fields": ["pred", "probs", ...]`` limits the response to those output
  keys. Response: ``{"rows": N, <field>: nested lists...}``.
- ``GET /v1/stats`` — daemon counters + latency percentiles + bucket ladder.
- ``GET /healthz`` — liveness probe; 200 as long as the dispatcher runs.

CLI: ``python -m ...runners.serve --http-port 8000`` (after the usual
checkpoint restore); see ``start_http_server`` for embedding.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import TimeoutError as _FuturesTimeout  # builtin alias on 3.11+
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

from .daemon import QueueFullError

__all__ = ["start_http_server", "serve_forever"]

_MAX_BODY = 256 * 1024 * 1024  # loud refusal, not an OOM
_RESULT_TIMEOUT_S = 600.0  # a wedged device becomes 504, not a leaked thread


class _Handler(BaseHTTPRequestHandler):
    # set by start_http_server on the class the server instantiates
    daemon = None
    quiet = True

    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # stdlib default spams stderr
        if not self.quiet:
            super().log_message(fmt, *args)

    # ---- helpers --------------------------------------------------------

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, msg: str) -> None:
        # Error paths may not have drained the request body; under
        # HTTP/1.1 keep-alive the leftover bytes would be parsed as the
        # next request line, desynchronizing the connection. Errors are
        # rare — close the connection instead of tracking drain state.
        self.close_connection = True
        self._json(code, {"error": msg})

    # ---- routes ---------------------------------------------------------

    def do_GET(self):
        if self.path == "/healthz":
            alive = self.daemon is not None and self.daemon._thread.is_alive()
            self._json(200 if alive else 503, {"ok": alive})
        elif self.path == "/v1/stats":
            st = self.daemon.stats()
            buckets = getattr(self.daemon.engine, "buckets", None)
            if buckets is not None:
                st["buckets"] = list(buckets)
            self._json(200, st)
        else:
            self._error(404, f"unknown path {self.path!r}")

    def do_POST(self):
        if self.path != "/v1/infer":
            return self._error(404, f"unknown path {self.path!r}")
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                return self._error(400, "missing request body")
            if length > _MAX_BODY:
                return self._error(413, f"body over {_MAX_BODY} bytes")
            req = json.loads(self.rfile.read(length))
            views = req["views"]
            if not isinstance(views, list) or not views:
                raise ValueError("'views' must be a non-empty list of per-view row lists")
            xs = tuple(np.asarray(v, dtype=np.float32) for v in views)
            for i, x in enumerate(xs):
                if x.ndim != 2:
                    raise ValueError(
                        f"view {i} must be a (rows, dim) nested list; got shape {x.shape}"
                    )
            fields = req.get("fields")
            if fields is not None and not isinstance(fields, list):
                raise ValueError("'fields' must be a list of output keys")
        except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
            return self._error(400, f"bad request: {e}")

        # submit and result are handled separately so client-input errors
        # (ValueError from the daemon's validation: row-count mismatch,
        # empty batch) map to 400 and backpressure to 503, while only a
        # genuine engine/daemon failure during execution becomes 500.
        try:
            future = self.daemon.submit(xs)
        except QueueFullError as e:
            return self._error(503, f"overloaded: {e}")
        except ValueError as e:
            return self._error(400, f"bad request: {e}")
        except RuntimeError as e:  # "daemon is closed" — shutting down
            return self._error(503, f"unavailable: {e}")
        try:
            # blocks; GIL released in the device call
            out = future.result(timeout=_RESULT_TIMEOUT_S)
        except (_FuturesTimeout, TimeoutError):
            future.cancel()  # a no-op once RUNNING; bounds queued waits
            return self._error(
                504, f"inference timed out after {_RESULT_TIMEOUT_S:.0f}s"
            )
        except Exception as e:  # noqa: BLE001 — daemon/engine failure
            return self._error(500, f"inference failed: {e}")

        if fields is not None:
            missing = [f for f in fields if f not in out]
            if missing:
                return self._error(
                    400, f"unknown fields {missing}; available: {sorted(out)}"
                )
            out = {k: out[k] for k in fields}
        resp = {"rows": int(xs[0].shape[0])}
        for k, v in out.items():
            resp[k] = np.asarray(v).tolist()
        self._json(200, resp)


def start_http_server(
    daemon, host: str = "127.0.0.1", port: int = 0, quiet: bool = True
):
    """Start the HTTP front on a background thread.

    Returns ``(server, port)``; ``port=0`` binds an ephemeral port (tests).
    Shut down with ``server.shutdown()`` — the daemon itself is NOT closed
    (the caller owns its lifecycle, matching ``ServingDaemon.__exit__``).
    """
    handler = type("Handler", (_Handler,), {"daemon": daemon, "quiet": quiet})
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(
        target=server.serve_forever, name="serving-http", daemon=True
    )
    thread.start()
    return server, int(server.server_address[1])


def serve_forever(
    daemon, host: str = "127.0.0.1", port: int = 8000, quiet: bool = False
) -> None:
    """Blocking variant for the CLI: serve until KeyboardInterrupt."""
    server, bound = start_http_server(daemon, host, port, quiet=quiet)
    print(f"serving on http://{host}:{bound}  (POST /v1/infer, GET /v1/stats, /healthz)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
