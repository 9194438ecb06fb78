"""HTTP ingest transport — the reference's go-kit endpoint re-expressed
over the Spark-backed catalog (R39, `internal/ingest/transport.go:14-52`,
served by `cmd/ingest.go:47-56`, client at `cmd/ingest.go:66-92`).

Wire contract (byte-compatible with the reference):

    POST /ingest
    {"url": "...", "filter": "ext/mov", "recursionDepth": 2}
      -> 200 {"res": <n ingested>, "err": ""}          on success
      -> 200 {"res": 0, "err": "<message>"}            ingest failed
      -> 400                                            undecodable body

matching go-kit's behavior: a service-level error is ENCODED in the 200
response body (`MakeIngestEndpoint` returns `IngestResponse{res, err},
nil` on svc error), while a decode error aborts the request before the
endpoint runs (`DecodeIngestRequest`). URL parse failure is the one
reference case that surfaces as both a body err and a transport error
(`transport.go:30-33`); here it reports as a body err.

The server is deliberately a thin adapter over an injected
``ingest_fn(url, filter_string, recursion_depth) -> int`` so transport
semantics test without a SparkSession; the CLI's ``serve`` verb injects
the real batch-ingest core (cli.py `_ingest_once`). One Spark driver
serves all requests sequentially — Spark schedules each job's tasks
across the cluster, so the HTTP layer stays a control plane exactly as
in the reference (the data plane never flows through this socket).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib import error as _urlerror
from urllib import request as _urlrequest

__all__ = ["make_server", "post_ingest", "serve_forever"]


def make_server(ingest_fn, host: str = "127.0.0.1", port: int = 8080):
    """Build (don't start) an HTTP server exposing POST /ingest.

    ``port=0`` binds an ephemeral port (tests); the reference hardcodes
    :8080 with a TODO to make it configurable (`cmd/ingest.go:55`) — the
    CLI exposes ``--port`` and keeps 8080 the default.
    """
    # requests are serialized: one Spark driver, one catalog append at a
    # time — concurrent appends to the same parquet dir would race the
    # idempotent anti-join. ThreadingHTTPServer still accepts while busy.
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet: stdout belongs to the CLI
            pass

        def _reply(self, code: int, body: dict | None) -> None:
            payload = b"" if body is None else (json.dumps(body) + "\n").encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path.rstrip("/") != "/ingest":
                self._reply(404, {"res": 0, "err": f"no handler for {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                url = req["url"]
                filt = req.get("filter") or "identity/"
                depth = req.get("recursionDepth")
            except (ValueError, KeyError, TypeError) as e:
                # DecodeIngestRequest failure: abort before the endpoint
                self._reply(400, {"res": 0, "err": f"bad request: {e}"})
                return
            try:
                with lock:
                    res = ingest_fn(url, filt, depth)
            except Exception as e:  # noqa: BLE001 — svc error -> 200 + err body
                self._reply(200, {"res": 0, "err": str(e)})
                return
            self._reply(200, {"res": int(res), "err": ""})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(server) -> None:
    """Run until KeyboardInterrupt; always releases the socket."""
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


def post_ingest(server_url: str, url: str, filter_string: str = "identity/",
                recursion_depth: int | None = None, timeout: float = 600.0) -> dict:
    """The reference's client verb (`cmd/ingest.go:66-92`): POST one
    IngestRequest, return the decoded IngestResponse dict; raises on
    non-200 or an err field, mirroring its three error checks."""
    body = json.dumps(
        {"url": url, "filter": filter_string, "recursionDepth": recursion_depth}
    ).encode()
    req = _urlrequest.Request(
        server_url.rstrip("/") + "/ingest",
        data=body,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with _urlrequest.urlopen(req, timeout=timeout) as resp:  # noqa: S310 — caller-supplied local service URL
            out = json.loads(resp.read())
    except _urlerror.HTTPError as e:
        # urlopen raises for any non-2xx before a status check could run;
        # surface the JSON err body the server wrote instead of a bare
        # "Bad Request"
        try:
            detail = json.loads(e.read()).get("err") or e.reason
        except Exception:  # noqa: BLE001 — body may not be JSON
            detail = e.reason
        raise RuntimeError(f"response not ok: {e.code} ({detail})") from e
    if out.get("err"):
        raise RuntimeError(f"ingest failed: {out['err']}")
    return out
