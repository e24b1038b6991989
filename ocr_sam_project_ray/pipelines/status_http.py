"""HTTP-served status API — reference parity for the API-Gateway status
endpoints (src/status/app.py:1-85 serves per-job status over HTTP;
src/batch_status/app.py the per-batch variant). The engine's state is
whatever a run WROTE (lineage sidecars + shard parquet), so the server
is a thin stdlib read-only handler over pipelines/status.py — no Ray
session, no shared mutable store; it can run on any node or long after
the run by pointing it at the output directory.

Routes (all GET, JSON responses):
  /status                      → run_status(out_dir)
  /status/shard/<shard_id>     → shard_status(out_dir, shard_id)
  /status/url?url=<url>        → url_status(out_dir, url)
  anything else                → 404 {"error": ...}

Serve with ``python -m ocr_sam_project_ray.pipelines.status_http
--out <dir> [--port 0]`` or embed via ``serve(out_dir, port)`` which
returns the bound (server, port) for tests.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from .status import run_status, shard_status, url_status


def _make_handler(out_dir: str):
    class StatusHandler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: tests/CLI read JSON only
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 - stdlib handler contract
            parsed = urlparse(self.path)
            parts = [p for p in parsed.path.split("/") if p]
            try:
                if parts == ["status"]:
                    if "url" in parse_qs(parsed.query):
                        url = parse_qs(parsed.query)["url"][0]
                        self._send(200, url_status(out_dir, url))
                    else:
                        self._send(200, run_status(out_dir))
                elif len(parts) == 3 and parts[:2] == ["status", "shard"]:
                    self._send(200, shard_status(out_dir, unquote(parts[2])))
                elif parts[:2] == ["status", "url"]:
                    q = parse_qs(parsed.query)
                    if "url" not in q:
                        self._send(400, {"error": "missing url parameter"})
                    else:
                        self._send(200, url_status(out_dir, q["url"][0]))
                else:
                    self._send(404, {"error": f"no route for {parsed.path}"})
            except Exception as exc:  # pragma: no cover - defensive 500
                self._send(500, {"error": str(exc)})

    return StatusHandler


def serve(out_dir: str, port: int = 0, host: str = "127.0.0.1"):
    """Start the server on a daemon thread; returns (server, bound_port).
    port=0 binds an ephemeral port (the test-friendly default)."""
    server = ThreadingHTTPServer((host, port), _make_handler(out_dir))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


def main(argv=None) -> int:  # pragma: no cover - thin CLI shim
    p = argparse.ArgumentParser(prog="status_http")
    p.add_argument("--out", required=True)
    p.add_argument("--port", type=int, default=8265)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)
    server, port = serve(args.out, args.port, args.host)
    print(json.dumps({"serving": f"http://{args.host}:{port}/status"}))
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
