"""Minimal HTTP shell over :class:`GraphouseService`.

Speaks the wire contract the graphite-web plugin consumes
(/root/reference/src/main/pySources/graphouse.py):

- ``POST /search``          form ``query=<glob>``          -> text/plain,
  newline-separated names, dirs keep the trailing dot
  (graphouse.py:202-225; MetricSearchServlet.java:141-154)
- ``POST /metricData``      form ``metrics=<csv> startSecond= endSecond=``
  -> JSON ``{name: {start, end, step, points}}`` (graphouse.py:71-131)
- ``POST /ban|/approve|/hide``  form ``metric=<path or glob>``
  (MetricSearchServlet.java:115-139)
- ``GET  /metricTreeState`` -> 200 once the tree is loaded, 503 before
  (MetricSearchServlet.java:34-37 returns 503 until bootstrap).

Thin by design: every request delegates to the service; no state of
its own. Uses only the standard library — run it next to the driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

from graphouse_spark.api.service import GraphouseService


def make_handler(service: GraphouseService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, body: str, content_type: str = "text/plain") -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", content_type + "; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _form(self) -> dict:
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length).decode("utf-8") if length else ""
            return {k: v[0] for k, v in parse_qs(raw, keep_blank_values=True).items()}

        def do_GET(self):
            if self.path == "/metricTreeState":
                if service._loaded:
                    self._send(200, "LOADED")
                else:
                    self._send(503, "LOADING")
            else:
                self._send(404, "not found")

        def do_POST(self):
            form = self._form()
            try:
                if self.path == "/search":
                    self._send(200, service.search(form.get("query", "")))
                elif self.path == "/metricData":
                    metrics = [m for m in form.get("metrics", "").split(",") if m]
                    start = int(form["startSecond"])
                    end = int(form["endSecond"])
                    self._send(200, service.metric_data_json(metrics, start, end), "application/json")
                elif self.path in ("/ban", "/approve", "/hide"):
                    status = {"/ban": "BAN", "/approve": "APPROVED", "/hide": "HIDDEN"}[self.path]
                    touched = service.modify(form.get("metric", ""), status)
                    self._send(200, "\n".join(touched))
                else:
                    self._send(404, "not found")
            except RuntimeError as e:  # tree not loaded
                self._send(503, str(e))
            except (KeyError, ValueError) as e:
                self._send(400, f"bad request: {e}")

    return Handler


def start_http_server(service: GraphouseService, host: str = "127.0.0.1", port: int = 0):
    """Start the shell on a daemon thread; returns the live server
    (``server.server_address[1]`` is the bound port; ``.shutdown()`` stops it)."""
    server = ThreadingHTTPServer((host, port), make_handler(service))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
