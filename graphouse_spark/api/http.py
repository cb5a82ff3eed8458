"""Minimal HTTP shell over :class:`GraphouseService`.

Speaks the wire contract the graphite-web plugin consumes
(/root/reference/src/main/pySources/graphouse.py):

- ``POST /search``          form ``query=<glob>``          -> text/plain,
  newline-separated names, dirs keep the trailing dot
  (graphouse.py:202-225; MetricSearchServlet.java:141-154)
- ``POST /metricData``      the plugin's exact wire shape
  (graphouse.py:78-88): ``metrics=<csv>`` in the form BODY,
  ``start``/``end``/``reqKey`` as QUERY parameters -> JSON
  ``{name: {start, end, step, points}}``; oversized metric lists get
  413 (MetricDataServiceServlet.java:58-64). Legacy
  ``startSecond``/``endSecond`` form fields stay accepted.
- ``GET|POST /ban|/approve|/hide``  param ``name=<path or glob>``
  (``metric`` kept as alias; MetricSearchServlet.java:115-139 — the
  reference routes these through doGet)
- ``GET|POST /multiBan|/multiApprove|/multiHide`` param ``query=<glob>``
  -> the reference's report shape: header line, blank line, touched
  names, blank line, ``Total count: N`` (MetricSearchServlet.java:126-139)
- ``GET /search?query=`` / ``GET /searchCachedMetrics?query=`` —
  cached search ignores visibility (MetricSearchServlet.java:156-176,
  MetricTree.java:131-179)
- ``GET  /metricTreeState`` -> 200 once the tree is loaded, 503 before
  (MetricSearchServlet.java:34-37 returns 503 until bootstrap).

Thin by design: every request delegates to the service; no state of
its own. Uses only the standard library — run it next to the driver.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from graphouse_spark.api.service import GraphouseService, QueryLimitExceeded
from graphouse_spark.queryparams import parse_render_time

MULTI_STATUS = {"/multiBan": "BAN", "/multiApprove": "APPROVED", "/multiHide": "HIDDEN"}


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

        def _send_bytes(self, code: int, data: bytes,
                        content_type: str = "application/pickle") -> None:
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _serve_render(self, params: dict, targets: list[str]) -> None:
            """Shared /render dispatch (GET query string or POSTed form
            — grafana's graphite datasource POSTs)."""
            if not targets:
                self._send(400, "target parameter required")
                return
            fmt = params.get("format", "json")
            if fmt not in ("json", "csv", "raw", "pickle"):
                self._send(400, f"unsupported format {fmt!r} "
                                "(json, csv, raw or pickle)")
                return
            now = int(params.get("now", time.time()))
            start = parse_render_time(params["from"], now)
            end = parse_render_time(params.get("until", "now"), now)
            mdp = int(params["maxDataPoints"]) if "maxDataPoints" in params else None
            req_key = params.get("reqKey") or None
            if fmt == "pickle":
                # graphite-web CLUSTER_SERVERS member protocol
                self._send_bytes(200, service.render_pickle(
                    targets, start, end, req_key=req_key,
                    max_data_points=mdp))
                return
            series = service.render(targets, start, end, req_key=req_key,
                                    max_data_points=mdp)
            if fmt == "csv":
                # graphite csv: target,datetime,value per point
                lines = []
                for s in series:
                    for v, ts in s["datapoints"]:
                        dt = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(ts))
                        lines.append(
                            f"{s['target']},{dt},{'' if v is None else v}")
                self._send(200, "\n".join(lines) + "\n", "text/csv")
            elif fmt == "raw":
                # graphite raw: name,start,end,step|v1,v2,... — the
                # scripting format graphite-web's rawData renderer emits
                lines = []
                base_step = None
                for s in series:
                    pts = s["datapoints"]
                    ts0 = pts[0][1] if pts else start
                    if len(pts) > 1:
                        step = pts[1][1] - pts[0][1]
                    else:
                        # too few points to infer: ask the retention
                        # provider (metadata-only, resolved once)
                        if base_step is None:
                            base_step = service.render_base_step(
                                targets, start, end)
                        step = base_step
                    lines.append(
                        f"{s['target']},{ts0},{ts0 + step * len(pts)},{step}|"
                        + ",".join("None" if v is None else str(v)
                                   for v, _ in pts))
                self._send(200, "\n".join(lines) + "\n", "text/plain")
            else:
                self._send(200, json.dumps(series), "application/json")

        def _serve_query(self, q: str, fmt: str) -> None:
            """Shared /query dispatch (GET param or CH-style POST body)."""
            if not q:
                self._send(400, "query parameter required")
                return
            try:
                body = service.sql(q, fmt)
            except ValueError as e:  # readonly/statement guard
                self._send(400, str(e))
                return
            except RuntimeError:
                raise  # tree-not-loaded -> outer 503
            except Exception as e:  # AnalysisException et al.
                # CH returns the parser/analyzer error as text
                self._send(400, f"{type(e).__name__}: {e}")
                return
            ctype = {"JSON": "application/json",
                     "JSONEACHROW": "application/x-ndjson",
                     "CSV": "text/csv",
                     "CSVWITHNAMES": "text/csv"}.get(
                fmt.upper(), "text/tab-separated-values")
            self._send(200, body, ctype)

        def _form(self) -> dict:
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length).decode("utf-8") if length else ""
            return {k: v[0] for k, v in parse_qs(raw, keep_blank_values=True).items()}

        def _multi_modify(self, route: str, params: dict) -> None:
            """The reference's multiModify report: header, names, total
            (MetricSearchServlet.java:126-139)."""
            query = params.get("query", "")
            if not query:
                self._send(400, "query parameter required")
                return
            status = MULTI_STATUS[route]
            touched = service.modify(query, status)
            body = "Status changed to %s:\n\n%s\n\nTotal count: %d\n" % (
                status, "\n".join(touched), len(touched)
            )
            self._send(200, body)

        def do_GET(self):
            parsed = urlparse(self.path)
            route = parsed.path
            params = {k: v[0] for k, v in parse_qs(parsed.query, keep_blank_values=True).items()}
            try:
                if route == "/ping":
                    # MonitoringServlet: 503 while MetricTreeInit is
                    # critical (pre-bootstrap), 200 after — the route
                    # every load balancer health probe polls
                    self._send(*service.ping.http_response())
                elif route == "/monitoring":
                    self._send(*service.monitoring.http_response())
                elif route == "/metricTreeState":
                    self._send(200, "LOADED") if service._loaded else self._send(503, "LOADING")
                elif route == "/checkOnRecordCache":
                    # write-path cache diagnostic
                    # (OnRecordMetricCacheServlet.java)
                    name = params.get("metricName", "")
                    if not name:
                        self._send(400, "Usage:\nGET /checkOnRecordCache"
                                        "?metricName=<metric_name>\n")
                        return
                    self._send(200, service.check_on_record_cache(name))
                elif route == "/printBannedCacheState":
                    self._send(200, service.print_banned_cache_state())
                elif route == "/search":
                    self._send(200, service.search(params.get("query", "")))
                elif route == "/searchCachedMetrics":
                    self._send(200, service.search_cached(params.get("query", "")))
                elif route == "/metrics/find":
                    # graphite-web finder API; format=treejson (default)
                    q = params.get("query", "")
                    if not q:
                        self._send(400, "query parameter required")
                        return
                    if params.get("format") == "pickle":
                        # remote-finder protocol (graphite-web federation)
                        self._send_bytes(200, service.find_pickle(q))
                        return
                    self._send(200, service.find_nodes_json(q), "application/json")
                elif route == "/render":
                    # graphite-web render API: target repeats like
                    # graphite's (multiple target params); from/until
                    # accept epoch, now, and -Nunit relative
                    targets = parse_qs(parsed.query, keep_blank_values=True).get("target", [])
                    self._serve_render(params, targets)
                elif route == "/explain":
                    target = params.get("target", "")
                    if not target:
                        self._send(400, "target parameter required")
                        return
                    now = int(params.get("now", time.time()))
                    start = parse_render_time(params["from"], now)
                    end = parse_render_time(params.get("until", "now"), now)
                    if params.get("estimate") in ("1", "true"):
                        # CH EXPLAIN ESTIMATE: scan cost from the skip
                        # indexes, nothing executed
                        self._send(
                            200,
                            json.dumps(service.estimate_target(target, start, end)),
                            "application/json")
                        return
                    self._send(200, service.explain_target(target, start, end))
                elif route == "/query":
                    # CH HTTP interface analog: ?query=SELECT ...
                    # (&default_format=JSON for FORMAT JSON shape)
                    self._serve_query(params.get("query", ""),
                                      params.get("default_format", "TSV"))
                elif route == "/query_log":
                    # system.query_log analog (querylog.py): newest-last
                    limit = int(params["limit"]) if "limit" in params else None
                    self._send(200, service.query_log.entries_json(limit),
                               "application/json")
                elif route == "/events/get_data":
                    # graphite events API: from/until accept the same
                    # time specs as /render; tags are space-separated
                    now = int(params.get("now", time.time()))
                    start = (parse_render_time(params["from"], now)
                             if "from" in params else None)
                    end = (parse_render_time(params["until"], now)
                           if "until" in params else None)
                    etags = params.get("tags", "").split() or None
                    self._send(200,
                               service.events_get_data(start, end, etags),
                               "application/json")
                elif route.startswith("/tags/"):
                    # graphite-web tag API (ENGINE EXTENSION, tags.py):
                    # grafana's tag browser calls these three. expr
                    # repeats like target does
                    exprs = parse_qs(parsed.query,
                                     keep_blank_values=True).get("expr", [])
                    limit = int(params.get("limit", "100"))
                    if route == "/tags/findSeries":
                        # graphite's findSeries takes no limit param:
                        # serve all matches (10k server bound) unless
                        # the client explicitly sent one
                        explicit = (int(params["limit"])
                                    if "limit" in params else None)
                        self._send(200,
                                   service.tag_find_series(exprs, explicit),
                                   "application/json")
                    elif route == "/tags/autoComplete/tags":
                        self._send(
                            200,
                            service.tag_autocomplete_tags(
                                exprs, params.get("tagPrefix", ""), limit),
                            "application/json")
                    elif route == "/tags/autoComplete/values":
                        self._send(
                            200,
                            service.tag_autocomplete_values(
                                params.get("tag", ""), exprs,
                                params.get("valuePrefix", ""), limit),
                            "application/json")
                    elif route == "/tags/delSeries":
                        # destructive: POST only, like graphite-web —
                        # GET prefetchers/crawlers must not delete data
                        self._send(405, "delSeries is POST-only")
                    else:
                        self._send(404, "not found")
                elif route in MULTI_STATUS:
                    self._multi_modify(route, params)
                elif route in ("/ban", "/approve", "/hide"):
                    # the reference serves these over GET too
                    # (MetricSearchServlet.doGet; getParameter("name"))
                    status = {"/ban": "BAN", "/approve": "APPROVED", "/hide": "HIDDEN"}[route]
                    target = params.get("name", params.get("metric", ""))
                    if not target:
                        self._send(400, "name parameter required")
                        return
                    touched = service.modify(target, status)
                    self._send(200, "\n".join(touched))
                else:
                    self._send(404, "not found")
            except RuntimeError as e:  # tree not loaded
                self._send(503, str(e))
            except QueryLimitExceeded as e:  # expanded past the cap
                self._send(413, str(e))
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, f"bad request: {e}")
            except Exception as e:  # noqa: BLE001 — keep the daemon
                # alive on evaluator/JVM errors (bad user regex reaches
                # rlike as Py4JJavaError): graphite answers 500, the
                # connection is not dropped
                self._send(500, f"{type(e).__name__}: {e}")

        def do_POST(self):
            parsed = urlparse(self.path)
            route = parsed.path
            qparams = {k: v[0] for k, v in parse_qs(parsed.query, keep_blank_values=True).items()}
            if route == "/query":
                # CH clients POST the raw SQL as the body (no form
                # encoding); ?query= still wins when present
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length).decode("utf-8") if length else ""
                try:
                    self._serve_query(qparams.get("query") or raw,
                                      qparams.get("default_format", "TSV"))
                except RuntimeError as e:
                    self._send(503, str(e))
                return
            if route in ("/events", "/events/"):
                # graphite events API (ENGINE EXTENSION, events.py):
                # JSON body, one object or a list
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length).decode("utf-8") if length else ""
                try:
                    self._send(200, service.add_events(json.loads(raw)),
                               "application/json")
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, f"bad request: {e}")
                except Exception as e:  # noqa: BLE001
                    self._send(500, f"{type(e).__name__}: {e}")
                return
            if route == "/render":
                # grafana's graphite datasource POSTs the render form
                # (repeated target fields); query-string params still win
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length).decode("utf-8") if length else ""
                body = parse_qs(raw, keep_blank_values=True)
                merged = {k: v[0] for k, v in body.items()}
                merged.update(qparams)
                targets = (parse_qs(parsed.query, keep_blank_values=True)
                           .get("target", []) or body.get("target", []))
                try:
                    self._serve_render(merged, targets)
                except RuntimeError as e:
                    self._send(503, str(e))
                except QueryLimitExceeded as e:
                    self._send(413, str(e))
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, f"bad request: {e}")
                except Exception as e:  # noqa: BLE001 — same 500
                    # posture as do_GET
                    self._send(500, f"{type(e).__name__}: {e}")
                return
            if route == "/tags/delSeries":
                # graphite-web's delSeries is a POST with repeated
                # form-encoded path fields; query-string paths also ok
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length).decode("utf-8") if length else ""
                body = parse_qs(raw, keep_blank_values=True)
                paths = (parse_qs(parsed.query, keep_blank_values=True)
                         .get("path", []) or body.get("path", []))
                try:
                    self._send(200, service.tag_del_series(paths),
                               "application/json")
                except (KeyError, ValueError, TypeError) as e:
                    self._send(400, f"bad request: {e}")
                except Exception as e:  # noqa: BLE001
                    self._send(500, f"{type(e).__name__}: {e}")
                return
            form = self._form()
            try:
                if route == "/search":
                    self._send(200, service.search(form.get("query", qparams.get("query", ""))))
                elif route == "/searchCachedMetrics":
                    self._send(200, service.search_cached(form.get("query", qparams.get("query", ""))))
                elif route == "/metricData":
                    metrics = [m for m in form.get("metrics", "").split(",") if m]
                    if not metrics:
                        self._send(400, "metrics parameter required")
                        return
                    if 0 < service.max_metrics_per_query < len(metrics):
                        self._send(413, "Too many metrics in query. Provided %d, max %d"
                                   % (len(metrics), service.max_metrics_per_query))
                        return
                    # plugin wire shape: start/end ride the query string;
                    # legacy startSecond/endSecond form fields also accepted
                    start = int(qparams.get("start", form.get("start", form.get("startSecond"))))
                    end = int(qparams.get("end", form.get("end", form.get("endSecond"))))
                    # reqKey rides the query string (graphouse.py:78-88);
                    # it scopes this request's Spark jobs for cancellation
                    req_key = qparams.get("reqKey", form.get("reqKey")) or None
                    self._send(200, service.metric_data_json(
                        metrics, start, end, req_key=req_key), "application/json")
                elif route in ("/ban", "/approve", "/hide"):
                    status = {"/ban": "BAN", "/approve": "APPROVED", "/hide": "HIDDEN"}[route]
                    # the servlet reads getParameter("name")
                    # (MetricSearchServlet.java:116); "metric" kept as alias
                    target = form.get("name", qparams.get("name", form.get("metric", "")))
                    if not target:
                        self._send(400, "name parameter required")
                        return
                    touched = service.modify(target, status)
                    self._send(200, "\n".join(touched))
                elif route in MULTI_STATUS:
                    self._multi_modify(route, form)
                else:
                    self._send(404, "not found")
            except RuntimeError as e:  # tree not loaded
                self._send(503, str(e))
            except QueryLimitExceeded as e:  # expanded past the cap
                self._send(413, str(e))
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, f"bad request: {e}")
            except Exception as e:  # noqa: BLE001 — keep the daemon
                # alive on evaluator/JVM errors (bad user regex reaches
                # rlike as Py4JJavaError): graphite answers 500, the
                # connection is not dropped
                self._send(500, f"{type(e).__name__}: {e}")

    return Handler


def start_http_server(service: GraphouseService, host: str = "127.0.0.1", port: int = 0):
    """Start the shell on a daemon thread; returns the live server
    (``server.server_address[1]`` is the bound port; ``.shutdown()`` stops it)."""
    server = ThreadingHTTPServer((host, port), make_handler(service))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
