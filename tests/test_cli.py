"""CLI daemon (`python -m graphouse_spark`): wiring, not re-testing the
pieces — serve binds HTTP + graphite ingest, ingest-file backfills
through the shared pipeline, maintain runs the nightly bundle."""

import json
import socket
import time
import urllib.request

import pytest

from graphouse_spark.__main__ import (
    build_parser, run_ingest_file, run_maintain, run_serve)

BASE = 1542199200


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, r.read().decode()


def test_cli_serve_ingest_query_maintain(spark, tmp_path):
    lines = tmp_path / "lines.txt"
    lines.write_text("".join(
        f"one_min.srv{j}.cpu {v}.0 {BASE + i * 60}\n"
        for j in (1, 2) for i, v in enumerate([1, 2, 3])))

    common = ["--data", str(tmp_path / "data"),
              "--metrics", str(tmp_path / "metrics")]

    # backfill through the shared pipeline
    args = build_parser().parse_args(["ingest-file", str(lines)] + common)
    assert run_ingest_file(args, spark=spark) == 6

    # maintain runs the bundle and refreshes both indexes
    margs = build_parser().parse_args(
        ["maintain"] + common + ["--index", str(tmp_path / "zm")])
    report = run_maintain(margs, spark=spark)
    assert report["zonemap_rows"] > 0 and report["bloom_rows"] > 0

    # serve binds HTTP + the graphite listener; query what we ingested
    sargs = build_parser().parse_args(
        ["serve"] + common + [
            "--checkpoint", str(tmp_path / "ckpt"),
            "--http-port", "0", "--graphite-port", "0",
            "--index", str(tmp_path / "zm")])
    svc, http, query = run_serve(sargs, spark=spark, block=False)
    try:
        port = http.server_address[1]
        code, body = _get(port, "/metricTreeState")
        assert code == 200 and body == "LOADED"
        code, body = _get(
            port, f"/render?target=sumSeries(one_min.*.cpu)&from={BASE}&until={BASE + 600}")
        assert code == 200
        [series] = json.loads(body)
        total = sum(v for v, _t in series["datapoints"] if v is not None)
        # DefaultRetentionProvider coarsens year-old one_min data to
        # 600s avg buckets: avg(1,2,3)=2 per server, summed across two
        assert total == 4.0
        # estimate rides the CLI-configured index
        code, body = _get(
            port, f"/explain?target=one_min.srv1.cpu&from={BASE}&until={BASE+600}&estimate=1")
        assert json.loads(body)["indexed"] is True
    finally:
        http.shutdown()
    assert query is None  # graphite listener disabled with port 0


def test_cli_serve_with_live_graphite_socket(spark, tmp_path):
    sargs = build_parser().parse_args([
        "serve",
        "--data", str(tmp_path / "data"),
        "--metrics", str(tmp_path / "metrics"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--http-port", "0", "--graphite-port", "0"])
    # pick a free port for the listener
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    gport = s.getsockname()[1]; s.close()
    sargs.graphite_port = gport
    sargs.trigger_seconds = 1
    svc, http, query = run_serve(sargs, spark=spark, block=False)
    try:
        deadline = time.time() + 30
        sent = False
        while time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", gport), timeout=2) as c:
                    c.sendall(f"one_min.live.cpu 7.0 {BASE}\n".encode())
                sent = True
                break
            except OSError:
                time.sleep(0.5)
        assert sent
        deadline = time.time() + 60
        while time.time() < deadline:
            if svc.search("one_min.live.cpu").strip():
                break
            time.sleep(1)
            svc.load_tree()
        assert svc.search("one_min.live.cpu").strip()
    finally:
        query.stop()
        http.shutdown()


def test_cli_serve_tagged_ingest_live_socket(spark, tmp_path):
    """--tagged-ingest: a graphite 1.1 tagged line over live TCP lands
    in the data table (canonical tag order), never in the tree, and
    serves through seriesByTag + /tags — the full extension loop."""
    import json

    sargs = build_parser().parse_args([
        "serve",
        "--data", str(tmp_path / "data"),
        "--metrics", str(tmp_path / "metrics"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--http-port", "0", "--graphite-port", "0", "--tagged-ingest"])
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    gport = s.getsockname()[1]; s.close()
    sargs.graphite_port = gport
    sargs.trigger_seconds = 1
    now = int(time.time())
    svc, http, query = run_serve(sargs, spark=spark, block=False)
    try:
        deadline = time.time() + 30
        sent = False
        while time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", gport), timeout=2) as c:
                    # tags deliberately unsorted; plus one plain line
                    c.sendall((f"disk.used;rack=r1;datacenter=dc9 5.0 {now}\n"
                               f"one_min.plain.cpu 1.0 {now}\n").encode())
                sent = True
                break
            except OSError:
                time.sleep(0.5)
        assert sent
        deadline = time.time() + 60
        found = []
        while time.time() < deadline:
            found = json.loads(svc.tag_find_series(["name=disk.used"]))
            if found:
                break
            time.sleep(1)
        assert found == ["disk.used;datacenter=dc9;rack=r1"]
        # plain line still registers in the tree; the tagged one never
        deadline = time.time() + 60
        while time.time() < deadline:
            svc.load_tree()
            if svc.search("one_min.plain.cpu").strip():
                break
            time.sleep(1)
        assert svc.search("one_min.plain.cpu").strip()
        assert ";" not in svc.search_cached("*")
        out = svc.render("seriesByTag('name=disk.used', 'datacenter=dc9')",
                         now - 70, now + 190)
        assert [s_["target"] for s_ in out] == \
            ["disk.used;datacenter=dc9;rack=r1"]
        vals = [p[0] for s_ in out for p in s_["datapoints"]
                if p[0] is not None]
        assert vals == [5.0]
    finally:
        query.stop()
        http.shutdown()
