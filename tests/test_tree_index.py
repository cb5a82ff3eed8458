"""Port of MetricTreeTest.java (search, status workflow, hide state,
limits, notifications, random-order load) against the driver-side index."""

import pytest

from graphouse_spark.status import MetricStatus as S
from graphouse_spark.tree_index import MetricTree


def search(tree, pattern):
    return sorted(tree.search(pattern))


def test_search():
    t = MetricTree()
    t.add("five_sec.int_8742.x1")
    t.add("five_sec.int_8742.x1")
    t.add("five_sec.int_8743.x1")
    t.add("five_sec.int_8742.x2")
    assert search(t, "five_sec.int_874?.x1") == ["five_sec.int_8742.x1", "five_sec.int_8743.x1"]
    assert search(t, "five_sec.int_8742.x*") == ["five_sec.int_8742.x1", "five_sec.int_8742.x2"]
    assert search(t, "*") == ["five_sec."]
    assert search(t, "five_sec.*") == ["five_sec.int_8742.", "five_sec.int_8743."]
    assert search(t, "asdf[") == []


def test_statuses_workflow():
    t = MetricTree()
    assert t.add("five_sec.int_8742.x1").status is S.SIMPLE
    assert t.add("five_sec.int_8742.x1").status is S.SIMPLE

    # BAN -> APPROVED
    t.add("five_sec.int_8743.x1")
    assert t.modify("five_sec.int_8743.", S.BAN).status is S.BAN
    assert search(t, "five_sec.*") == ["five_sec.int_8742."], "Dir is BANned, but we found it"
    assert search(t, "five_sec.int_8743.") == [], "Dir is BANned, but we found its metric"
    assert t.add("five_sec.int_8743.x0") is None, "Dir is BANned, but we can add metric into it"
    assert t.add("five_sec.int_8743.new.") is None, "Dir is BANned, but we can add dir into it"

    assert t.modify("five_sec.int_8743.", S.APPROVED).status is S.APPROVED
    assert search(t, "five_sec.*") == ["five_sec.int_8742.", "five_sec.int_8743."]

    # HIDDEN
    assert search(t, "five_sec.int_8742.*") == ["five_sec.int_8742.x1"]
    assert t.modify("five_sec.int_8742.", S.HIDDEN).status is S.HIDDEN
    assert search(t, "five_sec.*") == ["five_sec.int_8743."], "Dir is HIDDEN, but we found it"
    assert search(t, "five_sec.int_8742.*") == [], "Dir is HIDDEN, but we found its metric"
    assert t.add("five_sec.int_8742.x2").status is S.SIMPLE
    assert search(t, "five_sec.int_8742.*") == ["five_sec.int_8742.x1", "five_sec.int_8742.x2"]
    assert t.modify("five_sec.int_8742.", S.APPROVED).status is S.APPROVED
    assert search(t, "five_sec.*") == ["five_sec.int_8742.", "five_sec.int_8743."]

    # SIMPLE -> AUTO_HIDDEN -> SIMPLE
    assert t.modify("five_sec.int_8742.x2", S.HIDDEN).status is S.HIDDEN
    assert search(t, "five_sec.int_8742.*") == ["five_sec.int_8742.x1"], "Metric is HIDDEN, but we found it"
    assert t.modify("five_sec.int_8742.x1", S.HIDDEN).status is S.HIDDEN
    # five_sec.int_8742. is APPROVED, so it resists AUTO_HIDDEN
    assert search(t, "five_sec.*") == ["five_sec.int_8742.", "five_sec.int_8743."]
    assert t.add("five_sec.int_8742.x3").status is S.SIMPLE
    assert search(t, "five_sec.*") == ["five_sec.int_8742.", "five_sec.int_8743."]
    assert search(t, "five_sec.int_8742.*") == ["five_sec.int_8742.x3"]

    assert t.add("five_sec.int_8742.x2.y1").status is S.SIMPLE
    assert search(t, "five_sec.*") == ["five_sec.int_8742.", "five_sec.int_8743."]
    assert search(t, "five_sec.int_8742.*") == ["five_sec.int_8742.x2.", "five_sec.int_8742.x3"]


def test_hide_state():
    t = MetricTree()
    assert t.add("one_min.foo.bar.").status is S.SIMPLE
    assert t.maybe_find_dir("one_min.").status is S.SIMPLE
    assert t.maybe_find_dir("one_min.foo.").status is S.SIMPLE
    assert t.maybe_find_dir("one_min.foo.bar.").status is S.SIMPLE

    t.modify("one_min.foo.", S.HIDDEN)
    assert t.maybe_find_dir("one_min.").status is S.AUTO_HIDDEN
    assert t.maybe_find_dir("one_min.foo.").status is S.HIDDEN
    assert t.maybe_find_dir("one_min.foo.bar.").status is S.SIMPLE

    t.add("one_min.foo.bar.baz.")
    assert t.maybe_find_dir("one_min.").status is S.SIMPLE
    assert t.maybe_find_dir("one_min.foo.").status is S.SIMPLE
    assert t.maybe_find_dir("one_min.foo.bar.").status is S.SIMPLE
    assert t.maybe_find_dir("one_min.foo.bar.baz.").status is S.SIMPLE


def test_metrics_limit():
    dir_limit, metric_limit = 5, 10
    t = MetricTree(dir_limit, metric_limit)
    for i in range(dir_limit * 2 + 1):
        assert (t.add(f"dir.subdir{i}.") is not None) == (i < dir_limit)
    assert t.modify("dir.approved-dir.", S.APPROVED) is not None
    assert t.modify("dir.ban-dir.", S.BAN) is not None
    for i in range(metric_limit * 2 + 1):
        assert (t.add(f"dir.metric{i}") is not None) == (i < metric_limit)
    assert t.modify("dir.approved-metric", S.APPROVED) is not None
    assert t.modify("dir.banned-metric", S.BAN) is not None

    d = t.add("dir.")
    assert len(d.dirs) == 7
    assert len(d.metrics) == 12

    assert t.add("dir.one-more-subdir.a.b.c") is None
    assert t.modify("dir.one-more-subdir.a.b.c", S.APPROVED) is not None

    # already-added children still resolve despite the limit
    for i in range(dir_limit * 2 + 1):
        assert (t.add(f"dir.subdir{i}.") is not None) == (i < dir_limit)
    for i in range(metric_limit * 2 + 1):
        assert (t.add(f"dir.metric{i}") is not None) == (i < metric_limit)


def test_limit_notifications():
    t = MetricTree(1, 2)
    for i in range(3):
        t.add(f"dir.subdir{i}.")
    for i in range(5):
        t.add(f"dir.metric{i}")
    got = t.search("dir.*")
    assert got == [
        "dir._SUBDIRS_LIMIT_REACHED_MAX_1",
        "dir._METRICS_LIMIT_REACHED_MAX_2",
        "dir.subdir0.",
        "dir.metric0",
        "dir.metric1",
    ]


def test_random_order_status_load():
    t = MetricTree()
    t.modify("one_min.", S.SIMPLE)
    t.modify("five_min.", S.SIMPLE)
    t.modify("one_min.one.", S.BAN)
    t.modify("one_min.two.", S.SIMPLE)
    t.modify("one_min.three.", S.SIMPLE)
    t.modify("five_min.one.", S.SIMPLE)
    t.modify("five_min.two.", S.BAN)
    t.modify("five_min.three.", S.BAN)
    assert search(t, "*") == ["five_min.", "one_min."]


def test_auto_hide_metric():
    t = MetricTree()
    t.modify("one_min.", S.SIMPLE)
    t.modify("one_min.one.", S.SIMPLE)
    t.modify("five_min.", S.SIMPLE)
    t.modify("five_min.one.", S.SIMPLE)
    assert search(t, "*") == ["five_min.", "one_min."]
    t.modify("five_min.one.", S.AUTO_HIDDEN)
    assert search(t, "*") == ["one_min."]


def test_load_and_export_roundtrip():
    t = MetricTree()
    t.load_rows([
        ("one_min.srv.cpu", "SIMPLE"),
        ("one_min.srv.", "APPROVED"),
        ("one_min.", "SIMPLE"),
        ("one_min.old.x", "HIDDEN"),
    ])
    rows = {r[0]: r for r in t.export_rows()}
    assert rows["one_min.srv."][3] == "APPROVED"
    assert rows["one_min.srv.cpu"][1] == 3
    assert rows["one_min.srv.cpu"][2] == "one_min.srv."
    assert t.metric_count() == 2


def test_search_cached_ignores_visibility():
    from graphouse_spark.status import MetricStatus as S
    from graphouse_spark.tree_index import MetricTree
    t = MetricTree()
    t.add("five_sec.int_8742.x1")
    t.modify("five_sec.int_8742.", S.BAN)
    assert t.search("five_sec.*") == []
    assert sorted(t.search_cached("five_sec.*")) == ["five_sec.int_8742."]
    assert sorted(t.search_cached("five_sec.int_8742.*")) == ["five_sec.int_8742.x1"]


# --- lazy-load serving mode (wired to the X6 batcher) ---

def _lazy_corpus():
    """dir full name -> [(child full name, status)] — two subtrees."""
    return {
        "": [("one_min.", "SIMPLE"), ("five_min.", "SIMPLE")],
        "one_min.": [("one_min.a.", "SIMPLE"), ("one_min.m1", "SIMPLE")],
        "one_min.a.": [("one_min.a.x", "SIMPLE"), ("one_min.a.y", "BAN")],
        "five_min.": [("five_min.m2", "SIMPLE")],
    }


def test_lazy_tree_loads_only_touched_subtrees():
    from graphouse_spark.tree_index import LazyMetricTree

    corpus = _lazy_corpus()
    calls = []

    def loader(dirname):
        calls.append(dirname)
        return corpus.get(dirname, [])

    t = LazyMetricTree(loader)
    # a one_min glob must never load five_min.'s children
    assert t.search("one_min.a.*") == ["one_min.a.x"]  # BAN invisible
    assert "five_min." not in calls
    assert calls.count("one_min.a.") == 1
    # repeat search: everything cached, no new loader calls
    n = len(calls)
    assert t.search("one_min.a.*") == ["one_min.a.x"]
    assert len(calls) == n

    # root glob now loads the other subtree
    assert sorted(t.search("*.*")) == ["one_min.a.", "one_min.m1", "five_min.m2"] \
        or sorted(t.search("*.*")) == sorted(["one_min.a.", "one_min.m1", "five_min.m2"])
    assert "five_min." in calls


def test_lazy_tree_matches_eager_results():
    from graphouse_spark.tree_index import LazyMetricTree, MetricTree

    corpus = _lazy_corpus()
    lazy = LazyMetricTree(lambda d: corpus.get(d, []))
    eager = MetricTree()
    for rows in corpus.values():
        eager.load_rows(sorted(rows))
    for q in ["*", "*.*", "one_min.*", "one_min.a.*", "one_min.a.x", "{one_min,five_min}.*"]:
        assert lazy.search(q) == eager.search(q), q
        assert lazy.search_cached(q) == eager.search_cached(q), q


def test_lazy_tree_modify_respects_loaded_state():
    from graphouse_spark.status import MetricStatus
    from graphouse_spark.tree_index import LazyMetricTree

    corpus = _lazy_corpus()
    t = LazyMetricTree(lambda d: corpus.get(d, []))
    # BAN status loaded from the table blocks descendant creation
    t.search("one_min.a.*")
    assert t.modify("one_min.a.y", MetricStatus.SIMPLE) is None or \
        t.modify("one_min.a.y", MetricStatus.SIMPLE).status is MetricStatus.BAN
    # a brand-new metric lands next to lazily-loaded siblings, no dupes
    node = t.modify("one_min.a.z", MetricStatus.APPROVED)
    assert node is not None and node.full_name == "one_min.a.z"
    assert sorted(t.search("one_min.a.*")) == ["one_min.a.x", "one_min.a.z"]


def test_lazy_tree_through_batcher(spark, tmp_path):
    """End-to-end: lazy tree -> DirContentBatcher -> one batched
    metrics-table scan serves concurrent dir loads."""
    from graphouse_spark.api.batcher import DirContentBatcher, load_dirs_content
    from graphouse_spark.sources.tables import write_metrics
    from graphouse_spark.tree_index import LazyMetricTree

    rows = [
        ("one_min.", 1, "", "SIMPLE"),
        ("one_min.a.", 2, "one_min.", "SIMPLE"),
        ("one_min.a.x", 3, "one_min.a.", "SIMPLE"),
        ("one_min.a.y", 3, "one_min.a.", "SIMPLE"),
    ]
    df = spark.createDataFrame(
        rows, "name string, level int, parent string, status string"
    ).selectExpr("*", "current_timestamp() AS updated")
    path = str(tmp_path / "metrics")
    write_metrics(df, path)

    batcher = DirContentBatcher(
        lambda dirs: load_dirs_content(spark, path, dirs),
        max_parallel=2, batch_aggregation_ms=20,
    )
    t = LazyMetricTree(batcher.load)
    assert t.search("one_min.a.*") == ["one_min.a.x", "one_min.a.y"]


@pytest.mark.slow
def test_lazy_tree_10m_name_envelope():
    """BASELINE row: LazyMetricTree at the reference's >10M-name scale
    target serves with O(1) bootstrap, a touched-subtree-sized working
    set and coalesced loader calls under concurrency — the numbers
    behind api/service.AUTO_LAZY_THRESHOLD."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/tree_stress.py", "10000000", "--lazy"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["phase"] == "lazy_summary"
    assert row["bootstrap_ms"] < 100           # nothing loads eagerly
    assert row["cold_narrow_glob_hits"] == 100
    assert row["warm_narrow_glob_ms"] < 20     # second touch is in-memory
    assert row["working_set_rss_mb"] < 100     # vs 2070 MB eager at 10M
    # 32 concurrent cold globs (~74 distinct dir misses) must coalesce
    assert row["concurrent_loader_calls"] < 32
