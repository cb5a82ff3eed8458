"""Port of MetricTreeTest.java (search, status workflow, hide state,
limits, notifications, random-order load) against the driver-side index."""

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
