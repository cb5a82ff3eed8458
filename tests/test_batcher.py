"""X6 dir-content request coalescing (DirContentBatcher parity)."""

import threading
import time

import pytest

from graphouse_spark.api.batcher import DirContentBatcher, load_dirs_content


class CountingLoader:
    def __init__(self, delay=0.0, fail=False, drop=None):
        self.calls = []  # list of key-sets, in call order
        self.delay = delay
        self.fail = fail
        self.drop = drop or set()
        self._lock = threading.Lock()

    def __call__(self, keys):
        with self._lock:
            self.calls.append(set(keys))
        if self.delay:
            time.sleep(self.delay)
        if self.fail:
            raise RuntimeError("backend down")
        return {k: f"content:{k}" for k in keys if k not in self.drop}


def test_fast_path_runs_alone_when_uncontended():
    loader = CountingLoader()
    b = DirContentBatcher(loader, max_parallel=2, batch_aggregation_ms=10)
    assert b.load("a") == "content:a"
    assert loader.calls == [{"a"}]


def test_contention_coalesces_into_one_batched_call():
    # one slow in-flight request holds the only permit; followers must
    # aggregate into a single loader call (the reference's whole point)
    loader = CountingLoader(delay=0.3)
    b = DirContentBatcher(loader, max_parallel=1, batch_aggregation_ms=50)

    results = {}

    def call(key):
        results[key] = b.load(key)

    first = threading.Thread(target=call, args=("slow",))
    first.start()
    time.sleep(0.05)  # let it take the permit
    followers = [threading.Thread(target=call, args=(f"d{i}",)) for i in range(8)]
    followers += [threading.Thread(target=call, args=("d0",))]  # duplicate key
    for t in followers:
        t.start()
    for t in [first, *followers]:
        t.join(timeout=5)

    assert results["slow"] == "content:slow"
    assert all(results[f"d{i}"] == f"content:d{i}" for i in range(8))
    # one single-key fast-path call + ONE batch with all 8 distinct dirs
    batch_calls = [c for c in loader.calls if len(c) > 1]
    assert len(batch_calls) == 1
    assert batch_calls[0] == {f"d{i}" for i in range(8)}


def test_max_batch_size_seals_batches():
    loader = CountingLoader(delay=0.2)
    b = DirContentBatcher(loader, max_parallel=1, max_batch_size=3,
                          batch_aggregation_ms=80)
    hold = threading.Thread(target=b.load, args=("hold",))
    hold.start()
    time.sleep(0.05)
    threads = [threading.Thread(target=b.load, args=(f"k{i}",)) for i in range(7)]
    for t in threads:
        t.start()
    for t in [hold, *threads]:
        t.join(timeout=5)
    assert all(len(c) <= 3 for c in loader.calls)
    assert set().union(*loader.calls) == {"hold"} | {f"k{i}" for i in range(7)}


def test_error_and_missing_key_propagation():
    loader = CountingLoader(delay=0.2, fail=True)
    b = DirContentBatcher(loader, max_parallel=1, batch_aggregation_ms=30)
    hold = threading.Thread(target=lambda: pytest.raises(RuntimeError, b.load, "hold"))
    hold.start()
    time.sleep(0.05)
    with pytest.raises(RuntimeError, match="backend down"):
        b.load("x")
    hold.join(timeout=5)

    # loader that answers but omits a key -> LookupError for that caller
    loader2 = CountingLoader(delay=0.2, drop={"gone"})
    b2 = DirContentBatcher(loader2, max_parallel=1, batch_aggregation_ms=30)
    t = threading.Thread(target=b2.load, args=("hold",))
    t.start()
    time.sleep(0.05)
    with pytest.raises(LookupError, match="gone"):
        b2.load("gone")
    t.join(timeout=5)


def test_load_dirs_content_single_scan(spark, tmp_path):
    from graphouse_spark.sources.tables import write_metrics

    rows = [
        ("one_min.a.x", 3, "one_min.a.", "SIMPLE"),
        ("one_min.a.y", 3, "one_min.a.", "BAN"),
        ("one_min.b.z", 3, "one_min.b.", "SIMPLE"),
    ]
    df = spark.createDataFrame(
        rows, "name string, level int, parent string, status string"
    ).selectExpr("*", "current_timestamp() AS updated")
    path = str(tmp_path / "metrics")
    write_metrics(df, path)

    out = load_dirs_content(spark, path, {"one_min.a.", "one_min.b.", "one_min.c."})
    assert out["one_min.a."] == [("one_min.a.x", "SIMPLE"), ("one_min.a.y", "BAN")]
    assert out["one_min.b."] == [("one_min.b.z", "SIMPLE")]
    assert out["one_min.c."] == []  # every requested dir answered

    # end-to-end through the batcher: lazy dir loads over the table
    loader_calls = []

    def loader(keys):
        loader_calls.append(set(keys))
        return load_dirs_content(spark, path, keys)

    b = DirContentBatcher(loader, max_parallel=1, batch_aggregation_ms=50)
    hold = threading.Thread(target=b.load, args=("one_min.a.",))
    hold.start()
    results = {}
    time.sleep(0.02)
    t1 = threading.Thread(target=lambda: results.update(b=b.load("one_min.b.")))
    t2 = threading.Thread(target=lambda: results.update(c=b.load("one_min.c.")))
    t1.start(); t2.start()
    for t in [hold, t1, t2]:
        t.join(timeout=30)
    assert results["b"] == [("one_min.b.z", "SIMPLE")]
    assert results["c"] == []
    assert {frozenset(c) for c in loader_calls if len(c) > 1} == {
        frozenset({"one_min.b.", "one_min.c."})
    }
