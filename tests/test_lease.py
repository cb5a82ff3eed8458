"""Round-12 verdict #2: the multi-writer contract. Every whole-table
or partition REWRITER (rollup compaction, delete/update mutations,
tag-index rewrite/backfill) holds a single-writer lease for its
protocol; a concurrent rewriter is refused with LeaseHeld (and
retries), a CRASHED writer's lease ages out and is taken over. The
reference's implicit arbiter is its single MetricCacher writer pool
(MetricCacher.java); on a shared lake it must be explicit."""

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark import fs as fs_mod
from graphouse_spark.fs import (
    LeaseHeld, acquire_writer_lease, lease_path, writer_lease)
from graphouse_spark.operators.mutate import delete_where
from graphouse_spark.operators.rollup import compact_data_table
from graphouse_spark.sources.tables import read_data, write_data
from tests.test_rollup import NOW, PROVIDER, old_points


def table_rows(spark, path):
    return sorted(map(tuple, read_data(spark, path).collect()))


def test_lease_refuses_second_writer_and_releases(spark, tmp_path):
    path = str(tmp_path / "data")
    write_data(old_points(spark), path)
    fs = fs_mod.get_fs(path, spark)
    held = acquire_writer_lease(fs, path)
    with pytest.raises(LeaseHeld, match="held by"):
        compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                           min_age_seconds=7 * 86400)
    with pytest.raises(LeaseHeld):
        # the affected-dates scan itself runs under the lease (it
        # would otherwise race a concurrent swap mid-scan)
        delete_where(spark, path, F.col("metric") == "nope")
    held.release()
    assert compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                              min_age_seconds=7 * 86400) == ["2018-11-14"]
    # the lease is gone after a clean run
    assert not fs.exists(lease_path(path))


def test_stale_lease_taken_over(spark, tmp_path):
    """A crashed writer's lease (mtime past the TTL) must not wedge the
    table forever: the next writer takes it over."""
    path = str(tmp_path / "data")
    write_data(old_points(spark), path)
    lp = lease_path(path)
    with open(lp, "w") as f:
        f.write("crashed-writer-deadbeef")
    old = time.time() - 10 * 3600
    os.utime(lp, (old, old))
    assert compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                              min_age_seconds=7 * 86400) == ["2018-11-14"]


def test_renew_detects_takeover(spark, tmp_path):
    path = str(tmp_path / "t")
    fs = fs_mod.get_fs(str(tmp_path), spark)
    lease = acquire_writer_lease(fs, path)
    lease.renew()  # normal renewal is a no-op refresh
    # simulate a takeover (as if this writer had gone stale mid-run)
    fs.write_text(lease_path(path), "usurper")
    with pytest.raises(LeaseHeld, match="taken over"):
        lease.renew()
    # release must not clobber the usurper's lease
    lease.release()
    assert fs.read_text(lease_path(path)).strip() == "usurper"


def test_tag_rewrite_vs_backfill_arbitrated(spark, tmp_path):
    from graphouse_spark import tags as T
    from tests.test_manifest_commit import TAG_BASE, TAG_LINES, _tagged_cfg

    cfg = _tagged_cfg(spark, tmp_path, "t", TAG_LINES, TAG_BASE)
    fs = fs_mod.get_fs(cfg.tags_path, spark)
    held = acquire_writer_lease(fs, cfg.tags_path)
    with pytest.raises(LeaseHeld):
        T.backfill_tag_index(spark, cfg.data_path, cfg.tags_path)
    from graphouse_spark.sources.tables import rewrite_tags_atomic
    with pytest.raises(LeaseHeld):
        rewrite_tags_atomic(spark, cfg.tags_path, lambda idx: idx)
    held.release()
    assert T.backfill_tag_index(spark, cfg.data_path, cfg.tags_path) > 0


def test_interleaved_compaction_and_mutation_lose_nothing(spark, tmp_path):
    """THE verdict scenario: a rollup compaction and a delete mutation
    racing on the same date partition. With the lease, one of them
    waits (LeaseHeld -> retry); the final table equals the serial
    application — nothing lost, nothing resurrected. (Without
    arbitration the two protocols interleave stage/backup states on
    the same partition dirs: recover_swap is a one-writer state
    machine and a backup from writer A can be 'restored' over writer
    B's committed result.)"""
    racy = str(tmp_path / "racy")
    serial = str(tmp_path / "serial")
    pts = old_points(spark)
    write_data(pts, racy)
    write_data(pts, serial)

    cond = F.col("metric") == "one_min.srv.req.count"
    errors = []

    def retrying(fn):
        # deadline-based, not count-based: under full-suite load the
        # winner's compaction can hold the lease well past the 20 s a
        # 200x0.1s loop allows (observed flake on a loaded local[32]box)
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            try:
                return fn()
            except LeaseHeld:
                time.sleep(0.1)
        errors.append("never acquired lease")

    t1 = threading.Thread(target=retrying, args=(
        lambda: compact_data_table(spark, racy, PROVIDER, now_seconds=NOW,
                                   min_age_seconds=7 * 86400),))
    t2 = threading.Thread(target=retrying, args=(
        lambda: delete_where(spark, racy, cond),))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors

    # serial oracle (both serializations agree: the deleted metric's
    # rows never affect other metrics' rollup buckets)
    compact_data_table(spark, serial, PROVIDER, now_seconds=NOW,
                       min_age_seconds=7 * 86400)
    delete_where(spark, serial, cond)
    assert table_rows(spark, racy) == table_rows(spark, serial)
    # the deleted metric is gone; the survivor's rolled rows are intact
    metrics = {r[0] for r in table_rows(spark, racy)}
    assert "one_min.srv.req.count" not in metrics
    assert "one_min.srv.cpu" in metrics


def test_lease_mutual_exclusion_under_contention(spark, tmp_path):
    """Property hammer: N racing acquirers, never two concurrent
    holders, no ghost lease left behind. This caught the real bug the
    first interleaving test only sampled: RawLocalFileSystem
    create(overwrite=false) is check-then-create, and two local racers
    could both 'win' it — the second truncating the first, both
    failing their confirm, and the orphaned file wedging the table
    until the TTL. Local acquisition now uses O_CREAT|O_EXCL."""
    fs = fs_mod.get_fs(str(tmp_path), spark)
    root = str(tmp_path / "tbl")
    holders, violations, deaths = [], [], []
    lock = threading.Lock()

    def worker(wid):
        for _ in range(12):
            lease, deadline = None, time.time() + 60
            while lease is None and time.time() < deadline:
                try:
                    lease = acquire_writer_lease(fs, root)
                except LeaseHeld:
                    time.sleep(0.005)
                except Exception as exc:  # noqa: BLE001
                    deaths.append((wid, repr(exc)))
                    return
            if lease is None:
                deaths.append((wid, "starved"))
                return
            with lock:
                holders.append(wid)
                if len(holders) > 1:
                    violations.append(list(holders))
            time.sleep(0.003)
            with lock:
                holders.remove(wid)
            lease.release()

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not violations, violations[:3]
    assert not deaths, deaths[:3]
    assert not os.path.exists(lease_path(root))  # no ghost


def test_renew_never_opens_acquire_window(spark, tmp_path):
    """r14 root cause of the interleaved-compaction 'load flake': a
    holder RENEWING its live lease must never let a retrying
    contender in. The old renew replaced the file via write_text
    (tmp + rename-over), and on ChecksumFs-backed local filesystems
    the overwrite-rename is delete+rename inside — for a moment the
    lease file is ABSENT, a contender's create_exclusive lands in the
    window, and the rename then silently clobbers the contender's
    token so BOTH rewriters proceed (observed as FILE_NOT_EXIST
    mid-scan under the lease). Renewal is now an in-place mtime bump;
    on the old code this test breaches on the FIRST renewal."""
    fs = fs_mod.get_fs(str(tmp_path), spark)
    root = str(tmp_path / "tbl")
    holder = acquire_writer_lease(fs, root, owner="HOLDER")
    breaches, stop = [], threading.Event()

    def contend(tok):
        while not stop.is_set():
            try:
                acquire_writer_lease(fs, root, owner=tok)
                breaches.append(tok)
                return
            except LeaseHeld:
                pass

    threads = [threading.Thread(target=contend, args=(f"C{i}",))
               for i in range(2)]
    for t in threads:
        t.start()
    deadline = time.monotonic() + 6
    renews = 0
    while time.monotonic() < deadline and not breaches:
        holder.renew()
        renews += 1
    stop.set()
    for t in threads:
        t.join()
    assert not breaches, f"contender acquired during renew #{renews}"
    assert fs.read_text(lease_path(root)).strip() == "HOLDER"
    holder.release()
