"""Training-shard export sink: layout, invariants, crash-safe manifest."""

import json
import os

import pytest
from pyspark.sql import functions as F

from graphouse_spark.sources.export import (
    MANIFEST, read_training_shards, write_training_shards)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(f"doc{i:03d}", "tok " * (10 + (i * 37) % 190)) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_export_roundtrip_and_invariants(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(corpus, out, budget=256, n_groups=4)
    frame, m2 = read_training_shards(spark, out)
    assert m2 == manifest
    assert manifest["docs"] == 120 and manifest["shards"] >= 1
    assert 0 < manifest["utilization"] <= 1.0

    # every doc exactly once
    assert frame.count() == 120
    assert frame.select("doc_id").distinct().count() == 120
    # token budget respected per shard, except single-doc oversizes
    per = frame.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("n")).collect()
    assert all(r["t"] <= 256 or r["n"] == 1 for r in per)
    # offsets stream back-to-back inside each shard
    bad = (
        frame.withColumn(
            "_expected",
            F.sum("n_tokens").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("shard_id").orderBy("offset", "doc_id")
                .rowsBetween(-2**31, -1)),
        )
        .filter(F.coalesce("_expected", F.lit(0)) != F.col("offset"))
        .count()
    )
    assert bad == 0
    # group partition dirs exist inside the committed generation
    gen = manifest["generation"]
    assert any(d.startswith("group=") for d in os.listdir(f"{out}/{gen}"))


def test_export_is_deterministic(spark, corpus, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(corpus, a, budget=256, n_groups=4)
    write_training_shards(corpus, b, budget=256, n_groups=4)
    fa, _ = read_training_shards(spark, a)
    fb, _ = read_training_shards(spark, b)
    ka = sorted(map(tuple, fa.select("doc_id", "shard_id", "offset").collect()))
    kb = sorted(map(tuple, fb.select("doc_id", "shard_id", "offset").collect()))
    assert ka == kb


def test_missing_manifest_refuses(spark, corpus, tmp_path):
    out = str(tmp_path / "partial")
    write_training_shards(corpus, out, budget=256, n_groups=4)
    os.remove(os.path.join(out, MANIFEST))
    with pytest.raises(FileNotFoundError):
        read_training_shards(spark, out)


def test_reexport_is_generation_committed(spark, corpus, tmp_path,
                                          monkeypatch):
    """A re-export never disturbs the live generation: a crash BEFORE
    the pointer flip leaves readers on the old data; a completed
    re-export flips atomically and garbage-collects superseded
    generations beyond keep_generations."""
    from graphouse_spark.fs import Fs
    from graphouse_spark.sources import export as ex

    out = str(tmp_path / "shards")
    m1 = write_training_shards(corpus, out, budget=256, n_groups=4)

    # crash the second export right at the pointer write
    real_write_text = Fs.write_text

    def crashing(self, p, text):
        if p.endswith(MANIFEST):
            raise OSError("injected crash before pointer flip")
        return real_write_text(self, p, text)

    monkeypatch.setattr(Fs, "write_text", crashing)
    with pytest.raises(OSError, match="injected"):
        write_training_shards(corpus.limit(10), out, budget=256, n_groups=4)
    monkeypatch.setattr(Fs, "write_text", real_write_text)

    # readers still see the FIRST export, untouched
    frame, m = read_training_shards(spark, out)
    assert m == m1 and frame.count() == 120

    # a completed re-export flips the pointer and keeps the previous
    # generation for in-flight readers (gc_grace_seconds=0 makes GC
    # immediate so the policy is observable in-test; production keeps
    # young generations for racing writers)
    m2 = write_training_shards(corpus.limit(10), out, budget=256,
                               n_groups=4, gc_grace_seconds=0)
    frame2, m2r = read_training_shards(spark, out)
    assert m2r == m2 and frame2.count() == 10
    gens = sorted(d for d in os.listdir(out) if d.startswith(".gen-"))
    assert m2["generation"] in gens and len(gens) == 2
    # old generation's files still present for a reader holding m1
    assert spark.read.parquet(f"{out}/{m1['generation']}").count() == 120

    # one more export GCs the oldest
    m3 = write_training_shards(corpus.limit(5), out, budget=256,
                               n_groups=4, gc_grace_seconds=0)
    gens = sorted(d for d in os.listdir(out) if d.startswith(".gen-"))
    assert len(gens) == 2 and m1["generation"] not in gens
    assert m3["generation"] in gens


def test_generational_export_over_legacy_flat_layout(spark, corpus,
                                                     tmp_path):
    """A legacy (pre-generation) export has group=* dirs at the ROOT
    and a manifest without 'generation'. A new export on top must not
    break a reader holding the legacy manifest: generations are
    dot-hidden, so spark.read.parquet(root) — the legacy resolution —
    still sees exactly the flat data, while the new manifest resolves
    to the hidden generation."""
    out = str(tmp_path / "shards")
    # build a legacy layout by exporting, then flattening: move the
    # generation's group dirs to the root and strip the manifest key
    m = write_training_shards(corpus, out, budget=256, n_groups=4)
    gen = m.pop("generation")
    for d in os.listdir(f"{out}/{gen}"):
        os.rename(f"{out}/{gen}/{d}", f"{out}/{d}")
    os.rmdir(f"{out}/{gen}")
    from graphouse_spark.fs import get_fs
    # rewrite through the Hadoop FS (a raw open() would leave the
    # LocalFileSystem's .crc sidecar stale and fail checksum on read)
    get_fs(out, spark).write_text(f"{out}/{MANIFEST}", json.dumps(m))
    legacy_frame, legacy_m = read_training_shards(spark, out)
    assert "generation" not in legacy_m and legacy_frame.count() == 120

    # new export over the legacy root
    m2 = write_training_shards(corpus.limit(10), out, budget=256,
                               n_groups=4, gc_grace_seconds=0)
    # the legacy reader's resolution (root scan) is UNDISTURBED —
    # the hidden generation dir is invisible to Spark's listing
    assert spark.read.parquet(out).count() == 120
    # the committed pointer serves the new generation
    frame2, m2r = read_training_shards(spark, out)
    assert m2r == m2 and frame2.count() == 10


def test_gc_grace_window_protects_racing_writer(spark, corpus, tmp_path):
    """A slower concurrent exporter's still-uncommitted generation must
    not be swept by a faster writer's post-flip GC: anything younger
    than the grace window survives (r12 code-review find). Simulated
    deterministically: a young foreign generation dir exists when the
    export runs."""
    import json as _json

    out = str(tmp_path / "shards")
    write_training_shards(corpus, out, budget=256, n_groups=4)
    # writer B mid-flight: young (current-timestamp) gen dir, no flip
    os.makedirs(f"{out}/.gen-999999999999-bbbbbbbb/group=0")
    # writer A exports with the production grace window
    write_training_shards(corpus.limit(10), out, budget=256, n_groups=4)
    assert os.path.isdir(f"{out}/.gen-999999999999-bbbbbbbb")
    # ...while an AGED orphan is collected by the same pass
    os.makedirs(f"{out}/.gen-000000000001-cccccccc")
    write_training_shards(corpus.limit(5), out, budget=256, n_groups=4)
    assert not os.path.exists(f"{out}/.gen-000000000001-cccccccc")
    assert os.path.isdir(f"{out}/.gen-999999999999-bbbbbbbb")

def test_gc_skipped_when_pointer_unreadable(spark, corpus, tmp_path):
    """Round-12 ADVICE: a pointer that EXISTS but cannot be parsed must
    not degrade to prev_gen=None — that would let the post-flip sweep
    delete the generation committed just before the flip (only the
    grace window would save it, and only while young). The export still
    commits; the sweep is skipped for this run."""
    out = str(tmp_path / "shards")
    m1 = write_training_shards(corpus, out, budget=256, n_groups=4)
    gen1 = m1["generation"]
    # age gen1's name far past any grace window, repoint at it, then
    # corrupt the pointer (torn write / FS hiccup stand-in)
    old = ".gen-000000000002-aaaaaaaa"
    os.rename(f"{out}/{gen1}", f"{out}/{old}")
    from graphouse_spark.fs import get_fs
    fs = get_fs(out, spark)
    fs.write_text(f"{out}/{MANIFEST}", "{not json")
    m2 = write_training_shards(corpus.limit(10), out, budget=256,
                               n_groups=4, gc_grace_seconds=0)
    # the aged previous generation SURVIVED (sweep skipped), and the
    # new export is committed and readable
    assert os.path.isdir(f"{out}/{old}")
    frame, mr = read_training_shards(spark, out)
    assert mr == m2 and frame.count() == 10
    # next export with a CLEAN pointer sweeps the aged orphan
    write_training_shards(corpus.limit(5), out, budget=256, n_groups=4,
                          gc_grace_seconds=0)
    assert not os.path.exists(f"{out}/{old}")


def test_gc_leaves_unparseable_generation_names_alone(spark, corpus,
                                                      tmp_path):
    """Round-12 ADVICE: a .gen-* dir whose timestamp segment does not
    parse is LEFT ALONE, not treated as infinitely old — deleting it
    immediately would bypass the grace window protecting a concurrent
    or foreign writer (write_tags' append sweep already continues on
    parse failure; the export sweep must match)."""
    out = str(tmp_path / "shards")
    write_training_shards(corpus, out, budget=256, n_groups=4)
    os.makedirs(f"{out}/.gen-notatimestamp-zzzzzzzz/group=0")
    write_training_shards(corpus.limit(10), out, budget=256, n_groups=4,
                          gc_grace_seconds=0)
    assert os.path.isdir(f"{out}/.gen-notatimestamp-zzzzzzzz")
