"""Multi-format corpus IO: every input line lands in docs XOR rejects;
round-trips preserve content; partitioned writes prune."""

import json

import pytest
from pyspark.sql import functions as F

from graphouse_spark.sources.textcorpus import (
    DOCUMENTS_SCHEMA,
    read_documents,
    write_documents,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def jsonl_dir(tmp_path):
    good = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
        {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5},
        {"doc_id": 3, "text": "delta", "lang": "en", "source": "s0", "n_chars": 5},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, '{"doc_id": broken json!!')
    lines.append("not json at all")
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_quarantine_split(spark, jsonl_dir):
    docs, rejects = read_documents(spark, jsonl_dir, fmt="jsonl")
    assert docs.count() == 3
    assert rejects.count() == 2
    raws = {r["raw"] for r in rejects.collect()}
    assert "not json at all" in raws
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == {1: "alpha beta", 2: "gamma", 3: "delta"}
    assert docs.schema.fieldNames() == DOCUMENTS_SCHEMA.fieldNames()


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello,en,s0,5\n"
        "oops,not-a-long,xx,s9,NaNope\n"
        "2,world,fr,s1,5\n"
    )
    docs, rejects = read_documents(spark, str(p), fmt="csv")
    assert docs.count() == 2
    assert rejects.count() == 1
    assert "oops" in rejects.collect()[0]["raw"]


def test_parquet_passthrough_and_roundtrip(spark, tmp_path):
    docs, rejects = read_documents(spark, f"{SF}/documents.parquet")
    n = docs.count()
    assert n > 0 and rejects.count() == 0
    out = str(tmp_path / "by_lang")
    write_documents(docs, out, partition_by=("lang",))
    back, _ = read_documents(spark, out)
    assert back.count() == n
    # partition pruning: a lang filter must reach PartitionFilters
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_jsonl_roundtrip(spark, tmp_path, jsonl_dir):
    docs, _ = read_documents(spark, jsonl_dir, fmt="jsonl")
    out = str(tmp_path / "rt")
    write_documents(docs, out, fmt="jsonl")
    back, rej = read_documents(spark, out, fmt="jsonl")
    assert rej.count() == 0
    assert {r["doc_id"] for r in back.collect()} == {1, 2, 3}


def test_bad_format(spark):
    with pytest.raises(ValueError, match="fmt must be"):
        read_documents(spark, "/tmp/x", fmt="orc2")


def test_stream_documents_availablenow(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "x", "lang": "en", "source": "s", "n_chars": 1})
        + "\nbroken{{\n"
    )
    (src / "b.jsonl").write_text(
        json.dumps({"doc_id": 2, "text": "y", "lang": "de", "source": "s", "n_chars": 1})
        + "\n"
    )
    from graphouse_spark.sources.textcorpus import stream_documents

    docs, rejects = stream_documents(spark, str(src))
    assert docs.isStreaming and rejects.isStreaming
    qd = docs.writeStream.format("memory").queryName("tc_docs") \
        .trigger(availableNow=True).start()
    qr = rejects.writeStream.format("memory").queryName("tc_rejects") \
        .trigger(availableNow=True).start()
    qd.awaitTermination(120)
    qr.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM tc_docs").collect()}
    assert got == {1, 2}
    raws = [r["raw"] for r in spark.sql("SELECT * FROM tc_rejects").collect()]
    assert raws == ["broken{{"]
