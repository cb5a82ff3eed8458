"""PII detection/redaction, repetition stats, chunk dedup, mix resampling.

These are extended-surface training-pipeline operators (not graphouse
parity items); the tests pin exact semantics on hand-checkable inputs
— the corpus-level driver queries then prove the same expressions at
scale against the DuckDB oracle.
"""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.pii import pii_stats, redact_pii
from graphouse_spark.functions.sampling import resample_to_mix
from graphouse_spark.functions.text import chunk_dedup, repetition_stats


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "contact bob.smith+x@example.co.uk or call 555-123-4567 now"),
        (1, "server at 10.0.255.3 responded; order id 123456789012 shipped"),
        (2, "plain text with no sensitive content at all"),
        (3, "two mails: a@b.io c@d.org and ip 1.2.3.4"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_stats_counts(pii_docs):
    got = {r["doc_id"]: r.asDict() for r in pii_stats(pii_docs).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1 and got[0]["n_pii"] == 2
    assert got[1]["n_ipv4"] == 1 and got[1]["n_id_number"] == 1
    assert got[2]["n_pii"] == 0
    assert got[3]["n_email"] == 2 and got[3]["n_ipv4"] == 1


def test_redact_pii_masks_all_kinds(pii_docs):
    got = {r["doc_id"]: r["text"] for r in redact_pii(pii_docs).collect()}
    assert got[0] == "contact <EMAIL> or call <PHONE> now"
    assert got[1] == "server at <IP> responded; order id <ID> shipped"
    assert got[2] == "plain text with no sensitive content at all"
    assert got[3] == "two mails: <EMAIL> <EMAIL> and ip <IP>"


def test_repetition_stats_hand_math(spark):
    # "a a a b" -> top unigram a: 3/4; bigrams: "a a" x2, "a b" -> 2/3;
    # dup tokens: the three a's -> 3/4
    df = spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    row = repetition_stats(df).collect()[0]
    assert row["n_tokens"] == 4
    assert row["top_unigram_frac"] == 0.75
    assert row["top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["dup_unigram_frac"] == 0.75


def test_repetition_stats_single_token(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    row = repetition_stats(df).collect()[0]
    assert row["n_tokens"] == 1
    assert row["top_unigram_frac"] == 1.0
    assert row["top_bigram_frac"] == 0.0  # no bigrams
    assert row["dup_unigram_frac"] == 0.0


def test_chunk_dedup_first_occurrence_wins(spark):
    # 2-token chunks; doc 0 owns "x y"; doc 1 repeats it and keeps "z w";
    # doc 2 repeats its own chunk internally (second copy dropped)
    rows = [
        (0, "x y"),
        (1, "x y z w"),
        (2, "p q p q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in chunk_dedup(df, chunk_tokens=2).collect()}
    assert got[0]["kept_text"] == "x y" and got[0]["n_kept"] == 1
    assert got[1]["kept_text"] == "z w" and got[1]["n_chunks"] == 2 and got[1]["n_kept"] == 1
    assert got[2]["kept_text"] == "p q" and got[2]["n_kept"] == 1


def test_chunk_dedup_partial_tail_and_empty(spark):
    rows = [(0, "a b c"), (1, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in chunk_dedup(df, chunk_tokens=2).collect()}
    assert got[0]["kept_text"] == "a b c" and got[0]["n_chunks"] == 2
    assert got[1]["kept_text"] == "" and got[1]["n_chunks"] == 0 and got[1]["n_kept"] == 0


@pytest.fixture(scope="module")
def mix_docs(spark):
    rows = [(i, "srcA" if i < 800 else ("srcB" if i < 900 else "srcC"))
            for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_resample_to_mix_hits_target(mix_docs):
    # srcA 800 / srcB 100 / srcC 100 -> equal thirds; B and C are the
    # binding sources (kept whole), A downsamples to ~100
    out = resample_to_mix(mix_docs, "doc_id", "source",
                          {"srcA": 1, "srcB": 1, "srcC": 1})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["srcB"] == 100 and counts["srcC"] == 100
    # hash sampling is binomial around 100 (rate 1/8 of 800)
    assert 70 <= counts["srcA"] <= 130


def test_resample_to_mix_deterministic_and_drops_unlisted(mix_docs):
    kwargs = dict(id_col="doc_id", source_col="source",
                  target_weights={"srcA": 0.5, "srcB": 0.5})
    a = sorted(r["doc_id"] for r in resample_to_mix(mix_docs, **kwargs).collect())
    b = sorted(r["doc_id"] for r in resample_to_mix(mix_docs, **kwargs).collect())
    assert a == b  # same hash decisions on every run
    sources = {r["source"] for r in resample_to_mix(mix_docs, **kwargs).collect()}
    assert "srcC" not in sources


def test_resample_to_mix_rejects_bad_weights(mix_docs):
    with pytest.raises(ValueError):
        resample_to_mix(mix_docs, "doc_id", "source", {})
