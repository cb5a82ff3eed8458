"""Bigram-LM perplexity scorer: exact invariants + a hand-checked
reference corpus (the oracle hash-compare lives in
tests/test_oracle_parity.py::doc_lm_perplexity)."""

import math

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.text import ngram_lm_scores


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_checked_corpus(spark):
    """Corpus 'a b', 'a b', 'a c': counts C(a)=3, C(b)=2, C(c)=1, V=3;
    C(a,b)=2, C(a,c)=1; alpha=0.5.
    P(b|a) = 2.5/4.5, P(c|a) = 1.5/4.5."""
    out = {r["doc_id"]: r for r in ngram_lm_scores(
        _mk(spark, ["a b", "a b", "a c"]), alpha=0.5).collect()}
    p_ba, p_ca = 2.5 / 4.5, 1.5 / 4.5
    assert out[0]["n_bigrams"] == 1
    assert out[0]["avg_nll"] == round(-math.log(p_ba), 6)
    assert out[2]["avg_nll"] == round(-math.log(p_ca), 6)
    assert out[2]["ppl"] == round(math.exp(-math.log(p_ca)), 6)
    # the common bigram scores as more likely text
    assert out[0]["avg_nll"] < out[2]["avg_nll"]


def test_degenerate_docs(spark):
    """Docs with < 2 tokens have no transitions: null scores, zero
    count — and they still appear in the output."""
    out = {r["doc_id"]: r for r in ngram_lm_scores(
        _mk(spark, ["solo", "", "a b"]), alpha=0.5).collect()}
    assert set(out) == {0, 1, 2}
    for i in (0, 1):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["avg_nll"] is None and out[i]["ppl"] is None
    assert out[2]["n_bigrams"] == 1 and out[2]["avg_nll"] is not None


def test_invariants_on_corpus(spark):
    """On real data: ppl = exp(avg_nll) > 1 (probabilities < 1 by
    smoothing), n_bigrams = n_ws_tokens - 1, every doc present."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ngram_lm_scores(docs, alpha=0.5)
    n = docs.count()
    assert out.count() == n
    bad = out.filter(
        (F.col("n_bigrams") > 0) & ((F.col("avg_nll") <= 0) | (F.col("ppl") <= 1))
    ).count()
    assert bad == 0
    from graphouse_spark.functions.text import tokens_col

    expect = docs.select(
        "doc_id",
        F.greatest(F.size(tokens_col(F.col("text"))) - 1, F.lit(0)).alias("want"),
    )
    mismatch = out.join(expect, "doc_id").filter(F.col("n_bigrams") != F.col("want"))
    assert mismatch.count() == 0
