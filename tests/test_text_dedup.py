"""ExactSubstr removal (Lee et al. 2022 — the transform half of
duplicated_spans): keep-one vs remove-all, case preservation, short
docs untouched, and agreement with the detection operator."""

from pyspark.sql import functions as F

from graphouse_spark.functions.text import (
    duplicated_spans, remove_duplicated_spans)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_doc_retains_one_copy(spark):
    dup = "a b c d e f g h i j"          # one exact 10-token window
    docs = _docs(spark, [
        (1, f"{dup} tail one"),
        (2, f"head two {dup}"),
        (3, "totally unrelated text with enough words to be long"),
    ])
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(docs, n=10, min_docs=2).collect()}
    # doc 1 is the smallest doc_id containing the window: untouched
    assert out[1]["text"] == f"{dup} tail one"
    assert out[1]["n_removed_tokens"] == 0
    # doc 2 loses exactly the 10 duplicated tokens
    assert out[2]["text"] == "head two"
    assert out[2]["n_removed_tokens"] == 10
    assert out[3]["n_removed_tokens"] == 0


def test_keep_none_removes_everywhere(spark):
    dup = "a b c d e f g h i j"
    docs = _docs(spark, [(1, f"{dup} x"), (2, f"y {dup}")])
    out = {r["doc_id"]: r["text"] for r in
           remove_duplicated_spans(docs, n=10, min_docs=2,
                                   keep="none").collect()}
    assert out == {1: "x", 2: "y"}


def test_case_preserved_and_matching_folded(spark):
    """Window matching is case-folded (A b == a b) but surviving text
    keeps its original case."""
    dup_lower = "a b c d e f g h i j"
    dup_upper = "A B C D E F G H I J"
    docs = _docs(spark, [(1, f"{dup_lower} KEEP Me"),
                         (2, f"{dup_upper} other")])
    out = {r["doc_id"]: r["text"] for r in
           remove_duplicated_spans(docs, n=10, min_docs=2).collect()}
    assert out[1] == f"{dup_lower} KEEP Me"   # keeper, case intact
    assert out[2] == "other"                  # folded match removed


def test_short_docs_and_overlapping_spans(spark):
    """Docs under n tokens pass through; overlapping flagged windows
    merge into ONE maximal span (11 shared tokens = 2 windows -> one
    11-token excision)."""
    dup11 = "a b c d e f g h i j k"
    docs = _docs(spark, [
        (1, f"{dup11}"),
        (2, f"pre {dup11} post"),
        (3, "short doc"),
    ])
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(docs, n=10, min_docs=2).collect()}
    assert out[2]["text"] == "pre post"
    assert out[2]["n_removed_tokens"] == 11
    assert out[3]["text"] == "short doc"
    assert out[3]["n_removed_tokens"] == 0


def test_removal_agrees_with_detection(spark):
    """keep='none' removes exactly the token positions the detection
    operator reports as spans."""
    dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = _docs(spark, [
        (1, f"{dup} alpha beta"),
        (2, f"gamma {dup} delta"),
    ])
    spans = duplicated_spans(docs, n=10, min_docs=2).collect()
    span_tokens = {(r["doc_id"],): r["span_end"] - r["span_start"] + 1
                   for r in spans}
    removed = {(r["doc_id"],): r["n_removed_tokens"] for r in
               remove_duplicated_spans(docs, n=10, min_docs=2,
                                       keep="none").collect()}
    assert removed == span_tokens


def test_keep_rejects_unknown_mode(spark):
    import pytest

    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="keep must be"):
        remove_duplicated_spans(docs, keep="banana")
