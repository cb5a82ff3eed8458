"""Arrow-kernel vs pure-Catalyst strategy equality (round-13 opt).

The round-13 optimization moved two interpreted-HOF gram pipelines
(contamination's hashed 8-grams, langid's char-trigram sides) into
Arrow kernels. These tests pin the kernels to the engine forms
row-for-row on a corpus that exercises every branch the engine has:
NULL text, empty text, whitespace-only, fewer-tokens-than-n, unicode
whitespace (ASCII-whitespace regex parity), mixed case, and heavy
repetition (the per-task hash memo path).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def tricky_docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again", "en"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (3, "le renard brun rapide saute par dessus le chien paresseux", "fr"),
        (4, "short doc", "en"),          # fewer tokens than n=8
        (5, "", "en"),                   # empty text -> one "" gram
        (6, "   \t  ", "fr"),            # whitespace-only -> one "" gram
        (7, None, "en"),                 # NULL text -> no rows
        (8, "café bar baz café bar baz qux one two three", "fr"),
        (9, "a b c d e f g h", "en"),    # exactly n tokens -> one 8-gram
        (10, "a b c d e f g", "en"),     # n-1 tokens -> joined single gram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hashed_ngrams_arrow_equals_engine(spark, tricky_docs):
    from graphouse_spark.functions.contamination import _hashed_ngrams

    eng = _hashed_ngrams(tricky_docs, "doc_id", "text", 8, strategy="engine")
    arw = _hashed_ngrams(tricky_docs, "doc_id", "text", 8, strategy="arrow")
    assert _rows(arw) == _rows(eng)
    # NULL text contributes exactly one NULL-gram row (inner equi-join
    # drops it downstream); empty/whitespace texts hash ""
    rows = [tuple(r) for r in arw.collect()]
    assert [r for r in rows if r[0] == 7] == [(7, None)]
    assert {r[0] for r in rows} >= {5, 6}


def test_hashed_ngrams_tokens_col_path(spark, tricky_docs):
    from graphouse_spark.functions.contamination import _hashed_ngrams
    from graphouse_spark.functions.text import tokens_col

    toked = tricky_docs.withColumn("_tokens", tokens_col(F.col("text")))
    eng = _hashed_ngrams(toked, "doc_id", "text", 8, tokens_col="_tokens",
                         strategy="engine")
    arw = _hashed_ngrams(toked, "doc_id", "text", 8, tokens_col="_tokens",
                         strategy="arrow")
    assert _rows(arw) == _rows(eng)


def test_contamination_end_to_end_strategies_agree(spark, tricky_docs):
    from graphouse_spark.functions.contamination import ngram_contamination

    train = tricky_docs.filter("doc_id != 2")
    ev = tricky_docs.filter("doc_id = 2")
    eng = ngram_contamination(train, ev, n=8, min_shared=2, strategy="engine")
    arw = ngram_contamination(train, ev, n=8, min_shared=2, strategy="arrow")
    rows = _rows(arw)
    assert rows == _rows(eng)
    assert rows  # doc 1 shares every 8-gram with its lowercase twin


def test_langid_strategies_agree(spark, tricky_docs):
    from graphouse_spark.functions.text import ngram_language_id

    eng = ngram_language_id(tricky_docs, n=3, profile_k=20, strategy="engine")
    arw = ngram_language_id(tricky_docs, n=3, profile_k=20, strategy="arrow")
    assert _rows(arw) == _rows(eng)
    # NULL-text doc must be absent from both (no grams, no score)
    assert all(r[0] != 7 for r in arw.collect())


@pytest.fixture(scope="module")
def dense_docs(spark):
    """Enough rows that every Arrow batch mixes NULL-text docs with
    hashed docs (the r13 kernel spread 10 docs over 32 partitions and
    so never exercised that mix): 96 distinct docs + 16 interleaved
    NULLs across 8 partitions ~ 14 docs per batch."""
    rows = []
    for i in range(112):
        if i % 7 == 3:
            rows.append((i, None, "en"))
        else:
            words = " ".join(f"w{i}x{j}" for j in range(12))
            rows.append((i, words, "en" if i % 2 else "fr"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string").repartition(8)


def test_hashed_ngrams_null_doc_shares_batch_exact_hashes(spark, dense_docs):
    """ADVICE r13 (high): a NULL-text doc in a batch made pandas infer
    float64 for the gram column, silently rounding 60-bit hashes past
    float64's 53-bit mantissa. The nullable-Int64 fix must keep every
    hash exact even when NULL docs share a batch with hashed docs."""
    from graphouse_spark.functions.contamination import _hashed_ngrams

    eng = _hashed_ngrams(dense_docs, "doc_id", "text", 8, strategy="engine")
    arw = _hashed_ngrams(dense_docs, "doc_id", "text", 8, strategy="arrow")
    assert _rows(arw) == _rows(eng)
    # sanity: the fixture really does hash docs (rows with large hashes
    # exist) AND really does carry NULL rows
    rows = [tuple(r) for r in arw.collect()]
    assert any(r[1] is not None and r[1] > (1 << 53) for r in rows)
    assert any(r[1] is None for r in rows)


def test_memo_caps_do_not_change_results(spark, monkeypatch, dense_docs,
                                         tricky_docs):
    """VERDICT r13 #3: the per-task memo caps (clear-on-overflow) must
    be result-invariant. Shrink every cap to 4 so the clearing path
    runs constantly over a high-cardinality batch, and pin kernel rows
    to the engine strategies."""
    from graphouse_spark.functions import contamination, dedup, text

    monkeypatch.setattr(contamination, "_MEMO_CAP", 4)
    monkeypatch.setattr(dedup, "_MEMO_CAP", 4)
    monkeypatch.setattr(dedup, "_ROWCACHE_CAP", 4)
    monkeypatch.setattr(text, "_MEMO_CAP", 4)

    grams_eng = contamination._hashed_ngrams(
        dense_docs, "doc_id", "text", 8, strategy="engine")
    grams_arw = contamination._hashed_ngrams(
        dense_docs, "doc_id", "text", 8, strategy="arrow")
    assert _rows(grams_arw) == _rows(grams_eng)

    mh_eng = dedup.minhash_signatures(dense_docs, hash_fn="md5")
    mh_arw = dedup.minhash_signatures_np(dense_docs)
    assert _rows(mh_arw) == _rows(mh_eng)

    sh_eng = dedup.simhash(dense_docs, hash_fn="md5", bits=60)
    sh_arw = dedup.simhash_np(dense_docs, bits=60)
    assert _rows(sh_arw) == _rows(sh_eng)

    lid_eng = text.ngram_language_id(tricky_docs, n=3, profile_k=20,
                                     strategy="engine")
    lid_arw = text.ngram_language_id(tricky_docs, n=3, profile_k=20,
                                     strategy="arrow")
    assert _rows(lid_arw) == _rows(lid_eng)
