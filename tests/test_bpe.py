"""BPE learning: hand-checked merges, pure-Python reference replay on
real corpus data, tokenize round-trip invariants."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.bpe import (
    EOW,
    bpe_tokenize,
    learn_bpe,
    word_frequencies,
)


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def ref_learn_bpe(word_freqs, n_merges, min_pair_freq=2):
    """Pure-Python reference (Sennrich alg. 1, deterministic ties)."""
    words = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]]))
        # deterministic: max count, then lexicographically smallest (a, b)
        top = max(pairs.values())
        cands = sorted(p for p, c in pairs.items() if c == top)
        best = cands[0]
        if pairs[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def test_hand_checked_merges(spark):
    """'aaab' x3, 'ab' x2: pair counts round 1 — (a,a)=6, (a,b)=5,
    (b,EOW)=5 -> merge (a,a); round 2: (aa,a)=3, (a,b)=5, (b,EOW)=5
    -> tie at 5 breaks to (a,b)."""
    docs = _mk(spark, ["aaab aaab aaab", "ab ab"])
    merges = learn_bpe(docs, n_merges=2)
    assert merges == [("a", "a"), ("a", "b")]


def test_matches_python_reference_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    want = ref_learn_bpe(wf, n_merges=10)
    got = learn_bpe(docs, n_merges=10)
    assert got == want


def test_tokenize_roundtrip(spark):
    docs = _mk(spark, ["low lower lowest", "low low"])
    merges = learn_bpe(docs, n_merges=4, min_pair_freq=1)
    toks = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(docs, merges).collect()}
    # concatenating units (minus EOW) reconstructs the original text
    for i, text in enumerate(["low lower lowest", "low low"]):
        rebuilt = "".join(t for t in toks[i]).replace(EOW, " ").strip()
        assert rebuilt == text
    # learned merges actually compress: fewer units than characters
    n_units = sum(len(v) for v in toks.values())
    n_chars_plus_eow = sum(len(w) + 1 for t in ["low lower lowest", "low low"]
                           for w in t.split())
    assert n_units < n_chars_plus_eow


def test_empty_and_degenerate(spark):
    docs = _mk(spark, ["", "x"])
    merges = learn_bpe(docs, n_merges=3, min_pair_freq=2)
    assert merges == []  # nothing repeats twice
    toks = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(docs, merges).collect()}
    assert toks.get(1) == ["x", EOW]
    assert 0 not in toks  # no words -> no row (doc has no tokens)
