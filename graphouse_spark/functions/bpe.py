"""Distributed BPE vocabulary learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The tokenizer-training step of an LLM data pipeline, engine-native:

1. ONE corpus pass builds the word-frequency table — after it, the
   working set is VOCABULARY-sized, never corpus-sized (the classic
   BPE-on-word-counts formulation);
2. each merge round is one pair-count aggregate over the word table
   (map-side partial combine; pair space is bounded by total symbol
   count) plus an O(1) driver decision (the argmax pair — same
   bounded-collect posture as the IVF centroid loop);
3. applying a merge is a per-row left-to-right fold over a word's
   symbol array — words are short, so the interpreted HOF cost is
   bounded by max word length, not data volume.

Every round checkpoints the word table: the pair-count action would
otherwise recompute the whole merge history per round (O(n²) folds).

Determinism: ties in pair frequency break on (left, right) symbol
order, so the merge sequence is reproducible on any engine — the unit
tests replay it against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (its own trailing symbol, Sennrich-style) so
#: suffix units ("ing</w>") stay distinct from infix ones ("ing")
EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-lowercased tokens — the one
    corpus-sized pass."""
    tok = F.explode(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    ).alias("word")
    return docs.select(tok).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _initial_symbols(word: Column) -> Column:
    """word -> [c1, c2, ..., cn, EOW]."""
    chars = F.split(word, "")
    # Spark's split('abc', '') yields ['a','b','c'] (no trailing empty)
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Replace adjacent (left, right) with left+right, one greedy
    left-to-right pass (the reference BPE apply order: after a merge
    the new symbol cannot re-pair with the consumed right half)."""
    merged = left + right
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(docs: DataFrame, n_merges: int = 20, min_pair_freq: int = 2,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...]. Stops early when no pair
    reaches ``min_pair_freq``."""
    wf = word_frequencies(docs, text_col)
    words = wf.select(
        _initial_symbols(F.col("word")).alias("syms"), F.col("freq")
    ).localCheckpoint(eager=True)

    adjacent = F.explode(
        F.expr(
            "CASE WHEN size(syms) < 2 THEN array() "
            "ELSE transform(sequence(1, size(syms) - 1), "
            "     i -> struct(syms[i-1] AS a, syms[i] AS b)) END"
        )
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            words.select(adjacent.alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        # checkpoint per round: the next round's aggregate is an action,
        # and an uncheckpointed plan would replay every prior fold
        words = words.withColumn("syms", _merge_fold(F.col("syms"), a, b)) \
            .localCheckpoint(eager=True)
    return merges


def bpe_tokenize(docs: DataFrame, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list: (id, tokens array<string>) where
    tokens are the concatenated subword units of every word in order.

    The merge sequence compiles into one nested column expression (a
    fold per merge) — no shuffle, no Python; runs inside the scan
    projection. For serving-scale tokenization the merge table ships
    to a dedicated tokenizer; this is the in-engine reference path
    that proves the learned table.
    """
    word_syms = _initial_symbols(F.col("w"))
    for a, b in merges:
        word_syms = _merge_fold(word_syms, a, b)
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    exploded = docs.select(F.col(id_col), F.posexplode(words).alias("pos", "w"))
    per_word = exploded.select(
        id_col, "pos", word_syms.alias("units")
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "units"))),
                    lambda s: s["units"],
                )
            ).alias("tokens")
        )
    )
