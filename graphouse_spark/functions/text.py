"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in Catalyst functions (JVM-side,
whole-stage codegen) — no Python UDFs: at 100 TB a row-at-a-time UDF
is the difference between hours and weeks. Each operator is a pure
``DataFrame -> DataFrame`` with deterministic output so a SQL oracle
can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny embedded stopword lists for n-gram/stopword language ID
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"],
    "fr": ["le", "la", "de", "et", "un", "que", "est", "pour", "qui", "dans"],
}

#: BPE-ish token boundary: words, numbers, or single punctuation/symbol
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (lowercased, empties dropped)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact integer token statistics per document.

    Columns: n_chars, n_ws_tokens (whitespace), n_bpe_tokens (regex,
    a cheap proxy for subword token count), n_distinct_tokens,
    n_digits, n_punct.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        F.size(toks).alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(TOKEN_REGEX)).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(text, F.lit(r"[0-9]")).alias("n_digits"),
        F.regexp_count(text, F.lit(r"[^\w\s]")).alias("n_punct"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, punctuation/digit/stopword ratios.

    Ratios are rounded to 6 decimals so results are engine-portable.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    en_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(F.regexp_count(text, F.lit(r"[^\w\s]")) / safe_chars, 6).alias("punct_ratio"),
        F.round(F.regexp_count(text, F.lit(r"[0-9]")) / safe_chars, 6).alias("digit_ratio"),
        F.round(en_hits / safe_tokens, 6).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct(toks)) / safe_tokens, 6
        ).alias("distinct_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: the language with the most hits wins.

    Deterministic tie-break: higher hit count, then language code.
    Emits (id, lang_pred, hits).
    """
    toks = tokens_col(F.col(text_col))
    hits = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    # array_max on structs orders by first field then second — ties pick
    # the lexicographically largest lang; invert lang for stable "first wins"
    best = F.array_max(F.array(*hits))
    return docs.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 (portable) + xxhash64 (cheap 64-bit)."""
    text = F.col(text_col)
    normalized = F.regexp_replace(F.lower(text), r"\s+", " ")
    return docs.select(
        F.col(id_col),
        F.md5(text).alias("md5"),
        F.md5(normalized).alias("md5_normalized"),
        F.xxhash64(text).alias("xxh64"),
    )
