"""PII detection and redaction for training-data pipelines.

Before text reaches a training corpus, emails / IPs / phone-shaped
strings are counted (corpus auditing) and masked (redaction). Both
operators are pure Catalyst column expressions — ``regexp_count`` /
``regexp_replace`` run JVM-side inside the scan stage with zero
shuffle, so at 100 TB redaction costs one codegen'd pass over the
text column and nothing else.

Pattern portability: every regex below stays inside the common subset
of Java regex (Spark) and RE2 (DuckDB oracle) — character classes,
bounded repetition, ``\\b`` word boundaries; NO lookaround, NO
backreferences. That keeps the operators oracle-checkable and the
redaction manifest reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pattern table: name -> (regex, replacement token). Order matters:
#: emails are redacted before phones so the digits inside an address
#: are never half-masked by a later rule.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("id_number", r"\b\d{9,18}\b", "<ID>"),
)


def pii_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts: one ``n_<kind>`` column per pattern
    plus ``n_pii`` (total). Pure scan-stage expressions."""
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]
    total = None
    for c in [F.regexp_count(text, F.lit(p)) for _, p, _ in PII_PATTERNS]:
        total = c if total is None else total + c
    return docs.select(F.col(id_col), *counts, total.alias("n_pii"))


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with its placeholder token, in the fixed
    ``PII_PATTERNS`` order. All other columns pass through."""
    out = F.col(text_col)
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return docs.withColumn(text_col, out)
