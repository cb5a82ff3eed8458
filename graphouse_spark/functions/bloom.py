"""Mergeable Bloom-filter membership — set containment at 100 TB.

The canonical pipeline problem: "drop every document whose content
hash appears in this other (huge) corpus" without shuffling the big
side. A Bloom filter is the classic answer: build once over the
reference keys, broadcast the bit array, and membership becomes a
scan-stage expression on the probe side — no join, no shuffle.

Spark already uses injected bloom filters inside join planning; this
module makes the filter a first-class, PORTABLE artifact:

- bits are set by the md5 family
  (:func:`graphouse_spark.functions.dedup.portable_hash32`), so the
  exact same filter (hence the exact same false positives) is
  reproducible in any engine — a DuckDB oracle can replay membership
  bit-for-bit, and a manifest written today verifies next year;
- the build is MERGEABLE: per-partition word fragments combine through
  one ``bit_or`` aggregation keyed on word index (a few thousand rows),
  so 100 TB of keys reduce map-side first — the raw keys never
  concentrate anywhere;
- the probe is pure Column logic over a broadcast literal array:
  whole-stage codegen, zero Python.

Guarantees (property-tested): NO false negatives ever; false-positive
rate ~ (k*n/m)^k — callers size ``n_bits`` for their key count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphouse_spark.functions.dedup import portable_hash32

#: hash-seed prefixes — position i uses md5("b{i}|" + key)
N_HASHES = 4

#: single-bit masks as a literal lookup (shiftleft needs a static shift
#: amount in the Python API; element_at on 64 longs is codegen-friendly
#: and portable). Index j holds 1 << j in two's complement.
_BIT_MASKS = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def _mask(bit_in_word: Column) -> Column:
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    return F.element_at(masks, bit_in_word.cast("int") + 1)


def bloom_bit(key: Column, i: int, n_bits: int) -> Column:
    """Bit index i of ``key``: portable_hash32('b{i}|' || key) % n_bits."""
    return portable_hash32(F.concat(F.lit(f"b{i}|"), key)) % n_bits


def bloom_build(keys: DataFrame, key_col: str, n_bits: int = 1 << 16) -> list[int]:
    """Build the filter over a key column; returns ``n_bits/64`` words.

    Keys explode to their N_HASHES bit positions (flat rows), reduce to
    distinct words via one ``bit_or`` aggregation — partial aggregation
    collapses each partition's contribution to <= n_bits/64 rows before
    the shuffle, so the reduction cost is bounded by the filter size,
    not the key count. The word list (n_bits/8 bytes) collects to the
    driver for broadcast; at 2^16 bits that is 8 KiB.
    """
    key = F.col(key_col).cast("string")
    bits = F.explode(F.array(*[bloom_bit(key, i, n_bits) for i in range(N_HASHES)]))
    words = (
        keys.select(bits.alias("bit"))
        .select((F.col("bit") / 64).cast("int").alias("w"),
                _mask(F.col("bit") % 64).alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["w"]] = r["word"]
    return out


def bloom_contains(key: Column, words: list[int], n_bits: int = 1 << 16) -> Column:
    """Membership as a pure Column expression over the literal word array.

    True iff every one of the key's N_HASHES bits is set. All bitwise
    ops inside codegen; the array literal broadcasts with the plan.
    """
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for i in range(N_HASHES):
        bit = bloom_bit(key, i, n_bits)
        word = F.element_at(arr, (bit / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_mask(bit % 64)) != 0)
    return cond


def bloom_probe(df: DataFrame, key_col: str, words: list[int],
                n_bits: int = 1 << 16, out_col: str = "is_member") -> DataFrame:
    """Tag each row with Bloom membership of ``key_col`` (scan-stage)."""
    return df.withColumn(
        out_col, bloom_contains(F.col(key_col).cast("string"), words, n_bits)
    )
