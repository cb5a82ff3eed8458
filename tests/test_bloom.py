"""Portable Bloom filter: no false negatives, bounded FPs, mergeable."""

import hashlib

from pyspark.sql import functions as F

from graphouse_spark.functions.bloom import (
    N_HASHES,
    bloom_build,
    bloom_contains,
    bloom_probe,
)

N_BITS = 1 << 12  # small filter so the FP path is actually exercised


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(F.concat(F.lit("key-"), F.col("id")).alias(name))


def test_no_false_negatives(spark):
    keys = _keys(spark, 0, 500)
    words = bloom_build(keys, "k", n_bits=N_BITS)
    probed = bloom_probe(keys, "k", words, n_bits=N_BITS)
    assert probed.filter(~F.col("is_member")).count() == 0


def test_false_positive_rate_bounded(spark):
    words = bloom_build(_keys(spark, 0, 500), "k", n_bits=N_BITS)
    outside = _keys(spark, 10_000, 12_000)
    fp = bloom_probe(outside, "k", words, n_bits=N_BITS).filter("is_member").count()
    # k=4, n=500, m=4096 -> per-key FP ~ (1-e^(-kn/m))^k ~ 2.4% expected
    assert fp / 2000 < 0.10


def test_merge_is_word_or(spark):
    full = bloom_build(_keys(spark, 0, 400), "k", n_bits=N_BITS)
    h1 = bloom_build(_keys(spark, 0, 200), "k", n_bits=N_BITS)
    h2 = bloom_build(_keys(spark, 200, 400), "k", n_bits=N_BITS)
    assert [a | b for a, b in zip(h1, h2)] == full


def test_bits_match_hashlib(spark):
    """The bit family is the documented md5 formula (portability pin)."""
    words = bloom_build(_keys(spark, 7, 8), "k", n_bits=N_BITS)
    set_bits = {w * 64 + j for w, word in enumerate(words)
                for j in range(64) if word & (1 << j)}
    expect = {int(hashlib.md5(f"b{i}|key-7".encode()).hexdigest()[:8], 16) % N_BITS
              for i in range(N_HASHES)}
    assert set_bits == expect


def test_contains_is_pure_column(spark):
    """Membership works as a filter predicate inside a plain projection."""
    words = bloom_build(_keys(spark, 0, 10), "k", n_bits=N_BITS)
    df = _keys(spark, 0, 20).filter(bloom_contains(F.col("k"), words, N_BITS))
    assert df.count() >= 10  # all members, plus possible FPs
