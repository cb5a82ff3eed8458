"""Deterministic (hash-based) sampling — the training-pipeline staple.

``df.sample()`` draws a DIFFERENT subset every run (and every retry of
a failed task unless the seed plumbing is perfect); production data
pipelines instead sample by content hash so that

- the decision for a given record never changes across runs, engines,
  or cluster sizes (reproducible experiments, stable eval splits),
- adding data never flips the membership of existing records,
- upstream and downstream jobs agree on the split without coordination.

Everything here keys off the portable md5 family
(:func:`graphouse_spark.functions.dedup.portable_hash32`), so the
exact sample is DuckDB-oracle-checkable and survives an engine swap.
All pure Column expressions — sampling happens inside the scan stage,
no shuffle, and the filter prunes before any downstream join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphouse_spark.functions.dedup import portable_hash32

#: hash-space denominator: rates quantize to 0.01% steps
_BUCKETS = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000) from the record id + salt."""
    return portable_hash32(F.concat(F.lit(salt), id_col.cast("string"))) % _BUCKETS


def hash_sample(df: DataFrame, id_col: str, rate: float, salt: str = "") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by id hash.

    ``salt`` decorrelates independent samples over the same ids (two
    different salts give two independent subsets).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_bucket(F.col(id_col), salt) < int(rate * _BUCKETS))


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           rates: dict[str, float], default_rate: float = 0.0,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample a dominant
    source while keeping all of a rare one).

    ``rates`` maps stratum value -> keep fraction; unlisted strata get
    ``default_rate``. The rate table enters the plan as a CASE
    expression (a handful of literals), so the filter still sits in
    the scan stage — no join, no shuffle.
    """
    threshold: Column = F.lit(int(default_rate * _BUCKETS))
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0, 1], got {rate}")
        threshold = F.when(F.col(strata_col) == value, F.lit(int(rate * _BUCKETS))).otherwise(threshold)
    return df.filter(_bucket(F.col(id_col), salt) < threshold)


def split_train_eval(df: DataFrame, id_col: str, eval_fraction: float = 0.01,
                     salt: str = "split") -> DataFrame:
    """Add a stable ``split`` column ('train' / 'eval').

    The id hash decides membership, so a record's split never changes
    as the corpus grows — the property that keeps eval sets
    uncontaminated across dataset versions.
    """
    if not 0.0 < eval_fraction < 1.0:
        raise ValueError(f"eval_fraction must be in (0, 1), got {eval_fraction}")
    is_eval = _bucket(F.col(id_col), salt) < int(eval_fraction * _BUCKETS)
    return df.withColumn("split", F.when(is_eval, F.lit("eval")).otherwise(F.lit("train")))


def resample_to_mix(df: DataFrame, id_col: str, source_col: str,
                    target_weights: dict[str, float], salt: str = "mix") -> DataFrame:
    """Downsample so the kept corpus matches a target source mix.

    ``target_weights`` maps source -> desired proportion (normalized
    internally). The largest feasible total without upsampling is
    ``T = min_s(n_s / w_s)``; each source keeps ``w_s * T / n_s`` of
    its rows by content hash. Sources absent from the weights map are
    dropped (weight 0).

    Shape at scale: one tiny per-source count aggregation, threshold
    arithmetic on that handful of rows, then a broadcast join + scan-
    stage hash filter over the corpus — the big side is never
    shuffled. Thresholds are INTEGER bucket cutoffs (rate quantized to
    1/10000), so the boundary behaves identically in any engine.
    """
    if not target_weights:
        raise ValueError("target_weights must not be empty")
    total_w = sum(target_weights.values())
    if total_w <= 0:
        raise ValueError("target weights must sum to a positive value")

    weights = df.sparkSession.createDataFrame(
        [(s, w / total_w) for s, w in sorted(target_weights.items())],
        f"{source_col} string, _w double",
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    joined = counts.join(weights, source_col)  # inner: unlisted sources drop
    t_max = joined.agg(F.min(F.col("_n") / F.col("_w")).alias("_t"))
    thresholds = joined.crossJoin(t_max).select(
        source_col,
        F.floor(F.col("_w") * F.col("_t") / F.col("_n") * _BUCKETS).cast("int").alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(_bucket(F.col(id_col), salt) < F.col("_thr"))
        .drop("_thr")
    )


def dsir_log_ratio_table(buckets: int = 1024, salt: str = "dsir") -> list[int]:
    """The per-bucket log-importance-ratio table for :func:`dsir_weights`,
    in integer milli-units.

    In real DSIR (Xie et al. 2023) this table is log(p_target(b) /
    p_raw(b)) from two hashed-n-gram bag-of-words models; the container
    has no corpora to fit, so the STUB maps each bucket to a
    deterministic md5-derived value in [-1.000, 1.000] — the Spark-side
    plumbing (feature hashing, exact integer accumulation, top-m
    selection) is the real thing and the table is one `lit` array swap
    away from fitted ratios. md5-derived so a SQL oracle regenerates the
    identical table.
    """
    import hashlib

    out = []
    for b in range(buckets):
        h = hashlib.md5(f"{salt}-{b}".encode()).hexdigest()
        out.append(int(h[:8], 16) % 2001 - 1000)
    return out


def dsir_weights(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 buckets: int = 1024, salt: str = "dsir") -> DataFrame:
    """DSIR (Data Selection with Importance Resampling) weights: each
    document's importance is the sum of its tokens' hashed-bucket
    log-ratios.

    Spark-first shape: the ratio table rides along as a broadcast
    literal array, each token costs one md5 + one element_at inside a
    single fold — no explode, no join, no Python. Weights accumulate in
    exact integer milli-units (floats would make the sum order-
    dependent), so selection is reproducible anywhere.

    Returns (id, weight_milli). Resample = take the top-m by
    (weight desc, id) or hash-threshold against the weight.
    """
    table = F.array(*[F.lit(v) for v in dsir_log_ratio_table(buckets, salt)])
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    bucket = lambda t: portable_hash32(t) % buckets  # noqa: E731
    weight = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(table, (bucket(t) + 1).cast("int")).cast("long"),
    )
    return docs.select(F.col(id_col), weight.alias("weight_milli"))
