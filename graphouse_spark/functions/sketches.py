"""Mergeable sketch tables: store partial sketches, merge later.

At 100 TB the rollup problem is not computing a day's distinct count —
it is answering "distinct users last quarter" WITHOUT re-scanning a
quarter of raw events. The pattern (same as the reference's
AggregatingMergeTree-style rollups, re-expressed Spark-first) is a
sketch TABLE: one row per (group, day) holding a binary DataSketches
HLL sketch; any coarser window is an ``hll_union_agg`` over the stored
sketches — partial+final agg over kilobyte blobs, raw data untouched.

Union of sketches is exactly associative: merging daily sketches gives
the SAME estimate as sketching the raw week directly (tested), so the
rollup chain day -> week -> quarter never loses more accuracy than the
base sketch did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sketch_table(events_sec: DataFrame, bucket_seconds: int = 86400,
                      lg_k: int = 12, ts_col: str = "ts_sec",
                      user_col: str = "user_id") -> DataFrame:
    """(bucket_ts, user_sketch, n_events): the stored daily partials."""
    bucket = (F.col(ts_col) - F.col(ts_col) % bucket_seconds).alias("bucket_ts")
    return events_sec.groupBy(bucket).agg(
        F.hll_sketch_agg(user_col, F.lit(lg_k)).alias("user_sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rollup_sketches(sketch_table: DataFrame, coarse_seconds: int,
                    bucket_col: str = "bucket_ts",
                    sketch_col: str = "user_sketch") -> DataFrame:
    """Merge stored fine sketches into coarser windows — no raw re-scan."""
    coarse = (F.col(bucket_col) - F.col(bucket_col) % coarse_seconds).alias("window_ts")
    return sketch_table.groupBy(coarse).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).cast("long").alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    )


def quantile_sketch_table(df: DataFrame, group_cols: list[str],
                          value_col: str = "value",
                          mantissa_bits: int = 7) -> DataFrame:
    """Mergeable quantile sketch: CH ``quantileBFloat16`` re-expressed.

    Each value is quantized to a float with ``mantissa_bits`` of
    mantissa (bfloat16 keeps 7): q = round(v / 2^e * 2^m) / 2^m * 2^e
    with e = floor(log2(|v|)). Per (group, q) counts are the sketch —
    a few hundred distinct rows per group regardless of input size,
    relative error <= 2^-(m+1) per value. Counts are plain integers, so
    sketches MERGE EXACTLY: sum counts per q. Day -> week -> quarter
    rollup is one sum, raw data untouched (same discipline as the HLL
    table above).
    """
    v = F.col(value_col).cast("double")
    scale = float(1 << mantissa_bits)
    e = F.floor(F.log2(F.abs(v)))
    q = F.when(v == 0.0, F.lit(0.0)).otherwise(
        F.signum(v)
        * F.round(F.abs(v) / F.pow(F.lit(2.0), e) * scale)
        / scale
        * F.pow(F.lit(2.0), e)
    )
    return (
        df.groupBy(*group_cols, q.alias("q"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_sketch_table_cents(df: DataFrame, group_cols: list[str],
                                cents_col: str = "cents",
                                mantissa_bits: int = 7) -> DataFrame:
    """Integer-exact variant of :func:`quantile_sketch_table` for
    fixed-point (cents) values: keep the top ``mantissa_bits + 1``
    bits of |c| with round-half-up, all in integer shifts — no float
    log/pow anywhere, so the quantization is bit-identical in ANY
    engine (the DuckDB oracle replays it with ``<<``/``>>``). Same
    mergeability: per (group, q) counts, sums merge exactly; relative
    error <= 2^-(mantissa_bits+1) per value.
    """
    c = F.col(cents_col).cast("long")
    ac = F.abs(c)
    # exact bit length via the binary string — no float log2
    bits = F.length(F.bin(ac))
    s = F.greatest(bits - (mantissa_bits + 1), F.lit(0))
    base = df.select(*group_cols, c.alias("_c"), ac.alias("_ac"), s.alias("_s"))
    # python-side F.shiftleft only takes literal shift counts; the SQL
    # form takes a column shift amount
    rounded = F.expr(
        "shiftleft(shiftright(_ac + shiftleft(CAST(1 AS BIGINT), _s - 1), _s), _s)"
    )
    q = F.when(F.col("_c") == 0, F.lit(0).cast("long")).otherwise(
        F.signum("_c").cast("long")
        * F.when(F.col("_s") == 0, F.col("_ac")).otherwise(rounded)
    )
    return (
        base.groupBy(*group_cols, q.alias("q"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_quantile_sketches(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold finer sketch rows into coarser groups — exact (integer sums)."""
    return sketches.groupBy(*group_cols, "q").agg(F.sum("cnt").alias("cnt"))


def sketch_quantiles(sketches: DataFrame, group_cols: list[str],
                     ps: list[float]) -> DataFrame:
    """Quantiles from a sketch table: per group, the smallest quantized
    value whose cumulative count reaches p * total (the standard
    lower-quantile rule, matching ``percentile_disc`` up to the
    quantization error). One window pass over the tiny sketch rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("q") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy(*group_cols)
    cum = sketches.select(
        *group_cols, "q",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    # ALL quantiles in one aggregation (a conditional min per p), then
    # stack wide -> long: the groupBy keys equal the window partition
    # keys, so no second shuffle — versus one shuffle per p when each
    # quantile filters and re-aggregates separately.
    wide = cum.groupBy(*group_cols).agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.ceil(F.col("total") * p), F.col("q"))
            ).alias(f"_q{i}")
            for i, p in enumerate(ps)
        ]
    )
    stack_args = ", ".join(
        f"CAST({p!r} AS DOUBLE), _q{i}" for i, p in enumerate(ps)
    )
    return wide.selectExpr(
        *group_cols, f"stack({len(ps)}, {stack_args}) AS (p, value)"
    )


def sketch_quantiles_compact(sketches: DataFrame, group_cols: list[str],
                             ps: list[float]) -> DataFrame:
    """Quantile read in ONE groupBy — no window shuffle: collect each
    group's sketch rows into a q-sorted array and fold once for all
    quantiles. Correct even on UNMERGED partials (duplicate q across
    days sort adjacent, and the running cumulative sum crosses the
    threshold at the same q either way), so day-level partials can be
    read directly: shuffle count 2 (partial agg + this) instead of 3
    (merge + window + agg). The array is bounded by #partial-buckets x
    distinct-q (~2^(mantissa+1) x exponent range) per group, never by
    input rows; at very long retention pre-merge with
    :func:`merge_quantile_sketches` first — tests pin both paths equal.
    The fold is an interpreted HOF but runs over that bounded array,
    and is evaluated ONCE into a column (HOF lambdas get no CSE).
    """
    g = sketches.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("q", "cnt"))).alias("_sk")
    )
    total = F.aggregate(
        "_sk", F.lit(0).cast("long"), lambda a, x: a + x["cnt"]
    )
    g = g.select(*group_cols, "_sk", total.alias("_total"))
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        *[F.lit(None).cast(sketches.schema["q"].dataType).alias(f"q{i}")
          for i in range(len(ps))],
    )

    def step(a, x):
        cum = a["cum"] + x["cnt"]
        fields = [cum.alias("cum")]
        for i, p in enumerate(ps):
            fields.append(
                F.coalesce(
                    a[f"q{i}"],
                    F.when(cum >= F.ceil(F.col("_total") * F.lit(float(p))), x["q"]),
                ).alias(f"q{i}")
            )
        return F.struct(*fields)

    st = F.aggregate("_sk", zero, step)
    g = g.select(*group_cols, st.alias("_st"))
    stack_args = ", ".join(
        f"CAST({p!r} AS DOUBLE), _st.q{i}" for i, p in enumerate(ps)
    )
    return g.selectExpr(
        *group_cols, f"stack({len(ps)}, {stack_args}) AS (p, value)"
    )


def audience_overlap(events_sec: DataFrame, type_a: str, type_b: str,
                     lg_k: int = 12, type_col: str = "event_type",
                     user_col: str = "user_id") -> DataFrame:
    """Approximate audience intersection |A ∩ B| by inclusion-exclusion
    over mergeable HLL sketches: |A| + |B| − |A ∪ B|.

    The pattern behind "users who did X AND Y" at 100 TB: per-segment
    sketches are kilobyte blobs maintained incrementally (one pass,
    map-side partial agg); the union merges the SAME stored sketches —
    no raw re-scan, no join on user id. Inclusion-exclusion amplifies
    relative error when the overlap is small vs the union — the exact
    twin columns make that error measurable in-plan, and the output
    clamps at 0 (the estimate can go slightly negative).

    One row: approx |A|, |B|, |A ∪ B|, the derived intersection
    estimate, and the exact counterparts for bound checking.
    """
    a = F.col(type_col) == type_a
    b = F.col(type_col) == type_b
    interested = events_sec.filter(a | b)
    agg = interested.agg(
        F.hll_sketch_agg(F.when(a, F.col(user_col)), F.lit(lg_k)).alias("_sa"),
        F.hll_sketch_agg(F.when(b, F.col(user_col)), F.lit(lg_k)).alias("_sb"),
        F.hll_sketch_agg(F.col(user_col), F.lit(lg_k)).alias("_su"),
        F.count_distinct(F.when(a, F.col(user_col))).alias("exact_a"),
        F.count_distinct(F.when(b, F.col(user_col))).alias("exact_b"),
        F.count_distinct(F.col(user_col)).alias("exact_union"),
    )
    ea = F.hll_sketch_estimate("_sa")
    eb = F.hll_sketch_estimate("_sb")
    eu = F.hll_sketch_estimate("_su")
    inter = F.greatest(F.round(ea + eb - eu).cast("long"), F.lit(0).cast("long"))
    return agg.select(
        F.round(ea).cast("long").alias("approx_a"),
        F.round(eb).cast("long").alias("approx_b"),
        F.round(eu).cast("long").alias("approx_union"),
        inter.alias("approx_intersection"),
        "exact_a", "exact_b", "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias("exact_intersection"),
    )
