"""ClickHouse aggregate-combinator family: sumMap, topK, groupArraySample.

The reference hands all aggregation to ClickHouse, whose signature
"combinator" aggregates have no direct Spark builtin:

- ``sumMap(keys, values)`` — key-wise sum of maps per group
  (``https://clickhouse.com/docs/sql-reference/aggregate-functions``,
  used for per-label counter maps). Re-expressed Spark-first in
  :func:`sum_map`: explode -> two-level groupBy (both shuffles hash on
  a superset of the same key, and the first agg gets full map-side
  partial aggregation) -> re-collect sorted key/value arrays. No map
  objects travel through the shuffle, only flat rows.
- ``topK(k)`` — approximate heavy hitters with bounded memory.
  :func:`approx_top_k` keeps a bounded per-partition candidate summary
  (mapInPandas, capacity ``reserve``), then merges summaries in ONE
  final aggregation. For any key whose true count exceeds N/reserve
  the SpaceSaving-style guarantee holds: it appears in some partition
  summary, and the merged estimate is within the summed per-partition
  truncation error. With ``reserve`` >= per-partition distinct keys the
  result is EXACT — the oracle query pins that regime.
- ``groupArraySample(n)`` — fixed-size per-group sample.
  :func:`sample_per_group` is the deterministic analog: the n smallest
  rows per group by a portable md5 order (a seeded uniform permutation,
  reproducible across engines and retries — CH's reservoir is RNG-based
  and not reproducible, which a training-data pipeline cannot accept).
  One window rank over one shuffle; no collect_list blow-up for hot
  groups.

All three are mergeable partial-aggregation shapes: at 100 TB each is
a single hash-shuffle whose map side pre-combines (sum_map, topk) or a
single range-free window (sample), never a driver-side loop.

Round-2 additions re-express more of the CH aggregate catalog:
``entropy`` (:func:`shannon_entropy`), ``deltaSum`` (:func:`delta_sum`),
``anyHeavy``/``topK(1)`` finalized (:func:`mode_per_group`),
``bitmapAndCardinality`` over every group pair
(:func:`common_id_cardinality`), and ``arrayCumSum``/``arrayDifference``
flattened (:func:`array_cum_diff`) — same design rule: flat rows through
hash shuffles, no per-group collections, window sorts only where the
semantics are inherently ordered.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sum_map(df: DataFrame, group_cols: list[str], key_col: str,
            value_col) -> DataFrame:
    """CH ``sumMap``: per group, key-wise sums as aligned sorted arrays.

    ``value_col`` may be a column name or a Column expression (pass an
    integer-unit expression for float-exact cross-engine sums). Output:
    ``group_cols + [keys: array, vals: array]`` with entries sorted by
    key, so downstream ``map_from_arrays(keys, vals)`` is canonical.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    per_key = (
        df.groupBy(*group_cols, F.col(key_col).alias("__k"))
        .agg(F.sum(val).alias("__v"))
    )
    pairs = F.sort_array(F.collect_list(F.struct("__k", "__v")))
    return (
        per_key.groupBy(*group_cols)
        .agg(
            F.transform(pairs, lambda p: p["__k"]).alias("keys"),
            F.transform(pairs, lambda p: p["__v"]).alias("vals"),
        )
    )


def approx_top_k(df: DataFrame, key_col: str, k: int,
                 reserve: int = 4096) -> DataFrame:
    """CH ``topK(k)``: heavy hitters with bounded per-partition state.

    Phase 1 (mapInPandas): each partition emits at most ``reserve``
    candidate rows ``(key, partial_count, error)`` — its top ``reserve``
    keys by local count, plus the truncation bound (the largest dropped
    count) attached so the merge can report estimate uncertainty.
    Phase 2: one groupBy over candidates sums counts and errors; the
    global top ``k`` by (estimate desc, key asc) is returned with its
    worst-case undercount ``max_error``.

    Memory is O(reserve) per partition regardless of key cardinality —
    the point of topK versus an exact groupBy at 100 TB, where the
    distinct-key shuffle dominates. When every partition holds fewer
    than ``reserve`` distinct keys the errors are all zero and the
    output is exact.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    out_schema = f"`{key_col}` string, cnt long, err long"

    def summarize(batches):
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[key_col].astype(str).value_counts().to_dict())
        if not counts:
            return
        ranked = counts.most_common()
        kept, dropped = ranked[:reserve], ranked[reserve:]
        err = dropped[0][1] if dropped else 0
        import pandas as pd

        yield pd.DataFrame(
            {key_col: [x for x, _ in kept],
             "cnt": [c for _, c in kept],
             "err": [err] * len(kept)}
        )

    cand = df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, schema=out_schema
    )
    merged = cand.groupBy(key_col).agg(
        F.sum("cnt").alias("est_count"), F.sum("err").alias("max_error")
    )
    return (
        merged.orderBy(F.col("est_count").desc(), F.col(key_col).asc())
        .limit(k)
    )


def shannon_entropy(df: DataFrame, group_cols: list[str],
                    key_col: str) -> DataFrame:
    """CH ``entropy(key)``: Shannon entropy (bits) of the key
    distribution per group.

    Two chained hash aggregations on a shared key prefix — the first
    gets full map-side partial aggregation, so no raw rows cross the
    second shuffle. The float math is arranged as
    ``(ln(N) - sum(c*ln(c))/N) / ln(2)`` so an SQL oracle can evaluate
    the same expression tree over the same integer counts.

    Accumulation follows this module's exact-integer rule: each
    per-key term ``c*ln(c)`` is rounded once to integer NANO-units and
    summed as decimal(38,0), so the result is bit-stable under any
    partition order / parallelism (a float sum drifted in the 6th
    decimal run-to-run — the same failure mode the LM scores fixed).
    The only residual cross-engine surface is libm's ln at one ulp,
    deterministic per input, and the nano quantum keeps it far below
    the 6-decimal rounding oracles use.
    """
    per_key = (
        df.groupBy(*group_cols, F.col(key_col).alias("__k"))
        .agg(F.count("*").alias("__c"))
    )
    term_nano = F.round(
        F.col("__c").cast("double") * F.log(F.col("__c").cast("double")) * 1e9
    ).cast("decimal(38,0)")
    return (
        per_key.groupBy(*group_cols)
        .agg(F.sum("__c").alias("__n"),
             F.sum(term_nano).alias("__clnc_nano"))
        .select(
            *group_cols,
            ((F.log(F.col("__n").cast("double"))
              - F.col("__clnc_nano").cast("double") / 1e9 / F.col("__n"))
             / F.lit(math.log(2.0))).alias("entropy_bits"),
        )
    )


def delta_sum(df: DataFrame, group_cols: list[str], order_cols: list[str],
              value_col) -> DataFrame:
    """CH ``deltaSum(value)``: per group, the sum of positive deltas of
    the time-ordered value sequence (counter-increase extraction).

    One window shuffle; the lag and the conditional sum stay inside
    whole-stage codegen. Pass an integer-unit value expression for an
    exact cross-engine result.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    d = val - F.lag(val).over(w)
    return (
        df.select(*group_cols, d.alias("__d"))
        .groupBy(*group_cols)
        .agg(F.sum(F.when(F.col("__d") > 0, F.col("__d")).otherwise(F.lit(0))).alias("delta_sum"))
    )


def mode_per_group(df: DataFrame, group_cols: list[str],
                   key_col: str) -> DataFrame:
    """CH ``anyHeavy``/``topK(1)`` finalized: the modal key per group,
    ties broken deterministically (count desc, key asc).

    Count-then-max_by: two aggregations hashing on a shared prefix, no
    window sort. The struct comparator encodes the tie-break order, so
    the result is reproducible across engines and partition layouts.
    """
    per_key = (
        df.groupBy(*group_cols, F.col(key_col).alias("mode_key"))
        .agg(F.count("*").alias("__c"))
    )
    mx = per_key.groupBy(*group_cols).agg(F.max("__c").alias("__mx"))
    return (
        per_key.join(mx, group_cols)
        .filter(F.col("__c") == F.col("__mx"))
        .groupBy(*group_cols)
        .agg(F.min("mode_key").alias("mode_key"), F.max("__c").alias("mode_count"))
    )


def common_id_cardinality(df: DataFrame, group_col: str,
                          id_col: str) -> DataFrame:
    """CH ``bitmapAndCardinality(groupBitmap(a), groupBitmap(b))`` for
    every pair of group values: |ids(a) ∩ ids(b)|, a < b.

    Spark-first shape: instead of materializing per-group bitmaps, the
    distinct (group, id) pairs self-join on id — the shuffle carries
    each id once per group it appears in (exactly the bitmap's
    information content), and the pair counts fall out of one hash
    aggregation. Hot ids fan out quadratically only in their own group
    count, and AQE skew-split handles the heavy ones at scale.
    """
    pairs = df.select(F.col(group_col).alias("g"), F.col(id_col).alias("i")).distinct()
    a, b = pairs.alias("a"), pairs.alias("b")
    return (
        a.join(b, (F.col("a.i") == F.col("b.i")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("g1"), F.col("b.g").alias("g2"))
        .agg(F.count("*").alias("common_ids"))
    )


def array_cum_diff(df: DataFrame, group_cols: list[str], order_cols: list[str],
                   value_col) -> DataFrame:
    """CH ``arrayCumSum`` + ``arrayDifference`` over the per-group
    time-ordered value sequence, emitted flat as
    ``group_cols + (idx, val, cum, diff)`` (1-based idx).

    Flat rows instead of materialized arrays: a hot group's sequence
    never has to fit in one task's memory, and the window sort is the
    only shuffle. ``diff`` is null for idx=1 (CH emits 0 there; null
    keeps the lag semantics explicit — callers coalesce if they want
    CH's exact output).
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.select(
        *group_cols,
        F.row_number().over(w).alias("idx"),
        val.alias("val"),
        F.sum(val).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        (val - F.lag(val).over(w)).alias("diff"),
    )


def sample_per_group(df: DataFrame, group_cols: list[str], id_col: str,
                     n: int, seed: str = "gh") -> DataFrame:
    """CH ``groupArraySample(n)`` made deterministic: per group, the n
    rows whose ``md5(seed || id)`` sorts smallest — a reproducible
    uniform draw (md5 is a fixed permutation of the id space, so every
    engine, retry, and partition layout picks the same rows).

    Returns the sampled input rows plus ``sample_rank`` (1-based).
    One shuffle (window partition); no per-group materialized list.
    """
    order = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


# ---------------------------------------------------------------------------
# Round 3 additions: LIMIT BY, bit aggregates, exact higher moments,
# interval sweeps, integer-exact histograms, weighted heavy hitters
# ---------------------------------------------------------------------------

def limit_by(df: DataFrame, group_cols: list[str], order_cols: list,
             n: int) -> DataFrame:
    """CH ``LIMIT n BY key``: the first n rows per key in the given
    order — the per-key twin of LIMIT.

    One window rank over one shuffle. Unlike a global
    orderBy().limit(), the partition key bounds each task's heap, so
    hot keys cost n rows each, never a global sort. ``order_cols``
    must be a deterministic total order (add a tiebreaker column) or
    the result is ambiguous — CH has the same caveat.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def group_bit_ops(df: DataFrame, group_cols: list[str],
                  value_col: str) -> DataFrame:
    """CH ``groupBitAnd / groupBitOr / groupBitXor`` in one pass.

    Spark has bit_and/bit_or/bit_xor builtins (partial+final, exact on
    integers) — the only work is surfacing all three together the way
    CH dashboards use them (feature-flag masks, permission bits).
    """
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.bit_and(v).alias("bits_and"),
        F.bit_or(v).alias("bits_or"),
        F.bit_xor(v).alias("bits_xor"),
    )


def moment_stats(df: DataFrame, group_cols: list[str], value_col: str,
                 decimals: int = 2) -> DataFrame:
    """CH ``skewPop`` / ``kurtPop``: population skewness and kurtosis
    from EXACT integer power sums.

    Values are scaled to integer units (10^decimals) and S1..S4
    accumulate as decimal(38,0) — associative, so bit-identical on any
    engine/partitioning; only the final scalar formula runs in floats.
    Spark's builtin skewness/kurtosis stream float moments in data
    order and cannot be oracled exactly. One partial+final agg.
    """
    unit = float(10 ** decimals)
    x = F.round(F.col(value_col) * unit).cast("decimal(38,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("__n"),
        F.sum(x).cast("double").alias("__s1"),
        F.sum(x * x).cast("double").alias("__s2"),
        F.sum(x * x * x).cast("double").alias("__s3"),
        F.sum(x * x * x * x).cast("double").alias("__s4"),
    )
    n = F.col("__n").cast("double")
    m1 = F.col("__s1") / n / unit
    m2 = F.col("__s2") / n / (unit ** 2)
    m3 = F.col("__s3") / n / (unit ** 3)
    m4 = F.col("__s4") / n / (unit ** 4)
    var = m2 - m1 * m1
    mu3 = m3 - 3 * m1 * m2 + 2 * m1 ** 3
    mu4 = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 ** 4
    return agg.select(
        *group_cols,
        F.col("__n").alias("n"),
        F.round(F.when(var > 0, mu3 / F.pow(var, 1.5)), 6).alias("skew_pop"),
        F.round(F.when(var > 0, mu4 / (var * var)), 6).alias("kurt_pop"),
    )


def corr_stats(df: DataFrame, group_cols: list[str], x_col: str, y_col: str,
               x_decimals: int = 2, y_decimals: int = 0) -> DataFrame:
    """CH ``corr`` / ``covarPop`` from exact integer cross-moments —
    same discipline as :func:`moment_stats`: decimal(38,0) sums of
    scaled integers, float math only on the five final scalars."""
    ux, uy = float(10 ** x_decimals), float(10 ** y_decimals)
    x = F.round(F.col(x_col) * ux).cast("decimal(38,0)")
    y = F.round(F.col(y_col) * uy).cast("decimal(38,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(y).cast("double").alias("__sy"),
        F.sum(x * x).cast("double").alias("__sxx"),
        F.sum(y * y).cast("double").alias("__syy"),
        F.sum(x * y).cast("double").alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    cov = (F.col("__sxy") / n - F.col("__sx") * F.col("__sy") / (n * n)) / (ux * uy)
    vx = (F.col("__sxx") / n - (F.col("__sx") / n) ** 2) / (ux * ux)
    vy = (F.col("__syy") / n - (F.col("__sy") / n) ** 2) / (uy * uy)
    return agg.select(
        *group_cols,
        F.col("__n").alias("n"),
        F.round(cov, 6).alias("covar_pop"),
        F.round(F.when(vx * vy > 0, cov / F.sqrt(vx * vy)), 6).alias("corr"),
    )


def max_intersections(df: DataFrame, group_cols: list[str],
                      start_col: str, end_col: str) -> DataFrame:
    """CH ``maxIntersections`` / ``maxIntersectionsPosition``: the peak
    number of simultaneously-open ``[start, end)`` intervals per group,
    and the earliest position where the peak occurs.

    Sweep line as a window cumsum: each interval explodes to (+1 at
    start, -1 at end); boundaries order by (pos, delta) so an end at
    the same position closes BEFORE a start opens (half-open
    semantics). One explode + one window + one final agg."""
    deltas = F.array(
        F.struct(F.col(start_col).cast("long").alias("pos"), F.lit(1).alias("delta")),
        F.struct(F.col(end_col).cast("long").alias("pos"), F.lit(-1).alias("delta")),
    )
    exploded = df.select(*group_cols, F.explode(deltas).alias("b")).select(
        *group_cols, F.col("b.pos").alias("pos"), F.col("b.delta").alias("delta")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("pos", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = exploded.withColumn("open", F.sum("delta").over(w))
    return swept.groupBy(*group_cols).agg(
        F.max("open").alias("max_intersections"),
        F.min_by("pos", F.struct(F.col("open") * -1, F.col("pos"))).alias(
            "max_position"
        ),
    )


def interval_length_sum(df: DataFrame, group_cols: list[str],
                        start_col: str, end_col: str) -> DataFrame:
    """CH ``intervalLengthSum``: total length of the UNION of possibly
    overlapping ``[start, end)`` intervals per group.

    Gaps-and-islands without a self-join: running max of prior ends
    (one window), each interval contributes max(0, end - max(start,
    running_end)). Exact integer arithmetic throughout."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(start_col), F.col(end_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_end = F.max(F.col(end_col).cast("long")).over(w)
    covered_from = F.greatest(
        F.col(start_col).cast("long"), F.coalesce(prior_end, F.lit(None))
    )
    contrib = F.greatest(F.col(end_col).cast("long") - covered_from, F.lit(0))
    return (
        df.withColumn("__c", contrib)
        .groupBy(*group_cols)
        .agg(F.sum("__c").alias("union_length"),
             F.count(F.lit(1)).alias("n_intervals"))
    )


def histogram_fixed(df: DataFrame, group_cols: list[str], value_col: str,
                    n_bins: int, decimals: int = 2) -> DataFrame:
    """CH ``histogram(n)`` re-expressed with DETERMINISTIC fixed-width
    bins (CH's adaptive bins depend on row order — unreproducible, so
    a pipeline gate can't use them).

    Bin edges come from per-group min/max computed in INTEGER units, and
    the bin index is pure integer math — floor((v-min)*n / span) with a
    top clamp — so the histogram is bit-identical on any engine. Two
    chained aggs on a shared key prefix (bounds then counts), both with
    map-side partials; the bounds side broadcasts back."""
    unit = 10 ** decimals
    x = F.round(F.col(value_col) * unit).cast("long")
    tagged = df.select(*group_cols, x.alias("__x"))
    bounds = tagged.groupBy(*group_cols).agg(
        F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
    )
    joined = tagged.join(F.broadcast(bounds), group_cols)
    # integer division, never float-then-cast: double rounding behavior
    # differs across engines (truncate vs round-half-even) right at bin
    # boundaries, which is exactly where histogram bins live
    bin_idx = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.expr(f"((__x - __lo) * {n_bins}) div (__hi - __lo + 1)"),
    )
    return (
        joined.withColumn("bin", bin_idx.cast("int"))
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("__x") / float(unit)).alias("bin_min"),
            (F.max("__x") / float(unit)).alias("bin_max"),
        )
    )


def min_max_map(df: DataFrame, group_cols: list[str], key_col: str,
                value_col: str) -> DataFrame:
    """CH ``minMap/maxMap``: key-wise min/max per group as aligned
    sorted arrays — the order-insensitive siblings of :func:`sum_map`,
    same flat-row two-level agg shape."""
    per_key = (
        df.groupBy(*group_cols, F.col(key_col).alias("__k"))
        .agg(F.min(value_col).alias("__mn"), F.max(value_col).alias("__mx"))
    )
    pairs = F.sort_array(F.collect_list(F.struct("__k", "__mn", "__mx")))
    return (
        per_key.groupBy(*group_cols)
        .agg(
            F.transform(pairs, lambda p: p["__k"]).alias("keys"),
            F.transform(pairs, lambda p: p["__mn"]).alias("min_vals"),
            F.transform(pairs, lambda p: p["__mx"]).alias("max_vals"),
        )
    )


def top_k_weighted(df: DataFrame, key_col: str, weight_col, k: int,
                   group_cols: list[str] | None = None) -> DataFrame:
    """CH ``topKWeighted(k)(key, weight)``, exact: keys ranked by summed
    weight (ties broken by key asc for determinism).

    Global form plans TakeOrderedAndProject (per-partition heaps, no
    single-task sort); grouped form is one bounded window rank.
    ``weight_col`` may be an expression — pass integer units for
    cross-engine-exact totals."""
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    gcols = group_cols or []
    totals = df.groupBy(*gcols, key_col).agg(F.sum(wcol).alias("total_weight"))
    if not gcols:
        return totals.orderBy(F.desc("total_weight"), F.asc(key_col)).limit(k)
    w = Window.partitionBy(*gcols).orderBy(F.desc("total_weight"), F.asc(key_col))
    return (
        totals.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def group_array_moving(df: DataFrame, group_cols: list[str], order_cols: list,
                       value_col, window_points: int) -> DataFrame:
    """CH ``groupArrayMovingSum/MovingAvg(k)`` flattened to rows: per
    group in the given order, the k-point trailing sum and mean.

    One window shuffle, both stats from the same ROWS frame. Pass an
    integer-unit value expression for cross-engine-exact sums (the avg
    divides the exact sum by the window's actual row count, so heads of
    series shorter than k stay exact too)."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    w = (
        Window.partitionBy(*group_cols).orderBy(*order_cols)
        .rowsBetween(-(window_points - 1), Window.currentRow)
    )
    return df.select(
        *group_cols, *[c if isinstance(c, str) else c for c in order_cols],
        F.sum(val).over(w).alias("moving_sum"),
        (F.sum(val).over(w) / F.count(F.lit(1)).over(w)).alias("moving_avg_units"),
    )


def weighted_quantiles(df: DataFrame, group_cols: list[str], value_col: str,
                       weight_col, ps: list[float]) -> DataFrame:
    """CH ``quantileExactWeighted(p)(x, w)``: exact interpolated
    quantiles where each row counts ``w`` times.

    Built-in ``percentile(x, p, frequency)`` — the JVM aggregate holds
    (value -> weight) pairs, so memory tracks DISTINCT values per
    group, not total weight; identical semantics to replicating each
    row w times without the blow-up. Emits one ``q_<p>`` column per
    requested quantile plus the total weight.
    """
    w = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    arr = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in ps]), w)
    aggs = [F.round(arr[i], 6).alias(f"q_{str(p).replace('.', '_')}")
            for i, p in enumerate(ps)]
    return df.groupBy(*group_cols).agg(*aggs, F.sum(w).alias("total_weight"))
