"""Watermarked streaming window aggregation — the streaming-rollup path.

The batch engine rolls up lazily (read-time A2 + compaction A7). An
alternative the reference cannot express — and SURVEY §2.9 T2 asks us
to provide *with its divergence documented* — is a streaming tumbling
aggregate that materializes buckets as data arrives:

    parsed -> event-time watermark -> window(step) -> agg -> sink

DIVERGENCE from the reference's semantics: the watermark DROPS points
whose event time lags the stream's max event time by more than the
delay, whereas graphouse accepts arbitrarily late points forever
(last-writer-wins at read). In particular a producer backfilling
history lands outside any practical watermark. This pipeline is
therefore a low-latency *materialized view* beside the authoritative
append-only table, not a replacement: exact results still come from
the batch read path; this stream serves dashboards that want
second-fresh buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(parsed: DataFrame, step_seconds: int = 60,
                    watermark_delay: str = "2 minutes",
                    function: str = "avg") -> DataFrame:
    """Streaming (name, bucket) aggregates with a late-data bound.

    ``parsed``: streaming DF (name, value, timestamp, updated).
    Emits (metric, ts, value, n_points) in append mode once the
    watermark passes each window.
    """
    from graphouse_spark.operators.bucket import AGG_FUNCTIONS

    try:
        agg = AGG_FUNCTIONS[function]
    except KeyError:
        raise ValueError(f"unknown retention function {function!r}") from None
    with_time = parsed.withColumn(
        "_event", F.from_unixtime("timestamp").cast("timestamp")
    ).withWatermark("_event", watermark_delay)
    return (
        with_time.groupBy(
            F.col("name").alias("metric"),
            F.window("_event", f"{step_seconds} seconds"),
        )
        .agg(agg("value").alias("value"), F.count(F.lit(1)).alias("n_points"))
        .select(
            "metric",
            F.unix_timestamp(F.col("window.start")).alias("ts"),
            "value",
            "n_points",
        )
    )


def streaming_dedup(parsed: DataFrame, delay: str = "10 minutes",
                    keys: tuple[str, ...] = ("name", "timestamp")) -> DataFrame:
    """Streaming exact dedup within a watermark horizon.

    The reference never dedups in flight — duplicates are a feature
    (gauge resubmission, T2) and LWW resolves at read. For the
    extended pipeline surface (training-data ingest, where a repeated
    record is waste, not a correction) this is the streaming-native
    tier: ``dropDuplicatesWithinWatermark`` keeps per-key state only
    until the watermark passes, so state is bounded by the delay
    window, not by stream history — the property that lets it run
    forever on an unbounded feed.

    ``parsed``: streaming DF (name, value, timestamp, updated) — the
    parse_lines schema; event time derives from ``timestamp``. First
    occurrence wins; a later duplicate inside the horizon is dropped.
    """
    with_time = parsed.withColumn(
        "_event", F.from_unixtime("timestamp").cast("timestamp")
    ).withWatermark("_event", delay)
    return with_time.dropDuplicatesWithinWatermark(list(keys)).drop("_event")


def windowed_distinct_users(events: DataFrame, step_seconds: int = 3600,
                            watermark_delay: str = "10 minutes",
                            key: str = "user_id") -> DataFrame:
    """Streaming per-window approximate distinct count (HLL sketch).

    ``approx_count_distinct`` keeps a fixed-size HyperLogLog per open
    window instead of the full key set — the state store holds
    O(windows x sketch_size) regardless of cardinality, which is what
    makes distinct-count survivable on an unbounded stream (an exact
    distinct would grow state with every new key). Partials merge
    associatively across executors, same as the batch rollup path.

    ``events``: streaming DF with (user_id, ts_sec, ...) — emits
    (ts, approx_users) per closed window in append mode.
    """
    with_time = events.withColumn(
        "_event", F.from_unixtime("ts_sec").cast("timestamp")
    ).withWatermark("_event", watermark_delay)
    return (
        with_time.groupBy(F.window("_event", f"{step_seconds} seconds"))
        .agg(F.approx_count_distinct(key).alias("approx_users"))
        .select(F.unix_timestamp(F.col("window.start")).alias("ts"), "approx_users")
    )


def stream_stream_attribution(clicks: DataFrame, views: DataFrame,
                              horizon_seconds: int = 600,
                              watermark_delay: str = "2 minutes") -> DataFrame:
    """Stream-stream inner join: attribute each click to the view(s) of
    the same user within the preceding ``horizon_seconds``.

    Both sides carry an event-time watermark and the join condition
    bounds the time skew (view_time in (click_time - horizon,
    click_time]), so Structured Streaming can expire join state on both
    sides — the REQUIRED shape for an unbounded stream-stream join:
    without the time bound, state grows forever; with it, each side
    keeps only ``horizon + delay`` worth of rows per key.

    Inputs are streaming DFs shaped (user_id, ts_sec, value); the join
    key (user_id) is the shuffle key on both sides, hash-partitioned
    identically, so matching rows co-locate per micro-batch.

    Returns (user_id, click_ts, view_ts, click_value, view_value).
    """
    c = (
        clicks.select(
            F.col("user_id"),
            F.col("ts_sec").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withColumn("click_time", F.from_unixtime("click_ts").cast("timestamp"))
        .withWatermark("click_time", watermark_delay)
    )
    v = (
        views.select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts_sec").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
        .withColumn("view_time", F.from_unixtime("view_ts").cast("timestamp"))
        .withWatermark("view_time", watermark_delay)
    )
    cond = (
        (c["user_id"] == v["v_user_id"])
        & (v["view_time"] <= c["click_time"])
        & (v["view_time"] >= c["click_time"] - F.expr(f"INTERVAL {horizon_seconds} SECONDS"))
    )
    return (
        c.join(v, cond, "inner")
        .select("user_id", "click_ts", "view_ts", "click_value", "view_value")
    )


def enrich_with_dimension(parsed: DataFrame, dim: DataFrame,
                          key: str = "name") -> DataFrame:
    """Stream-static join: enrich in-flight points with a dimension
    table (e.g. per-metric retention/ownership metadata).

    Structured Streaming re-plans the static side each micro-batch, so
    a dimension refreshed on disk is picked up without restarting the
    query; broadcast keeps the stream side shuffle-free — the stateless
    enrichment shape that scales to any stream rate.
    """
    return parsed.join(F.broadcast(dim), key, "left_outer")


# --------------------------------------------------------------------------
# continuous aggregation: a maintained rollup TABLE (vs the append stream)
# --------------------------------------------------------------------------

CONTINUOUS_AGG_SCHEMA = "metric string, ts long, sum_cents long, n_points long, _last_batch long, date date"


def continuous_aggregate_partials(parsed: DataFrame, step_seconds: int = 300) -> DataFrame:
    """Per-micro-batch partial aggregates for the continuous rollup.

    The stored representation is the MERGEABLE pair (sum_cents,
    n_points), not the average itself: partials from any number of
    batches — including arbitrarily late data — combine by plain
    addition, so maintaining the table never re-scans raw points.
    Exact integer cents make the merge associative and replayable.
    """
    bucket = (F.col("timestamp") - F.col("timestamp") % step_seconds).alias("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        parsed.groupBy(F.col("name").alias("metric"), bucket)
        .agg(F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n_points"))
        .withColumn("date", F.to_date(F.from_unixtime("ts")))
    )


def merge_continuous_aggregate(spark, table_path: str, partial: DataFrame,
                               batch_id: int) -> None:
    """Merge one batch's partials into the date-partitioned rollup table.

    Scale mechanics:
    - only the DATE PARTITIONS the batch touches are read back and
      rewritten (dynamic partition overwrite) — steady-state ingest
      touches today's partition no matter how large history grows;
    - late data merges into its original bucket (no watermark drop —
      this is what the reference's last-writer/merge semantics need,
      which the windowed_rollup stream cannot give);
    - replays are idempotent: foreachBatch batch ids are monotonic, so
      a partition whose stored ``_last_batch`` already covers this id
      is skipped rather than double-merged.
    """
    from pyspark.errors import AnalysisException

    touched = [r["date"] for r in partial.select("date").distinct().collect()]
    if not touched:
        return
    try:
        existing = spark.read.schema(CONTINUOUS_AGG_SCHEMA).parquet(table_path)
        existing = existing.filter(F.col("date").isin(touched))
        already = existing.agg(F.max("_last_batch")).first()[0]
        if already is not None and already >= batch_id:
            return  # replay of a batch this table already absorbed
    except AnalysisException:
        existing = None
    stamped = partial.withColumn("_last_batch", F.lit(batch_id).cast("long"))
    if existing is not None:
        stamped = (
            existing.unionByName(stamped)
            .groupBy("metric", "ts", "date")
            .agg(F.sum("sum_cents").alias("sum_cents"),
                 F.sum("n_points").alias("n_points"),
                 F.max("_last_batch").alias("_last_batch"))
        )
    (
        stamped.repartition("date")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(table_path)
    )


def start_continuous_aggregate(parsed: DataFrame, table_path: str,
                               checkpoint_dir: str, step_seconds: int = 300,
                               trigger_seconds: int | None = None):
    """Maintain a queryable rollup table from the stream (T8-adjacent).

    ``parsed``: streaming (name, value, timestamp, updated). Each
    micro-batch folds its partial (sum, count) pairs into the table via
    ``merge_continuous_aggregate``. Read it back with
    ``read_continuous_aggregate`` for finished averages.
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        partial = continuous_aggregate_partials(batch_df, step_seconds)
        merge_continuous_aggregate(batch_df.sparkSession, table_path, partial, batch_id)

    writer = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def read_continuous_aggregate(spark, table_path: str) -> DataFrame:
    """Finished averages from the maintained rollup table."""
    agg = spark.read.schema(CONTINUOUS_AGG_SCHEMA).parquet(table_path)
    return agg.select(
        "metric", "ts",
        F.round(F.col("sum_cents") / (F.col("n_points") * 100.0), 6).alias("value"),
        "n_points",
    )
