"""S12: counter flush semantics + lines re-enter the ingest parser."""

from pyspark.sql import functions as F

from graphouse_spark.sources.graphite import parse_lines
from graphouse_spark.statistics import StatisticsService


def test_flush_resets_and_rounds():
    s = StatisticsService(flush_period_seconds=5)
    s.accumulate("metric_cacher.received", 10)
    s.accumulate("metric_cacher.received", 5)
    s.accumulate("web.requests")
    s.register_gauge("queue_size", lambda: 42.0)
    lines = s.flush(now_seconds=1542199503)  # rounds down to ...500
    assert lines == [
        "five_sec.graphouse.statistics.metric_cacher.received 15.0 1542199500",
        "five_sec.graphouse.statistics.web.requests 1.0 1542199500",
        "five_sec.graphouse.statistics.queue_size 42.0 1542199500",
    ]
    # counters reset, gauges persist
    lines2 = s.flush(now_seconds=1542199508)
    assert lines2 == ["five_sec.graphouse.statistics.queue_size 42.0 1542199505"]


def test_flush_lines_are_ingestable(spark):
    s = StatisticsService()
    s.accumulate("metric_cacher.written", 100)
    lines = s.flush(now_seconds=1542199500)
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_lines(raw, updated=F.lit(1542199500)).collect()
    assert len(parsed) == 1
    assert parsed[0]["name"] == "five_sec.graphouse.statistics.metric_cacher.written"
    assert parsed[0]["value"] == 100.0


def test_sketch_rollup_merge_is_lossless(spark):
    """Merging daily HLL sketches == sketching the raw window directly,
    and the estimate lands within the sketch's error envelope."""
    from graphouse_spark.functions.sketches import rollup_sketches, user_sketch_table
    from pyspark.sql import functions as F

    from graphouse_spark import epoch_seconds

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev = ev.withColumn("ts_sec", epoch_seconds(ev, "ts"))
    daily = user_sketch_table(ev, bucket_seconds=86400)
    weekly = rollup_sketches(daily, 7 * 86400).orderBy("window_ts")
    got = {r["window_ts"]: r["approx_users"] for r in weekly.collect()}

    # direct sketch over the same weekly windows — same estimates exactly
    # (union is associative, not just approximately commutative)
    direct = user_sketch_table(ev, bucket_seconds=7 * 86400)
    direct = direct.select(
        F.col("bucket_ts").alias("window_ts"),
        F.hll_sketch_estimate("user_sketch").cast("long").alias("approx_users"),
    )
    got_direct = {r["window_ts"]: r["approx_users"] for r in direct.collect()}
    assert got == got_direct

    # accuracy: within 5% of exact per window
    exact = ev.groupBy(
        (F.col("ts_sec") - F.col("ts_sec") % (7 * 86400)).alias("window_ts")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    for r in exact.collect():
        est = got[r["window_ts"]]
        assert abs(est - r["exact_users"]) <= max(3, 0.05 * r["exact_users"])


def test_quantile_sketch_merge_is_lossless_and_bounded(spark):
    """Daily quantile sketches merged to the full range give EXACTLY the
    same sketch as sketching the whole input; estimates stay within the
    2^-(m+1) relative-error bound of the exact percentile."""
    from pyspark.sql import functions as F

    from graphouse_spark.functions.sketches import (
        merge_quantile_sketches,
        quantile_sketch_table,
        sketch_quantiles,
    )

    df = spark.range(30000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 7).alias("day"),
        (F.pow(F.lit(1.0003), F.col("id") % 9941) * 3.7).alias("value"),
    )

    daily = quantile_sketch_table(df, ["g", "day"])
    merged = merge_quantile_sketches(daily, ["g"])
    direct = quantile_sketch_table(df, ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    got = {(r["g"], r["p"]): r["value"]
           for r in sketch_quantiles(merged, ["g"], [0.5, 0.95, 0.99]).collect()}
    exact = {
        (r["g"], p): r[f"p{int(p*100)}"]
        for r in df.groupBy("g").agg(
            *[F.percentile_approx("value", p, 100000).alias(f"p{int(p*100)}")
              for p in (0.5, 0.95, 0.99)]
        ).collect()
        for p in (0.5, 0.95, 0.99)
    }
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 2 ** -7, (k, est, exact[k])


def test_cents_sketch_exact_quantization_and_compact_read(spark):
    """The integer-cents sketch (pure shifts, no float log) obeys the
    same 2^-(m+1) relative bound, merges exactly, and the compact
    one-groupBy read equals the window read BOTH on merged sketches and
    directly on unmerged daily partials (duplicate-q safety)."""
    from pyspark.sql import functions as F

    from graphouse_spark.functions.sketches import (
        merge_quantile_sketches,
        quantile_sketch_table_cents,
        sketch_quantiles,
        sketch_quantiles_compact,
    )

    df = spark.range(30000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 7).alias("day"),
        # mixed signs + zero + wide magnitude range
        ((F.col("id") % 9941) * 37 - 50000).alias("cents"),
    )

    daily = quantile_sketch_table_cents(df, ["g", "day"], "cents")
    merged = merge_quantile_sketches(daily, ["g"])
    direct = quantile_sketch_table_cents(df, ["g"], "cents")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    ps = [0.5, 0.95, 0.99]
    win = sorted(map(tuple, sketch_quantiles(merged, ["g"], ps).collect()))
    cm = sorted(map(tuple, sketch_quantiles_compact(merged, ["g"], ps).collect()))
    cd = sorted(map(tuple, sketch_quantiles_compact(daily, ["g"], ps).collect()))
    assert win == cm == cd

    exact = {
        (r["g"], p): r[f"p{int(p * 100)}"]
        for r in df.groupBy("g").agg(
            *[F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY cents)")
              .alias(f"p{int(p * 100)}") for p in ps]
        ).collect()
        for p in ps
    }
    for g, p, est in [(r[0], r[1], r[2]) for r in win]:
        ex = exact[(g, p)]
        assert abs(est - ex) <= max(1, abs(ex) * 2 ** -8 + 0.5), (g, p, est, ex)
