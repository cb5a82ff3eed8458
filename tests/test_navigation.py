"""Aggregate navigation: rollup-served answers are bit-identical to raw."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.plans.navigation import (
    AggTable,
    build_partial_rollup,
    choose_table,
    raw_as_partials,
    serve,
)


@pytest.fixture(scope="module")
def raw(spark):
    # 3 metrics, 60 s native spacing over 2 days, cents-precision values
    return spark.range(3 * 2880).select(
        F.concat(F.lit("m"), (F.col("id") % 3).cast("string")).alias("metric"),
        (F.lit(1704067200) + (F.col("id") / 3).cast("long") * 60).alias("timestamp"),
        (F.round((F.col("id") % 997) * 0.37, 2)).alias("value"),
    )


@pytest.fixture(scope="module")
def tables(raw):
    return [
        raw_as_partials(raw, native_step=60),
        AggTable(build_partial_rollup(raw, 300), 300),
        AggTable(build_partial_rollup(raw, 3600), 3600),
    ]


def test_choose_coarsest_dividing_table(tables):
    assert choose_table(tables, 7200).step == 3600
    assert choose_table(tables, 900).step == 300
    assert choose_table(tables, 120).step == 60
    with pytest.raises(ValueError):
        choose_table(tables[1:], 450)  # 300 nor 3600 divides 450


@pytest.mark.parametrize("qstep", [300, 900, 3600, 7200])
@pytest.mark.parametrize("fn", ["avg", "sum", "count"])
def test_rollup_answers_equal_raw_answers(tables, qstep, fn):
    start, end = 1704067200, 1704067200 + 86400
    from_best = serve(tables, start, end, qstep, fn)
    from_raw = serve(tables[:1], start, end, qstep, fn)
    assert sorted(map(tuple, from_best.collect())) == sorted(map(tuple, from_raw.collect()))


def test_navigation_scans_fewer_rows(tables):
    assert tables[2].df.count() < tables[1].df.count() < tables[0].df.count()
