"""Unit coverage for the /query readonly guard tokenizer + validator."""

import pytest

from graphouse_spark.api.sqlguard import (
    GuardError,
    assert_readonly,
    rewrite_code,
    sanitized,
    tokenize,
)


def test_tokenize_kinds_roundtrip():
    q = ("SELECT 'it''s', \"dq\\\"esc\", `col``x` FROM t -- tail 'q\n"
         "/* block ' */ WHERE a = 'b'")
    segs = tokenize(q)
    assert "".join(s.text for s in segs) == q
    kinds = [s.kind for s in segs]
    assert kinds.count("string") == 3
    assert kinds.count("ident") == 1
    assert kinds.count("comment") == 2


@pytest.mark.parametrize("bad", [
    "SELECT 'unterminated",
    "SELECT `unterminated",
    "SELECT /* unterminated",
    "SELECT `new\nline`",
    "SELECT `has[bracket`",
])
def test_tokenize_rejects_malformed(bad):
    with pytest.raises(GuardError):
        tokenize(bad)


def test_rewrite_skips_literals_and_comments():
    q = "SELECT argMax(v, u) FROM graphite.data WHERE m = 'graphite.data' -- graphite.data"
    out = rewrite_code(q, lambda c: c.replace("graphite.data", "data")
                       .replace("argMax", "max_by"))
    assert out == ("SELECT max_by(v, u) FROM data "
                   "WHERE m = 'graphite.data' -- graphite.data")


def test_sanitized_strips_attacker_text():
    q = "SELECT a FROM t WHERE x = 'evil\\nInsertIntoStatement' /* drop */"
    s = sanitized(q)
    assert "evil" not in s and "drop" not in s
    assert s.startswith("SELECT a FROM t WHERE x = 'X'")


def test_assert_readonly_allows_and_rejects(spark):
    allowed = frozenset({"data", "metrics"})
    assert_readonly(spark, "WITH t AS (SELECT 1 AS x) SELECT * FROM t", allowed)
    assert_readonly(
        spark,
        "SELECT m.x FROM metrics m JOIN data d ON m.x = d.x", allowed)
    with pytest.raises(GuardError, match="readonly"):
        assert_readonly(
            spark,
            "WITH t AS (SELECT 1) INSERT OVERWRITE DIRECTORY '/tmp/x' "
            "USING parquet SELECT * FROM t", allowed)
    with pytest.raises(GuardError, match="not served"):
        assert_readonly(spark, "SELECT reflect('java.lang.System', 'exit')",
                        allowed)
    with pytest.raises(GuardError, match="not served"):
        assert_readonly(spark, "SELECT `reflect`('a', 'b')", allowed)
    with pytest.raises(GuardError, match="relation"):
        assert_readonly(spark, "SELECT * FROM `text`.`/etc/passwd`", allowed)
    with pytest.raises(GuardError, match="relation"):
        assert_readonly(spark, "SELECT * FROM other_table", allowed)
    # nested CTE in a subquery resolves as a CTE, not a foreign relation
    assert_readonly(
        spark,
        "SELECT * FROM (WITH inner_t AS (SELECT 1 AS a) "
        "SELECT * FROM inner_t)", allowed)


def test_sanitized_passes_typed_literals_through():
    # Spark VALIDATES typed-literal bodies at parse time, so the 'X'
    # placeholder used to reject every date/timestamp/interval filter
    q = ("SELECT * FROM data WHERE ts >= timestamp '2020-01-01 00:00:00' "
         "AND d = date '2020-01-01' AND ts < date '2020-01-01' + "
         "interval '5' minute AND h = x'41'")
    s = sanitized(q)
    assert "timestamp '2020-01-01 00:00:00'" in s
    assert "date '2020-01-01'" in s
    assert "interval '5' minute" in s
    assert "x'41'" in s


def test_sanitized_interval_unit_words_pass():
    s = sanitized("SELECT ts + interval '5 minutes' FROM data")
    assert "interval '5 minutes'" in s


def test_sanitized_still_masks_unsafe_typed_bodies():
    # parens / letters outside the safe charset never pass through,
    # even behind a type-constructor keyword
    s = sanitized("SELECT date 'evil(InsertIntoStatement' FROM t")
    assert "evil" not in s and "'X'" in s
    # a non-constructor context masks even safe-charset bodies
    s = sanitized("SELECT a FROM t WHERE x = '2020-01-01'")
    assert s.endswith("x = 'X'")


def test_assert_readonly_serves_typed_literal_queries(spark):
    """The bread-and-butter time-filter shapes of a /query interface
    (the round-4 advisory: these were rejected with 'parse error')."""
    allowed = frozenset({"data"})
    assert_readonly(
        spark,
        "SELECT * FROM data WHERE ts >= timestamp '2020-01-01 00:00:00'",
        allowed)
    assert_readonly(
        spark, "SELECT * FROM data WHERE d = date '2020-01-01'", allowed)
    assert_readonly(
        spark,
        "SELECT * FROM data WHERE ts > timestamp '2020-01-01 00:00:00' "
        "- interval '5' minute", allowed)
    assert_readonly(
        spark,
        "SELECT * FROM data WHERE ts > timestamp '2020-01-01 00:00:00' "
        "- interval '90 seconds'", allowed)
    assert_readonly(spark, "SELECT x'41', data.* FROM data", allowed)
    # still readonly: typed literals don't open the DML door
    with pytest.raises(GuardError, match="readonly"):
        assert_readonly(
            spark,
            "INSERT INTO data SELECT date '2020-01-01'", allowed)
