"""ClickHouse SQL dialect shim: CH spellings resolve as pure Catalyst
expressions (SQL scalar UDFs) — correctness + no-Python-in-plan."""

import pytest

from graphouse_spark.chdialect import (
    CH_JSON_FUNCTIONS,
    CH_SQL_FUNCTIONS,
    CH_URL_FUNCTIONS,
    register_ch_dialect,
)


@pytest.fixture(scope="module", autouse=True)
def dialect(spark):
    expected = len(CH_SQL_FUNCTIONS) + len(CH_URL_FUNCTIONS) + len(CH_JSON_FUNCTIONS)
    assert register_ch_dialect(spark) == expected
    # idempotent re-registration
    register_ch_dialect(spark)


def test_time_helpers(spark):
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    jan1 = 1704067200  # 2024-01-01 00:00 UTC, a Monday
    assert one(f"toStartOfFiveMinutes({jan1} + 333)") == jan1 + 300
    assert one(f"toStartOfHour({jan1} + 3999)") == jan1 + 3600
    assert one(f"toStartOfDay({jan1} + 86399)") == jan1
    assert one(f"toMonday({jan1} + 3 * 86400 + 7)") == jan1  # Thursday -> that Monday
    assert one(f"toDayOfWeek({jan1})") == 1  # CH: Monday = 1
    assert one(f"toDayOfWeek({jan1} + 6 * 86400)") == 7  # Sunday = 7
    assert one(f"toYYYYMM({jan1})") == 202401
    assert str(one(f"toDate({jan1})")) == "2024-01-01"
    assert one(f"toStartOfInterval({jan1} + 1234, 600)") == jan1 + 1200


def test_scalar_helpers(spark):
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    assert one("intDiv(7, 2)") == 3
    # CH rounds toward negative infinity (docs example: intDiv(-4,3)=-2)
    assert one("intDiv(-4, 3)") == -2
    assert one("intDiv(4, -3)") == -2
    assert one("intDiv(-6, 3)") == -2  # exact quotient: no correction
    assert one("intDivOrZero(7, 0)") == 0
    assert one("intDivOrZero(-4, 3)") == -2
    assert one("splitByChar('.', 'a.b.c')") == ["a", "b", "c"]
    assert one("arrayStringConcat(splitByChar('.', 'a.b'), '/')") == "a/b"
    assert one("has(splitByChar('.', 'a.b'), 'a')") is True
    # CH arrayElement out-of-bounds -> the type default '', not NULL
    assert one("arrayElement(splitByChar('.', 'a.b'), 99)") == ""
    assert one("arrayElement(splitByChar('.', 'a.b'), -1)") == "b"
    assert one("empty('')") is True and one("notEmpty('x')") is True
    assert one("match('one_min.srv', '^one_')") is True
    assert one("multiIf(1 > 2, 1.0, 2 > 1, 2.0, 3.0)") == 2.0


def test_dialect_stays_jvm_side(spark):
    """The shim is parse-level: the physical plan must show plain
    expressions, no BatchEvalPython / ArrowEvalPython nodes."""
    df = spark.range(100).selectExpr(
        "toStartOfFiveMinutes(id + 1704067200) AS b", "intDiv(id, 7) AS d"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert df.count() == 100


def test_url_functions(spark):
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    url = "'https://www.sub.example.com:8443/docs/d17?lang=en&v=3#sec2'"
    assert one(f"protocol({url})") == "https"
    assert one(f"domain({url})") == "www.sub.example.com"
    assert one(f"domainWithoutWWW({url})") == "sub.example.com"
    assert one(f"topLevelDomain({url})") == "com"
    assert one(f"port({url})") == 8443
    assert one(f"path({url})") == "/docs/d17"
    assert one(f"pathFull({url})") == "/docs/d17?lang=en&v=3#sec2"
    assert one(f"queryString({url})") == "lang=en&v=3"
    assert one(f"fragment({url})") == "sec2"
    assert one(f"extractURLParameter({url}, 'v')") == "3"
    assert one(f"extractURLParameter({url}, 'lang')") == "en"
    assert one(f"cutQueryString({url})") == "https://www.sub.example.com:8443/docs/d17#sec2"
    assert one(f"cutFragment({url})") == "https://www.sub.example.com:8443/docs/d17?lang=en&v=3"
    assert one(f"cutQueryStringAndFragment({url})") == "https://www.sub.example.com:8443/docs/d17"
    assert one(f"cutWWW({url})") == "https://sub.example.com:8443/docs/d17?lang=en&v=3#sec2"


def test_url_functions_edges(spark):
    """Lenient CH semantics on degenerate inputs — '' not errors; no
    host-as-path backtracking on path-less URLs."""
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    assert one("domain('example.com/x')") == "example.com"      # schemeless
    assert one("path('http://h')") == ""                        # no path != '//h'
    assert one("pathFull('http://h')") == ""
    assert one("port('http://h/p')") == 0                       # default port
    assert one("topLevelDomain('http://localhost/x')") == ""    # dotless host
    assert one("protocol('example.com')") == ""
    assert one("queryString('http://h/p')") == ""
    assert one("extractURLParameter('http://h/p?a=1', 'b')") == ""
    assert one("cutWWW('www.example.com/a')") == "example.com/a"
    assert one("domain('https://user@host.io/x')") == "host.io"  # userinfo


def test_json_functions(spark):
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    j = """'{"k": 69, "name": "x", "on": true}'"""
    assert one(f"JSONHas({j}, 'k')") is True
    assert one(f"JSONHas({j}, 'missing')") is False
    assert one(f"JSONExtractInt({j}, 'k')") == 69
    assert one(f"JSONExtractFloat({j}, 'k')") == 69.0
    assert one(f"JSONExtractString({j}, 'name')") == "x"
    assert one(f"JSONExtractBool({j}, 'on')") is True
    assert one(f"JSONLength({j})") == 3
    assert one(f"JSONExtractKeys({j})") == ["k", "name", "on"]
    assert one(f"visitParamExtractInt({j}, 'k')") == 69
    assert one(f"simpleJSONHas({j}, 'name')") is True
    # lenient on malformed/missing (documented NULL posture)
    assert one("JSONExtractInt('not json', 'k')") is None
    assert one("JSONLength('nope')") is None


def test_string_math_batch(spark):
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    # CH spellings Spark already has resolve natively (names are
    # case-insensitive): no shim registered, still valid CH SQL here.
    # position() is the documented exception: Spark's built-in takes
    # (needle, haystack) — CH argument order — reversed; positionUTF8
    # carries the CH order.
    assert one("position('ll', 'hello')") == 3   # Spark arg order
    assert one("positionUTF8('hello', 'll')") == 3  # CH arg order
    assert one("startsWith('one_min.srv', 'one_')") is True
    assert one("endsWith('metric.count', 'count')") is True
    assert one("hex(255)") == "FF"
    assert one("log2(8.0)") == 3.0
    assert abs(one("cbrt(27.0)") - 3.0) < 1e-12
    assert abs(one("e()") - 2.718281828) < 1e-6
    assert abs(one("pi()") - 3.14159265) < 1e-6
    # shimmed names
    assert one("leftPad('7', 3, '0')") == "007"
    assert one("rightPad('ab', 4, '.')") == "ab.."
    assert one("trimBoth('  x ')") == "x"
    assert one("substringUTF8('abcdef', 2, 3)") == "bcd"
    assert one("reverseUTF8('abc')") == "cba"
    assert one("base64Decode(base64Encode('graph'))") == "graph"
    assert one("bitCount(7)") == 3
    assert one("intExp2(40)") == 1 << 40
    # Moscow -> St Petersburg ~ 634 km, CH doc example ballpark
    d = one("greatCircleDistance(37.6173, 55.7558, 30.3351, 59.9343)")
    assert 600_000 < d < 670_000


def test_array_equivalents_are_valid_spark(spark):
    """Every documented Spark rewrite in ARRAY_EQUIVALENTS that is a
    complete expression must actually evaluate — the table is a
    migration contract, not prose."""
    from graphouse_spark.chdialect import ARRAY_EQUIVALENTS

    assert len(ARRAY_EQUIVALENTS) >= 20
    one = lambda sql: spark.sql(f"SELECT {sql}").collect()[0][0]  # noqa: E731
    a = "array(3, 1, 2, 1)"
    assert one(f"transform({a}, x -> x * 2)") == [6, 2, 4, 2]
    assert one(f"filter({a}, x -> x > 1)") == [3, 2]
    assert one(f"exists({a}, x -> x = 3)") is True
    assert one(f"forall({a}, x -> x > 0)") is True
    assert one(f"aggregate({a}, 0D, (acc, x) -> acc + x)") == 7.0
    assert one(f"array_sort({a})") == [1, 1, 2, 3]
    assert one(f"reverse(array_sort({a}))") == [3, 2, 1, 1]
    assert one(f"size(array_distinct({a}))") == 3
    assert one(f"sequence(1, size({a}))") == [1, 2, 3, 4]
    assert one(f"arrays_overlap({a}, array(9, 2))") is True
    assert one(f"size(array_except(array(1, 9), {a})) = 0") is False
    assert one(f"array_position({a}, 2)") == 3
    assert one(f"size(filter({a}, e -> e = 1))") == 2
    assert one("sequence(0, 3 - 1)") == [0, 1, 2]
