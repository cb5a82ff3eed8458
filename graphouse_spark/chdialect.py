"""ClickHouse SQL dialect shim: CH function names as Spark SQL UDFs.

Users of the reference write ClickHouse SQL (`toStartOfFiveMinutes`,
`intDiv`, `if`, `has`, ...). Spark 4's SQL scalar UDFs (`CREATE
FUNCTION ... RETURN <expr>`) let those names resolve natively — each
body is a pure Catalyst expression, so queries stay inside whole-stage
codegen with zero Python involvement; this is a PARSE-level shim, not
an execution layer.

Aggregate functions cannot be aliased this way (SQL UDFs are scalar);
:data:`AGGREGATE_EQUIVALENTS` documents the mechanical rewrites, which
are all built-ins (``argMax -> max_by`` etc.). The flagship read path
already implements the semantic ones (FINAL -> read-time LWW dedup,
GraphiteMergeTree -> rollup job).
"""

from __future__ import annotations

import weakref

from pyspark.sql import SparkSession

#: CH scalar function -> (SQL UDF signature, expression body).
#: Time helpers take epoch SECONDS (the engine's canonical ts), like
#: the corpus-wide ``events_sec`` view exposes.
CH_SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    "toStartOfMinute": ("(ts BIGINT) RETURNS BIGINT", "ts - ts % 60"),
    "toStartOfFiveMinutes": ("(ts BIGINT) RETURNS BIGINT", "ts - ts % 300"),
    "toStartOfFifteenMinutes": ("(ts BIGINT) RETURNS BIGINT", "ts - ts % 900"),
    "toStartOfHour": ("(ts BIGINT) RETURNS BIGINT", "ts - ts % 3600"),
    "toStartOfDay": ("(ts BIGINT) RETURNS BIGINT", "ts - ts % 86400"),
    # CH toMonday returns a date; epoch-seconds twin: Monday 00:00 UTC.
    # epoch day 0 (1970-01-01) was a Thursday -> offset 3 days.
    "toMonday": ("(ts BIGINT) RETURNS BIGINT",
                 "ts - ((ts div 86400 + 3) % 7) * 86400 - ts % 86400"),
    "toStartOfInterval": ("(ts BIGINT, step BIGINT) RETURNS BIGINT",
                          "ts - ts % step"),
    "toDate": ("(ts BIGINT) RETURNS DATE",
               "to_date(from_unixtime(ts))"),
    "toDateTime": ("(ts BIGINT) RETURNS TIMESTAMP", "to_timestamp(ts)"),
    "toYYYYMM": ("(ts BIGINT) RETURNS INT",
                 "CAST(date_format(to_timestamp(ts), 'yyyyMM') AS INT)"),
    "toYear": ("(ts BIGINT) RETURNS INT", "year(to_timestamp(ts))"),
    "toMonth": ("(ts BIGINT) RETURNS INT", "month(to_timestamp(ts))"),
    "toHour": ("(ts BIGINT) RETURNS INT", "hour(to_timestamp(ts))"),
    "toMinute": ("(ts BIGINT) RETURNS INT", "minute(to_timestamp(ts))"),
    # CH: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7
    "toDayOfWeek": ("(ts BIGINT) RETURNS INT",
                    "((dayofweek(to_timestamp(ts)) + 5) % 7) + 1"),
    # CH intDiv rounds toward NEGATIVE INFINITY (docs: intDiv(-4, 3) =
    # -2); Spark's div truncates toward zero, so mixed-sign inexact
    # quotients need the floor correction
    "intDiv": ("(a BIGINT, b BIGINT) RETURNS BIGINT",
               "CASE WHEN a % b != 0 AND ((a < 0) != (b < 0)) "
               "THEN a div b - 1 ELSE a div b END"),
    "intDivOrZero": ("(a BIGINT, b BIGINT) RETURNS BIGINT",
                     "CASE WHEN b = 0 THEN 0 "
                     "WHEN a % b != 0 AND ((a < 0) != (b < 0)) "
                     "THEN a div b - 1 ELSE a div b END"),
    "modulo": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a % b"),
    "plus": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "a + b"),
    "minus": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "a - b"),
    "multiIf": ("(c1 BOOLEAN, v1 DOUBLE, c2 BOOLEAN, v2 DOUBLE, d DOUBLE) "
                "RETURNS DOUBLE",
                "CASE WHEN c1 THEN v1 WHEN c2 THEN v2 ELSE d END"),
    "empty": ("(s STRING) RETURNS BOOLEAN", "s IS NULL OR s = ''"),
    "notEmpty": ("(s STRING) RETURNS BOOLEAN", "s IS NOT NULL AND s != ''"),
    "splitByChar": ("(sep STRING, s STRING) RETURNS ARRAY<STRING>",
                    "split(s, concat('\\\\Q', sep, '\\\\E'))"),
    "arrayStringConcat": ("(a ARRAY<STRING>, sep STRING) RETURNS STRING",
                          "array_join(a, sep)"),
    "has": ("(a ARRAY<STRING>, x STRING) RETURNS BOOLEAN",
            "array_contains(a, x)"),
    # CH arrayElement returns the element type's DEFAULT ('' for
    # strings) out of bounds, not NULL; negative indices count from
    # the end like CH
    "arrayElement": ("(a ARRAY<STRING>, i INT) RETURNS STRING",
                     "coalesce(try_element_at(a, i), '')"),
    "lengthUTF8": ("(s STRING) RETURNS INT", "char_length(s)"),
    "match": ("(s STRING, re STRING) RETURNS BOOLEAN", "s RLIKE re"),
    "positionCaseInsensitive": ("(s STRING, sub STRING) RETURNS INT",
                                "instr(lower(s), lower(sub))"),
    # string / encoding / math batch. Spellings Spark already has as
    # built-ins resolve natively because SQL function names are
    # case-insensitive — startsWith/endsWith/hex/log2/cbrt/pi/e need
    # NO shim (and cannot be shadowed by a SQL UDF); only the
    # genuinely missing names are registered here. CAVEAT: built-in
    # ``position(needle, haystack)`` takes CH's arguments REVERSED
    # and cannot be shadowed — CH code should use ``positionUTF8``
    # (shimmed below, CH order) or ``instr``.
    "positionUTF8": ("(s STRING, sub STRING) RETURNS INT", "instr(s, sub)"),
    "leftPad": ("(s STRING, n INT, p STRING) RETURNS STRING", "lpad(s, n, p)"),
    "rightPad": ("(s STRING, n INT, p STRING) RETURNS STRING", "rpad(s, n, p)"),
    "trimBoth": ("(s STRING) RETURNS STRING", "trim(s)"),
    "substringUTF8": ("(s STRING, p INT, n INT) RETURNS STRING", "substring(s, p, n)"),
    "reverseUTF8": ("(s STRING) RETURNS STRING", "reverse(s)"),
    "base64Encode": ("(s STRING) RETURNS STRING", "base64(CAST(s AS BINARY))"),
    "base64Decode": ("(s STRING) RETURNS STRING", "CAST(unbase64(s) AS STRING)"),
    "bitCount": ("(x BIGINT) RETURNS INT", "bit_count(x)"),
    "intExp2": ("(n INT) RETURNS BIGINT", "CAST(1 AS BIGINT) << n"),
    "greatCircleDistance": (
        "(lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE) RETURNS DOUBLE",
        # haversine on the CH-documented 6372797.56 m mean-Earth radius
        "2 * 6372797.56085 * asin(sqrt("
        " pow(sin(radians(lat2 - lat1) / 2), 2)"
        " + cos(radians(lat1)) * cos(radians(lat2))"
        "   * pow(sin(radians(lon2 - lon1) / 2), 2)))"),
}

#: ClickHouse URL-function family (domain/path/cutWWW/...), the
#: workhorse of CH web-log and web-corpus pipelines. Bodies are pure
#: regexp expressions — NOT java.net.URI parsing — both so they stay
#: inside whole-stage codegen and so an external engine (the DuckDB
#: oracle) can replay them with the same regexes. Like ClickHouse,
#: these are lenient: no-match returns '' rather than erroring.
#: URL shape assumed: [scheme://][user@]host[:port][/path][?query][#frag]
CH_URL_FUNCTIONS: dict[str, tuple[str, str]] = {
    "protocol": ("(url STRING) RETURNS STRING",
                 r"regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)"),
    "domain": ("(url STRING) RETURNS STRING",
               r"regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.\\-]*://)?(?:[^/@?#]*@)?([^/:?#]+)', 1)"),
    "domainWithoutWWW": (
        "(url STRING) RETURNS STRING",
        r"regexp_replace(regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.\\-]*://)?(?:[^/@?#]*@)?([^/:?#]+)', 1),"
        r" '^www\\.', '')"),
    "topLevelDomain": (
        "(url STRING) RETURNS STRING",
        r"regexp_extract(regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.\\-]*://)?(?:[^/@?#]*@)?([^/:?#]+)', 1),"
        r" '\\.([a-zA-Z][a-zA-Z0-9\\-]*)$', 1)"),
    "port": ("(url STRING) RETURNS INT",
             r"CAST(coalesce(nullif(regexp_extract(url,"
             r" '^(?:[a-zA-Z][a-zA-Z0-9+.\\-]*://)?(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)', 1), ''), '0') AS INT)"),
    # strip scheme+authority first, then read the path: a single regex
    # like '^(scheme://)?host(/path)' backtracks on host-only URLs in
    # Java (matching '//h' as the path) and RE2 has no possessive
    # quantifiers to forbid it — the two-step form is unambiguous in
    # both engines
    "path": ("(url STRING) RETURNS STRING",
             r"regexp_extract(regexp_replace(url,"
             r" '^(?:[a-zA-Z][a-zA-Z0-9+.\\-]*://)?[^/?#]*', ''), '^(/[^?#]*)', 1)"),
    "pathFull": ("(url STRING) RETURNS STRING",
                 r"regexp_extract(regexp_replace(url,"
                 r" '^(?:[a-zA-Z][a-zA-Z0-9+.\\-]*://)?[^/?#]*', ''), '^(/.*)$', 1)"),
    "queryString": ("(url STRING) RETURNS STRING",
                    r"regexp_extract(url, '\\?([^#]*)', 1)"),
    "fragment": ("(url STRING) RETURNS STRING", r"regexp_extract(url, '#(.*)$', 1)"),
    "extractURLParameter": (
        "(url STRING, name STRING) RETURNS STRING",
        r"regexp_extract(url, concat('[?&]', name, '=([^&#]*)'), 1)"),
    "cutQueryString": ("(url STRING) RETURNS STRING",
                       r"regexp_replace(url, '\\?[^#]*', '')"),
    "cutFragment": ("(url STRING) RETURNS STRING", r"regexp_replace(url, '#.*$', '')"),
    "cutQueryStringAndFragment": ("(url STRING) RETURNS STRING",
                                  r"regexp_replace(url, '[\\?#].*$', '')"),
    # group backrefs differ between engines ($1 vs \1) — compose two
    # backref-free replaces instead so the oracle regex is identical
    "cutWWW": ("(url STRING) RETURNS STRING",
               r"regexp_replace(regexp_replace(url, '^www\\.', ''), '://www\\.', '://')"),
}


#: ClickHouse JSON-function family over string-typed JSON columns
#: (the ``props``-style semi-structured payload every CH event table
#: carries). Bodies route through ``get_json_object`` /
#: ``json_object_keys`` — JVM-side Jackson parsing inside codegen.
#: Lenient like CH: malformed JSON or a missing key yields NULL (CH
#: returns 0/'' defaults for JSONExtract*; the NULL posture is kept
#: deliberately because it composes with SQL aggregates — documented
#: deviation). The simpleJSON*/visitParam* spellings alias the same
#: bodies (CH's fast-path parser is an engine detail, not semantics).
CH_JSON_FUNCTIONS: dict[str, tuple[str, str]] = {
    "JSONHas": ("(j STRING, k STRING) RETURNS BOOLEAN",
                "get_json_object(j, concat('$.', k)) IS NOT NULL"),
    "JSONExtractInt": ("(j STRING, k STRING) RETURNS BIGINT",
                       "CAST(get_json_object(j, concat('$.', k)) AS BIGINT)"),
    "JSONExtractFloat": ("(j STRING, k STRING) RETURNS DOUBLE",
                         "CAST(get_json_object(j, concat('$.', k)) AS DOUBLE)"),
    "JSONExtractString": ("(j STRING, k STRING) RETURNS STRING",
                          "get_json_object(j, concat('$.', k))"),
    "JSONExtractBool": ("(j STRING, k STRING) RETURNS BOOLEAN",
                        "CAST(get_json_object(j, concat('$.', k)) AS BOOLEAN)"),
    "JSONLength": ("(j STRING) RETURNS INT", "size(json_object_keys(j))"),
    "JSONExtractKeys": ("(j STRING) RETURNS ARRAY<STRING>", "json_object_keys(j)"),
    "simpleJSONHas": ("(j STRING, k STRING) RETURNS BOOLEAN",
                      "get_json_object(j, concat('$.', k)) IS NOT NULL"),
    "simpleJSONExtractInt": ("(j STRING, k STRING) RETURNS BIGINT",
                             "CAST(get_json_object(j, concat('$.', k)) AS BIGINT)"),
    "simpleJSONExtractString": ("(j STRING, k STRING) RETURNS STRING",
                                "get_json_object(j, concat('$.', k))"),
    "visitParamHas": ("(j STRING, k STRING) RETURNS BOOLEAN",
                      "get_json_object(j, concat('$.', k)) IS NOT NULL"),
    "visitParamExtractInt": ("(j STRING, k STRING) RETURNS BIGINT",
                             "CAST(get_json_object(j, concat('$.', k)) AS BIGINT)"),
}


#: CH aggregate -> native Spark SQL aggregate (documented rewrites;
#: aggregates cannot be SQL-UDF'd, and these are all built in anyway)
AGGREGATE_EQUIVALENTS: dict[str, str] = {
    "argMax(v, o)": "max_by(v, o)",
    "argMin(v, o)": "min_by(v, o)",
    "uniq(x)": "approx_count_distinct(x)",
    "uniqExact(x)": "count(DISTINCT x)",
    "quantile(p)(x)": "percentile(x, p)",
    "quantileExact(p)(x)": "percentile(x, p)",
    "median(x)": "percentile(x, 0.5)",
    "any(x)": "any_value(x)",
    "anyLast(x)": "max_by(x, <order>)",
    "groupArray(x)": "collect_list(x)",
    "groupUniqArray(x)": "collect_set(x)",
    "countIf(c)": "count_if(c)",
    "sumIf(x, c)": "sum(CASE WHEN c THEN x END)",
    "corr(x, y)": "corr(x, y)",
    "varPop(x)": "var_pop(x)",
    "stddevPop(x)": "stddev_pop(x)",
    "topK(k)(x)": "graphouse_spark.functions.chagg.approx_top_k",
    "sumMap(k, v)": "graphouse_spark.functions.chagg.sum_map",
    "windowFunnel(w)(t, ...)": "graphouse_spark.functions.behavior.window_funnel",
}

#: CH array-function family -> Spark SQL equivalent. These CANNOT be
#: SQL-UDF shims: CH's array functions are generic over element type
#: (SQL UDFs are monomorphic) and most take lambdas (unsupported in
#: SQL UDF bodies) — and CH puts the lambda FIRST (``arrayMap(x ->
#: f(x), arr)``) where Spark puts it last. The rewrites are mechanical:
ARRAY_EQUIVALENTS: dict[str, str] = {
    "arrayJoin(a)": "explode(a)  -- CH's row-multiplying form; posexplode for arrayEnumerate pairing",
    "arrayMap(x -> f, a)": "transform(a, x -> f)",
    "arrayFilter(x -> p, a)": "filter(a, x -> p)",
    "arrayExists(x -> p, a)": "exists(a, x -> p)",
    "arrayAll(x -> p, a)": "forall(a, x -> p)",
    "arrayReduce('agg', a)": "aggregate(a, init, (acc, x) -> ...) or explode+agg",
    "arraySum(a)": "aggregate(a, 0D, (acc, x) -> acc + x)",
    "arraySort(a)": "array_sort(a)",
    "arrayReverseSort(a)": "reverse(array_sort(a))",
    "arrayDistinct(a)": "array_distinct(a)",
    "arrayUniq(a)": "size(array_distinct(a))",
    "arrayEnumerate(a)": "sequence(1, size(a))  -- or posexplode(a) for (pos, x) rows",
    "arrayConcat(a, b)": "concat(a, b)",
    "arrayFlatten(a)": "flatten(a)",
    "arrayZip(a, b)": "arrays_zip(a, b)",
    "arraySlice(a, o, l)": "slice(a, o, l)",
    "arrayResize/arrayWithConstant": "array_repeat + concat",
    "has(a, x)": "array_contains(a, x)  -- also registered as a STRING-array SQL UDF",
    "hasAll(a, b)": "size(array_except(b, a)) = 0",
    "hasAny(a, b)": "arrays_overlap(a, b)",
    "indexOf(a, x)": "array_position(a, x)",
    "countEqual(a, x)": "size(filter(a, e -> e = x))",
    "range(n)": "sequence(0, n - 1)",
    "groupArray(x)": "collect_list(x)",
    "groupUniqArray(x)": "collect_set(x)",
}


#: sessions whose catalog already carries the shims — registration is
#: ~70 spark.sql() round trips (measured 0.7 s of driver latency), pure
#: session-level catalog setup, so do it once per session. Keyed on the
#: SESSION OBJECT (WeakSet), not applicationId: temporary functions are
#: per-SparkSession, and a cloned session (newSession(), thread-local
#: sessions) shares the applicationId but NOT the temp-function
#: registry — an id-keyed memo would silently skip registration there.
_REGISTERED: weakref.WeakSet = weakref.WeakSet()


def register_ch_dialect(spark: SparkSession, force: bool = False) -> int:
    """Register every CH scalar shim as a temporary SQL function.

    Idempotent (``CREATE OR REPLACE``) and memoized per session: temp
    functions live for the whole session, so re-registering them on
    every query construction only costs driver round trips. ``force``
    re-runs the DDL (e.g. after a deliberate DROP). Returns how many
    functions are live."""
    n_total = sum(len(f) for f in
                  (CH_SQL_FUNCTIONS, CH_URL_FUNCTIONS, CH_JSON_FUNCTIONS))
    if not force and spark in _REGISTERED:
        return n_total
    registered = 0
    for family in (CH_SQL_FUNCTIONS, CH_URL_FUNCTIONS, CH_JSON_FUNCTIONS):
        for name, (signature, body) in family.items():
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature} RETURN {body}"
            )
            registered += 1
    _REGISTERED.add(spark)
    return registered
