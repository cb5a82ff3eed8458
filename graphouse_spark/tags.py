"""Graphite tagged-series support (ENGINE EXTENSION).

The reference has no tag database — its model is a dotted-path tree
(``search/tree/MetricTree.java``); tagged names never reach it. This
module adds the graphite-web tag semantics on top of the same
``(metric, ts, value)`` frame the rest of the engine uses, the way
carbon + graphite-web 1.1 do it on their side of the wire
(graphite-web ``tags/utils.py``: series name carries the tags inline —
``disk.used;datacenter=dc1;rack=a2``):

- a tagged name is ``<name>[;key=value]...``; the path part doubles as
  the implicit ``name`` tag;
- the CANONICAL form sorts tags by key (graphite normalizes on ingest,
  so equal tag sets compare equal as strings);
- tagged series live in the DATA table only — they are invisible to
  the metric tree (graphite likewise keeps them out of the hierarchy
  and serves them exclusively through tag queries).

Everything here compiles to Catalyst expressions over the metric
STRING — no Python in any per-row path: the tag map is
``str_to_map``, the seriesByTag terms are equality/rlike predicates,
and a ``name=`` equality term becomes a metric PREFIX RANGE that the
sorted-by-metric parquet layout and the zonemap/bloom skip indexes
prune exactly like an untagged IN-list fetch.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: validator regexp admitting tagged names (opt-in on ingest; the
#: reference-default regexp in paths.py stays untouched). Charset per
#: graphite: tag keys/values may not contain ``;``, keys not ``!^=``,
#: values not ``~`` at the start. This structural check admits
#: ``path;k=v[;k=v]...`` with non-empty keys and values.
TAGGED_METRIC_REGEXP = (
    r"[-_0-9a-zA-Z\.]+(?:;[^;!^=~\s]+=[^;=~\s][^;=\s]*)*$"
)

_TERM_RE = re.compile(r"^([^;!=~\s]+)\s*(=~|!=~|=|!=)\s*(.*)$")


def parse_tagged(name: str) -> tuple[str, dict[str, str]]:
    """Split a (possibly tagged) metric name into ``(path, tags)``.

    The path is also returned under the implicit ``name`` tag, as in
    graphite-web ``tags/utils.py``.
    """
    parts = name.split(";")
    tags = {"name": parts[0]}
    for seg in parts[1:]:
        if "=" not in seg:
            raise ValueError(f"malformed tag segment {seg!r} in {name!r}")
        k, v = seg.split("=", 1)
        if not k or not v:
            raise ValueError(f"empty tag key/value in {name!r}")
        if k in tags:
            # duplicate key, or an explicit name= tag shadowing the
            # implicit path tag — both poison map construction
            raise ValueError(f"duplicate tag key {k!r} in {name!r}")
        tags[k] = v
    return parts[0], tags


def canonical(name: str) -> str:
    """Canonical spelling: path, then tags sorted by key (graphite
    normalizes on ingest so equal tag sets are string-equal)."""
    path, tags = parse_tagged(name)
    rest = sorted((k, v) for k, v in tags.items() if k != "name")
    return ";".join([path] + [f"{k}={v}" for k, v in rest])


def _tag_pairs(metric: Column) -> Column:
    """The ``k=v`` segments of a tagged name, in input order."""
    return F.filter(F.split(metric, ";"), lambda s: s.contains("="))


def canonical_col(metric: Column) -> Column:
    """:func:`canonical` as a Catalyst expression (ingest path —
    stays inside whole-stage codegen). Sorts by tag KEY — graphite's
    normalization — not by the whole ``k=v`` string (``dc=2`` must
    sort after ``dc-x=1`` even though ``=`` > ``-``)."""
    path = F.substring_index(metric, ";", 1)
    key = lambda s: F.substring_index(s, "=", 1)  # noqa: E731
    rest = F.array_sort(
        _tag_pairs(metric),
        lambda a, b: F.when(key(a) < key(b), -1)
        .when(key(a) > key(b), 1).otherwise(0))
    return F.when(
        metric.contains(";"),
        F.concat_ws(";", F.array(path), rest),
    ).otherwise(metric)


def valid_tag_structure(metric: Column) -> Column:
    """True when the tag segments are map-safe: no duplicate keys and
    no explicit ``name=`` tag (which would shadow the implicit path
    tag). The regexp validator cannot express this; ingest filters on
    it so one hostile line can never poison map construction for
    every later /tags query."""
    keys = F.transform(_tag_pairs(metric),
                       lambda s: F.substring_index(s, "=", 1))
    return (F.size(F.array_distinct(keys)) == F.size(keys)) & \
        ~F.array_contains(keys, "name")


def tags_map_col(metric: Column) -> Column:
    """``map<string,string>`` of a metric name's tags, INCLUDING the
    implicit ``name`` tag — pure ``split``/``str_to_map``, JVM-side."""
    path = F.substring_index(metric, ";", 1)
    # first-occurrence-wins dedup + drop explicit name= pairs BEFORE
    # building the map: str_to_map/map_concat throw DUPLICATED_MAP_KEY
    # on hostile rows, and a read-path throw would poison every /tags
    # query that touches the row (ingest filters such names, but the
    # read path must stay total for pre-existing or foreign data)
    pairs = _tag_pairs(metric)
    key = lambda s: F.substring_index(s, "=", 1)  # noqa: E731
    keys = F.transform(pairs, key)
    safe = F.filter(
        pairs,
        lambda s, i: (key(s) != "name")
        & (F.array_position(keys, key(s)) == i + F.lit(1)))
    tag_part = F.map_from_entries(F.transform(
        safe,
        lambda s: F.struct(
            key(s).alias("key"),
            F.substring(s, F.instr(s, "=") + F.lit(1),
                        F.length(s)).alias("value"))))
    base = F.create_map(F.lit("name"), path)
    return F.when(metric.contains(";"),
                  F.map_concat(base, tag_part)).otherwise(base)


def parse_term(term: str) -> tuple[str, str, str]:
    """``(key, op, value)`` of one seriesByTag term, with the same
    validation :func:`compile_term` applies (regex terms must
    compile)."""
    m = _TERM_RE.match(term.strip())
    if m is None:
        raise ValueError(f"malformed seriesByTag term {term!r}")
    key, op, value = m.group(1), m.group(2), m.group(3)
    if op in ("=~", "!=~"):
        try:
            re.compile(value)
        except re.error as exc:
            raise ValueError(f"bad regex in seriesByTag term {term!r}: {exc}")
    return key, op, value


def anchored_pattern(value: str) -> str:
    """Graphite ``=~`` semantics are ``re.match`` — anchor at start."""
    return value if value.startswith("^") else "^(?:" + value + ")"


def regex_literal_prefix(pattern: str) -> str:
    """The literal prefix every match of the (match-anchored) pattern
    must start with — '' when none can be proven.

    Used to bound rlike slice scans sargably: ``value`` is in sort-key
    position inside tag-index files, so adding
    ``value.startswith(prefix)`` to a regex predicate prunes row
    groups on min/max stats instead of running the regex over the
    whole slice (measured at the 10M envelope: a high-card
    ``host=~h1.*`` slice scan drops ~2x). Conservative by
    construction: any top-level alternation kills the prefix, a
    quantifier makes its operand non-guaranteed (except ``+``), and
    escape CLASSES (``\\d`` etc.) stop the scan."""
    if pattern.startswith("^"):
        pattern = pattern[1:]
    if "|" in pattern:
        # an alternation ANYWHERE may offer a branch that skips the
        # scanned chars (parsing nesting to prove otherwise isn't
        # worth it — graphite patterns with | rarely share a prefix)
        return ""
    metas = set(".^$*+?()[]{\\")
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            if nxt.isalnum():
                break  # escape class (\d, \w, \S...): not a literal
            lit, i = nxt, i + 2
        elif c not in metas:
            lit, i = c, i + 1
        else:
            break
        if i < len(pattern) and pattern[i] in "*?{+":
            if pattern[i] == "+":
                out.append(lit)  # x+ guarantees at least one x
            break
        out.append(lit)
    return "".join(out)


def index_exists_pred(key: str, op: str, value: str,
                      regex_values=None) -> tuple[Column, bool, bool]:
    """One seriesByTag term as an EXISTS test over index rows:
    ``(row_pred, positive, rewritten)`` — the term holds for a metric
    iff some row of the metric satisfies ``row_pred``
    (``positive=True``) or no row does (``positive=False``);
    ``rewritten`` reports whether a regex term was rewritten into a
    sargable value-IN-list (callers use it to rank selectivity):

    - ``k=v``    -> exists (k, v) row            (positive)
    - ``k=``     -> no k row at all              (negative)
    - ``k!=v``   -> no (k, v) row                (negative)
    - ``k!=``    -> exists k row                 (positive)
    - ``k=~p``   -> exists k row with value ~ p  (positive)
    - ``k!=~p``  -> no k row with value ~ p      (negative)

    Missing-tag semantics fall out exactly: a metric with no ``k``
    row fails every exists test, which satisfies every negative
    operator — the same outcomes :func:`compile_term` produces on the
    null map lookup.

    ``regex_values(key, anchored) -> list[str] | None``: optional
    rewrite hook — when it returns a value list (from the
    distinct-values sub-index), the regex exists-test becomes a
    sargable ``value IN (...)`` on the sorted (tag, value) layout
    instead of an rlike over the tag's slice. The rewrite applies to
    ``!=~`` terms too: it is safe on the anti-join side because the
    sub-index value list is a superset of live values."""
    tag_hit = F.col("tag") == key
    if op in ("=", "!="):
        if value == "":
            return tag_hit, op != "=", False
        return tag_hit & (F.col("value") == value), op == "=", False
    anchored = anchored_pattern(value)
    vals = regex_values(key, anchored) if regex_values is not None else None
    if vals is not None:
        pred = tag_hit & F.col("value").isin(vals)
    else:
        pred = tag_hit & F.col("value").rlike(anchored)
        # derive from the RAW value: the anchoring wrapper ^(?:...)
        # starts with a metachar and would always yield ''
        pfx = regex_literal_prefix(value)
        if pfx:
            # sargable bound: value is in sort-key position within
            # index files, so startswith prunes row groups the rlike
            # alone cannot
            pred = pred & F.col("value").startswith(pfx)
    return pred, op == "=~", vals is not None


def series_by_tag_on_index(idx: DataFrame, exprs: list[str],
                           metric_col: str = "metric",
                           regex_values=None,
                           universe: DataFrame | None = None) -> DataFrame:
    """seriesByTag over TAG-INDEX rows ``(metric, tag, value)`` ->
    distinct matching metric names, by SLICE INTERSECTION.

    Each term touches ONLY its own tag's index slice — sargable on
    the sorted (tag, value, metric) file layout, so row groups for
    unrelated tags are never read. Positive terms intersect via
    left-semi joins (most selective first: equality, then
    sub-index-rewritten IN-list regex, then plain rlike); negative
    terms subtract via left-anti joins. Total shuffle volume is the
    sum of the (filtered, metric-only) slice sizes — never the whole
    index, and never a per-name tag-map compile. With no positive
    term the universe is the implicit ``name`` tag's slice (every
    tagged series has one), evaluated as a single conditional
    aggregation — one exchange — rather than distinct + anti-joins.

    This is the plan you want at 10M+ names: the round-9 design
    (map-compile filter over all candidates) cost minutes because
    Catalyst pushed the O(k^2) map expression into a scan stage with
    file-bound parallelism; slices + joins keep every stage wide and
    every byte read attributable to a term."""
    if not exprs:
        raise ValueError("seriesByTag needs at least one term")
    base = name_equals_term(exprs)
    if base is not None:
        # sargable prefix range first (metric is the sort key)
        metric = F.col(metric_col)
        idx = idx.filter((metric == base) | metric.startswith(base + ";"))
    positives, negatives = [], []
    for t in exprs:
        key, op, value = parse_term(t)
        pred, positive, rewritten = index_exists_pred(key, op, value, regex_values)
        # selectivity rank: equality < IN-list-rewritten regex < bare
        # regex / tag-present
        rank = 0 if (op == "=" and value) else (1 if rewritten else 2)
        (positives if positive else negatives).append((rank, pred, key))
    positives.sort(key=lambda rp: rp[0])
    if positives:
        acc = idx.filter(positives[0][1]).select(metric_col).distinct()
        for _, pred, _key in positives[1:]:
            acc = acc.join(idx.filter(pred).select(metric_col),
                           metric_col, "left_semi")
        for _, pred, _key in negatives:
            acc = acc.join(idx.filter(pred).select(metric_col),
                           metric_col, "left_anti")
        return acc
    # ALL-NEGATIVE shape (no positive term — hostile/buggy clients
    # only; real graphite clients always send one): ONE pass instead
    # of universe-distinct + per-term anti-joins. The universe side
    # (every live tagged metric) unions with each negative term's
    # (filtered) slice, groups by metric once, and keeps metrics where
    # no negative row fired. Collapses 1 + 2n shuffles of the 10M-name
    # universe into one exchange — measured 4.2 s -> 2.4 s at the 10M
    # envelope (tools/tag_stress.py). The universe itself comes from
    # the compacted distinct-metric sub-index when the caller has one
    # (``universe``; 2 sorted columns, r12 verdict #3 — duplicates
    # from micro-batch appends are collapsed by the same groupBy) and
    # falls back to the main index's implicit ``name`` slice (every
    # tagged series has a name row).
    neg_preds = [pred for _, pred, _key in negatives]
    neg_keys = sorted({key for _, _p, key in negatives})
    if universe is not None:
        # with a SEPARATE universe the per-term flags are unnecessary:
        # a metric fails the set iff ANY negative predicate has a
        # matching row, so the exclusion side is one OR-filtered scan
        # of the negative tags' slices, and the answer is universe
        # ANTI-JOIN exclusions, distinct LAST (append duplicates ride
        # through the join and collapse once). The shuffle_hash hint
        # pins a SHUFFLED join: both sides exchange on metric and the
        # trailing distinct reuses that partitioning as a local agg —
        # letting AQE broadcast a small exclusion slice instead makes
        # the distinct re-exchange the near-universe result (measured
        # at the 10M envelope: k= 1.6 s, k!=v 1.4 s hinted vs 3.2 s
        # broadcast-then-distinct and 3.0 s for the r12 one-pass
        # aggregation this plan replaces).
        scan = neg_preds[0]
        for p in neg_preds[1:]:
            scan = scan | p
        excluded = (idx.filter(F.col("tag").isin(neg_keys)).filter(scan)
                    .select(metric_col))
        return (universe.select(metric_col)
                .join(excluded.hint("shuffle_hash"), metric_col,
                      "left_anti")
                .distinct())
    aggs = [F.max(F.when(p, 1).otherwise(0)).alias(f"_neg{i}")
            for i, p in enumerate(neg_preds)]
    scan = F.col("tag") == "name"
    for p in neg_preds:
        scan = scan | p
    # redundant coarse tag IN-list: an OR carrying an rlike branch is
    # not pushable to parquet on its own; the tag membership is, and
    # prunes every unrelated tag's row groups
    keys = sorted({"name", *neg_keys})
    rows = idx.filter(F.col("tag").isin(keys)).filter(scan)
    acc = rows.groupBy(metric_col).agg(*aggs)
    cond = F.lit(True)
    for i in range(len(neg_preds)):
        cond = cond & (F.col(f"_neg{i}") == 0)
    return acc.filter(cond).select(metric_col)


def compile_term(term: str, tags: Column) -> Column:
    """One seriesByTag term -> a boolean Column over the tag map.

    Graphite operator semantics (graphite-web ``tags/base.py``):

    - ``key=value``   exact match; empty value matches series
      WITHOUT the tag;
    - ``key!=value``  not equal (missing tag counts as non-equal;
      empty value means "tag present");
    - ``key=~expr``   regex, anchored at the start (``re.match``);
    - ``key!=~expr``  negated anchored regex (missing tag matches).
    """
    m = _TERM_RE.match(term.strip())
    if m is None:
        raise ValueError(f"malformed seriesByTag term {term!r}")
    key, op, value = m.group(1), m.group(2), m.group(3)
    if op in ("=~", "!=~"):
        try:
            re.compile(value)
        except re.error as exc:
            raise ValueError(f"bad regex in seriesByTag term {term!r}: {exc}")
    got = F.element_at(tags, key)
    if op == "=":
        if value == "":
            return got.isNull()
        return got == value
    if op == "!=":
        if value == "":
            return got.isNotNull()
        return got.isNull() | (got != value)
    anchored = value if value.startswith("^") else "^(?:" + value + ")"
    if op == "=~":
        return got.isNotNull() & got.rlike(anchored)
    return got.isNull() | ~got.rlike(anchored)


def has_positive_term(exprs: list[str]) -> bool:
    """Whether any term requires a NON-EMPTY tag match — the
    precondition graphite-web's TagDB puts on ``find_series`` (an
    all-negative term set is rejected there, so no real graphite
    client can send one). Mirrors :func:`index_exists_pred`'s
    positive/negative split without building Columns: positive =
    ``k=v`` (non-empty v), ``k!=`` (tag present), ``k=~p`` — EXCEPT
    an ``=~`` whose pattern matches the empty string (``k=~.*``,
    ``k=~(a)?``): graphite-web's TagDB (``tags/base.py``,
    ``matches_empty``) treats those as non-positive too, because they
    constrain nothing — and counting them positive here would let a
    match-everything regex bypass the all-negative 413 refusal while
    still costing a near-universe index slice scan."""
    for t in exprs:
        m = _TERM_RE.match(t.strip())
        if m is None:
            continue
        key, op, value = m.group(1), m.group(2), m.group(3)
        if (op == "=" and value) or (op == "!=" and not value):
            return True
        if op == "=~":
            try:
                if not re.match(anchored_pattern(value), ""):
                    return True
            except re.error:
                # unparseable regex: let the evaluator's ValueError
                # surface as a 400, not an all-negative 413
                return True
    return False


def is_all_negative(exprs: list[str]) -> bool:
    """True only when the set is NON-EMPTY, every term PARSES, and no
    term requires a non-empty match — exactly the shape graphite-web's
    TagDB refuses (the service answers 413). Empty sets are the
    caller's business, and a malformed term returns False so the
    evaluator's ValueError surfaces as a 400 instead of a misleading
    'all-negative refused'."""
    if not exprs:
        return False
    if not all(_TERM_RE.match(t.strip()) for t in exprs):
        return False
    return not has_positive_term(exprs)


def name_equals_term(exprs: list[str]) -> str | None:
    """The ``name=<literal>`` equality among the terms, if any — the
    handle that turns a tag query into a metric PREFIX RANGE the
    sorted parquet layout + zonemap prune (``name=X`` selects exactly
    ``X`` and ``X;...``)."""
    for t in exprs:
        m = _TERM_RE.match(t.strip())
        if m and m.group(1) == "name" and m.group(2) == "=" and m.group(3):
            return m.group(3)
    return None


def tagged_validator():
    """A :class:`~graphouse_spark.paths.MetricValidator` admitting
    tagged names — the opt-in ingest switch for the tag extension (the
    reference-default validator stays the default everywhere).

    ``min_dots=0``: graphite tag paths are routinely short
    (``cpu;host=web1``), so the reference's min-level rule does not
    apply to the tagged namespace."""
    from graphouse_spark.paths import MetricValidator

    return MetricValidator(metric_regexp=TAGGED_METRIC_REGEXP, min_dots=0)


def parse_tagged_lines(lines, updated=None, line_col: str = "value",
                       base_validator=None):
    """Graphite plaintext parse admitting tagged names, with canonical
    tag ordering applied on ingest (graphite normalizes tag order so
    equal tag sets are string-equal — making read-time LWW dedup and
    the prefix range work on tagged series unchanged).

    The relaxed rules apply ONLY to the tagged namespace: an untagged
    line must still satisfy the reference-default validator (min-dots
    included), so ``--tagged-ingest`` cannot leak short plain names
    into the metric tree. Names with duplicate tag keys or an explicit
    ``name=`` tag are dropped like any other invalid line — one such
    row would otherwise poison map construction for every later /tags
    query."""
    from graphouse_spark.paths import MetricValidator
    from graphouse_spark.sources.graphite import parse_lines

    parsed = parse_lines(lines, updated=updated,
                         validator=tagged_validator(), line_col=line_col)
    name = F.col("name")
    # untagged lines answer to the deployment's configured validator
    # (graphouse.metric-validation.* via base_validator), reference
    # defaults otherwise
    default_ok = (base_validator or MetricValidator()).valid_condition(name)
    parsed = parsed.filter(
        F.when(name.contains(";"), valid_tag_structure(name))
        .otherwise(default_ok))
    return parsed.withColumn("name", canonical_col(name))


def exploded_tag_rows(df, name_col: str, passthrough: list[str]):
    """``(metric, tag, value, *passthrough)`` rows of each (assumed
    distinct) name — row-for-row identical to
    ``explode(tags_map_col(name))`` but shaped for codegen (§4.1 of the
    optimization guide): instead of building a ``map`` through five
    interpreted higher-order-function passes plus ``map_from_entries``/
    ``map_concat`` and exploding it, posexplode the raw ``k=v`` SEGMENT
    strings and derive (tag, value) per exploded row with top-level
    ``substring_index``/``substring`` expressions (whole-stage
    codegen). Only two interpreted HOF passes remain per name (the
    segment filter and the keys array the first-occurrence-wins dedup
    needs). Measured on the 10M-name backfill: the explode stage's
    task time dropped ~2x (see OPTIMIZATION_r14.md).

    Semantics replicated exactly (pinned by
    tests/test_tags.py::test_exploded_tag_rows_matches_map_explode):
    implicit ``name`` row first, first-occurrence-wins duplicate-key
    dedup, explicit ``name=`` pairs dropped, untagged names yield only
    their ``name`` row, NULL name yields ('name', NULL)."""
    metric = F.col(name_col)
    path = F.substring_index(metric, ";", 1)
    pairs = _tag_pairs(metric)
    key = lambda s: F.substring_index(s, "=", 1)  # noqa: E731
    keys = F.transform(pairs, key)
    entries = F.when(metric.contains(";"),
                     F.concat(F.array(path), pairs)).otherwise(F.array(path))
    # position 0 is the implicit name entry; positions >= 1 are the k=v
    # segments, kept when not an explicit name= pair and when this is
    # the key's FIRST occurrence (array_position is 1-based over the
    # pairs array, whose 1-based index equals _i here)
    return (
        df.select(metric, *[F.col(c) for c in passthrough],
                  keys.alias("_keys"),
                  F.posexplode(entries).alias("_i", "_seg"))
        .filter((F.col("_i") == 0)
                | ((F.substring_index(F.col("_seg"), "=", 1) != "name")
                   & (F.array_position(F.col("_keys"),
                                       F.substring_index(F.col("_seg"), "=", 1))
                      == F.col("_i"))))
        .select(
            metric.alias("metric"),
            F.when(F.col("_i") == 0, F.lit("name"))
            .otherwise(F.substring_index(F.col("_seg"), "=", 1)).alias("tag"),
            F.when(F.col("_i") == 0, F.col("_seg"))
            .otherwise(F.substring(F.col("_seg"),
                                   F.instr(F.col("_seg"), "=") + F.lit(1),
                                   F.length(F.col("_seg")))).alias("value"),
            *[F.col(c) for c in passthrough],
        )
    )


def tag_index_rows(names, updated_col: str = "updated",
                   name_col: str = "name"):
    """Explode tagged names into persisted tag-index rows
    ``(metric, tag, value, date)`` — the ingest side of the tag index
    (TAGS_SCHEMA). One row per tag INCLUDING the implicit ``name``
    tag; ``date`` is the last-seen day derived from ``updated_col``,
    the partition the /tags lookback prunes on.

    Expects one row per distinct tagged name per batch (the caller
    groups by name with max(updated)); untagged names yield only
    their ``name`` row and are filtered by the caller."""
    with_date = names.withColumn(
        "_tag_date", F.to_date(F.from_unixtime(F.col(updated_col))))
    out = exploded_tag_rows(with_date, name_col, ["_tag_date"])
    return out.withColumnRenamed("_tag_date", "date")


def backfill_tag_index(spark, data_path: str, tags_path: str) -> int:
    """One-off index build from an EXISTING data table: distinct
    tagged names with their last-seen date. Run before first serving
    from the index so series ingested before the index existed don't
    vanish from /tags and seriesByTag (the incremental ingest appends
    only cover post-index batches). Parallel write, sorted files per
    date partition. Returns the row count.

    ONE fused pipeline writes the main index; the count and the
    distinct-values sub-index then derive from the WRITTEN parquet
    (columnar re-read), not from a cached intermediate. An earlier
    form localCheckpoint-ed the exploded rows to share them across
    the three jobs — at the 10M-name envelope the serialized block
    write/read made every downstream stage super-linear (10x names
    cost 17-23x cpu; the sort+write stage alone grew ~99x under the
    checkpoint's heap pressure). Fused: 10x names -> ~4x cpu,
    zero spill, and the main-index wall dropped 124 s -> 21 s.

    Crash safety: any PRE-EXISTING distinct-values sub-index is
    deleted BEFORE the main-index overwrite. Backfill introduces new
    (tag, value) pairs, so a stale sub-index surviving a crash between
    the two writes would NOT be a superset of the new main index —
    ``=~``/``!=~`` IN-list rewrites would silently drop live values
    (series missing from seriesByTag) until the next backfill. With
    the sub-index ABSENT instead, read_tag_values callers skip the
    regex prune (correct, slower) until a rerun completes both writes.
    """
    from graphouse_spark.fs import get_fs, writer_lease
    from graphouse_spark.sources.tables import tag_values_path

    fs = get_fs(tags_path, spark)
    vp = tag_values_path(tags_path)
    # cross-process writer lease (r12 verdict #2): a backfill racing a
    # delSeries/compaction rewrite on the same index must be refused
    with writer_lease(fs, tags_path):
        return _backfill_tag_index_locked(spark, data_path, tags_path,
                                          fs, vp)


def _backfill_tag_index_locked(spark, data_path: str, tags_path: str,
                               fs, vp: str) -> int:
    import time as _time

    from graphouse_spark import manifest as mf
    from graphouse_spark.schemas import TAGS_SCHEMA
    from graphouse_spark.sources.tables import (
        read_data, read_tags, tag_index_writer, tag_values_files,
        tag_values_path)

    from graphouse_spark.sources.tables import tag_metrics_path

    mp = tag_metrics_path(tags_path)
    manifest = mf.manifest_mode(fs)
    if manifest:
        # rename-less store: the TOMBSTONE manifest is the "sub-index
        # absent" signal (readers fall back slow-correct until all
        # flips land); the old generations' files stay for in-flight
        # readers and age out of the grace window
        mf.tombstone_table(fs, vp, int(_time.time()))
        mf.tombstone_table(fs, mp, int(_time.time()))
    else:
        fs.delete(vp)
        fs.delete(mp)
    names = (read_data(spark, data_path)
             .filter(F.col("metric").contains(";"))
             .groupBy("metric")
             .agg(F.max("date").alias("date")))
    # codegen explode form (§4.1): row-identical to
    # explode(tags_map_col(metric)), ~2x less task time on the
    # 10M-name envelope's dominant stage — see exploded_tag_rows
    rows = exploded_tag_rows(names, "metric", ["date"])
    from graphouse_spark.sources.tables import _metrics_slice_rows

    if manifest:
        now = int(_time.time())
        gen = mf.new_gen_name(now)
        stage = f"{tags_path.rstrip('/')}/{gen}"
        tag_index_writer(rows).mode("overwrite").partitionBy("date").parquet(stage)
        written = (spark.read.schema(TAGS_SCHEMA)
                   .option("basePath", stage).parquet(stage))
        n = written.count()
        nf = tag_values_files(n)  # scale-adaptive sort/file spread (§2)
        mf.commit_table_generation(fs, tags_path, gen, now)
        vgen = mf.new_gen_name(now)
        (written.groupBy("tag", "value").agg(F.max("date").alias("date"))
         .repartition(nf, "tag", "value")
         .sortWithinPartitions("tag", "value")
         .write.mode("overwrite").parquet(f"{vp.rstrip('/')}/{vgen}"))
        mf.commit_table_generation(fs, vp, vgen, now)
        mgen = mf.new_gen_name(now)
        (_metrics_slice_rows(written)
         .repartition(nf, "metric")
         .sortWithinPartitions("metric")
         .write.mode("overwrite").parquet(f"{mp.rstrip('/')}/{mgen}"))
        mf.commit_table_generation(fs, mp, mgen, now)
        return n
    tag_index_writer(rows).mode("overwrite").partitionBy("date").parquet(tags_path)
    written = read_tags(spark, tags_path)
    n = written.count()
    nf = tag_values_files(n)  # scale-adaptive sort/file spread (§2)
    (written.groupBy("tag", "value").agg(F.max("date").alias("date"))
     .repartition(nf, "tag", "value")
     .sortWithinPartitions("tag", "value")
     .write.mode("overwrite").parquet(tag_values_path(tags_path)))
    (_metrics_slice_rows(written)
     .repartition(nf, "metric")
     .sortWithinPartitions("metric")
     .write.mode("overwrite").parquet(mp))
    return n


def alias_by_tags(series, tag_names: list[str],
                  metric_col: str = "metric"):
    """graphite ``aliasByTags(series, *tags)``: each series renamed to
    the dot-join of its values for the requested tags (missing tags
    drop out, like graphite's ``'.'.join(filter(None, ...))``). One
    projection, no shuffle."""
    tmap = tags_map_col(F.col(metric_col))
    vals = [F.element_at(tmap, t) for t in tag_names]
    return series.withColumn(metric_col, F.concat_ws(".", *vals))


def group_by_tags(series, function: str, tag_names: list[str],
                  metric_col: str = "metric", ts_col: str = "ts",
                  value_col: str = "value"):
    """graphite ``groupByTags(series, func, *tags)``: re-key every
    series to its value-tuple for the requested tags, then aggregate
    aligned points — the tag twin of groupByNodes, one projection plus
    one partial/final agg keyed on (new name, ts).

    Output names use the canonical tagged spelling: the ``name`` tag's
    value when ``name`` is among the grouped tags (else the callback
    name, as graphite does when the name tag is aggregated away),
    followed by the grouped ``;key=value`` pairs sorted by key."""
    from graphouse_spark.functions.timeseries import _resolve_agg

    if not tag_names:
        raise ValueError("groupByTags needs at least one tag")
    agg = _resolve_agg(function)
    tmap = tags_map_col(F.col(metric_col))
    vals = {t: F.coalesce(F.element_at(tmap, t), F.lit("")) for t in tag_names}
    name_part = vals["name"] if "name" in tag_names else F.lit(function)
    pairs = [F.concat(F.lit(f";{t}="), vals[t])
             for t in sorted(t for t in tag_names if t != "name")]
    key = F.concat(name_part, *pairs) if pairs else name_part
    return (
        series.withColumn(metric_col, key)
        .groupBy(metric_col, ts_col)
        .agg(F.round(agg(value_col), 6).alias(value_col))
    )


def series_by_tag(series, exprs: list[str],
                  metric_col: str = "metric"):
    """Filter a ``(metric, ts, value)`` frame to the series matching
    ALL seriesByTag terms. One projection + filter — no shuffle; with
    a ``name=`` term the prefix range reaches the scan as a pushed
    predicate."""
    if not exprs:
        raise ValueError("seriesByTag needs at least one term")
    metric = F.col(metric_col)
    out = series
    base = name_equals_term(exprs)
    if base is not None:
        # sargable prefix range first: pushed to the parquet scan and
        # prunable by the zonemap (metric is the sort key)
        out = out.filter((metric == base) |
                         metric.startswith(base + ";"))
    tags = tags_map_col(metric)
    cond = None
    for t in exprs:
        c = compile_term(t, tags)
        cond = c if cond is None else (cond & c)
    return out.filter(cond)
