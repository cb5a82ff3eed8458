"""The gateway facade — graphouse's three HTTP surfaces as functions.

Mirrors (without the HTTP plumbing):
- ``/search``      -> :meth:`GraphouseService.search`
  (MetricSearchServlet.java:141-154; newline-separated names, dirs
  keep the trailing dot — the graphite-web plugin's contract,
  graphouse.py:202-225)
- ``/metricData``  -> :meth:`GraphouseService.metric_data`
  (MetricDataServiceServlet.java:44-98; JSON
  ``{name: {start, end, step, points}}``, graphouse.py:119-131)
- ``/ban /approve /hide /multiModify`` -> :meth:`GraphouseService.modify`
  (MetricSearchServlet.java:115-139)

State: the driver-side :class:`MetricTree` index serves name lookups
(bootstrapped from the ``metrics`` table, S8); data queries run as
Spark jobs over the ``data`` table. Mutations append rows to the
``metrics`` table AND update the index — the same dual-write the
reference performs (tree + UpdateMetricQueueService).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import time as _time

from pyspark.sql import SparkSession

from graphouse_spark.globs import contains_expressions
from graphouse_spark.plans.metricdata import MetricDataService
from graphouse_spark.retention import CombinedRetentionProvider, DefaultRetentionProvider
from graphouse_spark.sources.tables import read_data, read_metrics, write_metrics
from graphouse_spark.status import MetricStatus
from graphouse_spark.tree_index import MetricTree


#: trailing ``ORDER BY col [ASC|DESC] WITH FILL [FROM a] [TO b]
#: [STEP s] [LIMIT n]`` — the CH gap-fill spelling. Applied to the
#: statement's closing CODE segment only (token-safe).
_WITH_FILL_RE = re.compile(
    r"ORDER\s+BY\s+([A-Za-z_]\w*)\s*(ASC|DESC)?\s+WITH\s+FILL"
    r"(?:\s+FROM\s+(-?\d+))?(?:\s+TO\s+(-?\d+))?(?:\s+STEP\s+(\d+))?"
    r"(?:\s+INTERPOLATE\s*\((.+)\))?"
    r"(?:\s+LIMIT\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_interpolate_items(body: str):
    """Split a CH ``INTERPOLATE (...)`` body on top-level commas into
    ``col`` / ``col AS expr`` entries. Returns (names, exprs_by_name).
    Entries chain CH-style: the expression is evaluated over the
    previous output row (operators/gapfill.stepped_fill_rows_expr)."""
    items, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(body[start:i])
            start = i + 1
    items.append(body[start:])
    names, exprs = [], {}
    for it in items:
        m = re.match(r"\s*([A-Za-z_]\w*)\s*(?:AS\s+(.+))?\s*$", it,
                     re.IGNORECASE | re.DOTALL)
        if m is None:
            raise ValueError(
                f"INTERPOLATE entries must be `col` or `col AS expr` "
                f"(got {it.strip()!r})")
        names.append(m.group(1))
        if m.group(2) is not None and m.group(2).strip():
            exprs[m.group(1)] = m.group(2).strip()
    return names, exprs


def _extract_with_fill(query: str):
    """Detect and strip a trailing CH ``WITH FILL`` clause.

    Returns ``(spec | None, query_without_fill)``. The inner query
    keeps its ``ORDER BY col [DESC]``; a trailing LIMIT is hoisted
    into the spec because CH applies LIMIT AFTER filling."""
    from graphouse_spark.api.sqlguard import tokenize

    segs = tokenize(query)
    idx = None
    for i in range(len(segs) - 1, -1, -1):
        if segs[i].kind == "comment":
            continue
        if segs[i].kind == "code":
            idx = i
        break
    if idx is None:
        return None, query
    m = _WITH_FILL_RE.search(segs[idx].text)
    if m is None:
        return None, query
    col, d, frm, to, step, interp, lim = m.groups()
    desc = (d or "").upper() == "DESC"
    # CH INTERPOLATE (col, col2 AS expr, ...): fill rows carry the
    # previous row's value (plain form) or evaluate the expression
    # over the previous output row (AS form; expressions chain across
    # consecutive fill rows, FillingTransform semantics). Caveat: an
    # expression containing a string literal splits the tokenizer's
    # code segment, so the clause is not recognized — same posture as
    # every other token-safe trailing-clause rewrite here.
    interp_names, interp_exprs = (
        _parse_interpolate_items(interp) if interp else ([], {}))
    spec = {
        "col": col,
        "desc": desc,
        "from": None if frm is None else int(frm),
        "to": None if to is None else int(to),
        "step": int(step) if step else 1,
        "interpolate": interp_names,
        "interpolate_exprs": interp_exprs,
        "limit": None if lim is None else int(lim),
    }
    if spec["step"] <= 0:
        raise ValueError("WITH FILL STEP must be a positive integer")
    segs[idx].text = (segs[idx].text[:m.start()]
                      + f"ORDER BY {col}{' DESC' if desc else ''}")
    return spec, "".join(s.text for s in segs)


#: trailing CH ``LIMIT n BY col[, col...] [LIMIT m]`` — first n rows
#: per distinct key (in result order), THEN the plain limit.
_LIMIT_BY_RE = re.compile(
    r"\bLIMIT\s+(\d+)\s+BY\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)"
    r"(?:\s+LIMIT\s+(\d+))?\s*;?\s*$",
    re.IGNORECASE,
)


#: trailing CH ``FORMAT <name>`` — admins append it to the query text;
#: maps onto the fmt parameter like the CH HTTP interface does.
_FORMAT_RE = re.compile(
    r"\bFORMAT\s+(TSVWithNames|TabSeparatedWithNames|TSV|TabSeparated"
    r"|JSON|JSONCompact|JSONEachRow"
    r"|CSVWithNames|CSV|PrettyCompact|Pretty|Vertical)\s*;?\s*$",
    re.IGNORECASE,
)

_FORMAT_NAMES = {"tsv": "TSV", "tabseparated": "TSV",
                 "tsvwithnames": "TSVWithNames",
                 "tabseparatedwithnames": "TSVWithNames",
                 "json": "JSON", "jsoncompact": "JSON",
                 "jsoneachrow": "JSONEachRow",
                 "csv": "CSV", "csvwithnames": "CSVWithNames",
                 "pretty": "PrettyCompact",
                 "prettycompact": "PrettyCompact",
                 "vertical": "Vertical"}


def _render_pretty(fields, rows, totals_row=None) -> str:
    """CH ``PrettyCompact``: one box with the column names embedded in
    the top border, numeric columns right-aligned (CH's own rule), a
    ``Totals:`` block when WITH TOTALS produced one."""
    names = [f.name for f in fields]
    numeric = [f.dataType.simpleString() in
               ("tinyint", "smallint", "int", "bigint", "float", "double")
               or f.dataType.simpleString().startswith("decimal")
               for f in fields]

    def cell(v):
        return "\u1d3a\u1d41\u1d38\u1d38" if v is None else str(v)

    def block(body_rows) -> str:
        grid = [[cell(v) for v in r] for r in body_rows]
        widths = [max([len(n)] + [len(g[i]) for g in grid])
                  for i, n in enumerate(names)]
        top = "┌─" + "─┬─".join(
            n + "─" * (w - len(n)) for n, w in zip(names, widths)) + "─┐"
        lines = [top]
        for g in grid:
            cells = [c.rjust(w) if num else c.ljust(w)
                     for c, w, num in zip(g, widths, numeric)]
            lines.append("│ " + " │ ".join(cells) + " │")
        lines.append("└─" + "─┴─".join("─" * w for w in widths) + "─┘")
        return "\n".join(lines) + "\n"

    out = block(rows)
    if totals_row is not None:
        out += "\nTotals:\n" + block([totals_row])
    return out


def _render_vertical(fields, rows, totals_row=None) -> str:
    """CH ``Vertical``: one ``name: value`` line per column per row —
    the wide-row inspection format (``\\G`` in the CH client)."""
    names = [f.name for f in fields]
    width = max((len(n) for n in names), default=0)
    chunks = []
    for i, r in enumerate(rows, 1):
        head = f"Row {i}:\n" + "─" * 6
        body = "\n".join(
            f"{n.rjust(width)}: {'ᴺᵁᴸᴸ' if v is None else v}"
            for n, v in zip(names, r))
        chunks.append(head + "\n" + body)
    if totals_row is not None:
        body = "\n".join(
            f"{n.rjust(width)}: {'ᴺᵁᴸᴸ' if v is None else v}"
            for n, v in zip(names, totals_row))
        chunks.append("Totals:\n" + "─" * 7 + "\n" + body)
    return "\n\n".join(chunks) + ("\n" if chunks else "")


def _extract_format(query: str):
    """Detect and strip a trailing CH ``FORMAT <name>`` clause.
    Returns ``(fmt | None, query_without_clause)``."""
    from graphouse_spark.api.sqlguard import tokenize

    segs = tokenize(query)
    idx = None
    for i in range(len(segs) - 1, -1, -1):
        if segs[i].kind == "comment":
            continue
        if segs[i].kind == "code":
            idx = i
        break
    if idx is None:
        return None, query
    m = _FORMAT_RE.search(segs[idx].text)
    if m is None:
        return None, query
    segs[idx].text = segs[idx].text[:m.start()]
    return _FORMAT_NAMES[m.group(1).lower()], "".join(s.text for s in segs)


def _extract_limit_by(query: str):
    """Detect and strip a trailing CH ``LIMIT n BY cols [LIMIT m]``.

    Returns ``(spec | None, query_without_clause)``; applied to the
    collected result (order preserved from the statement's ORDER BY),
    like :func:`_apply_with_fill`."""
    from graphouse_spark.api.sqlguard import tokenize

    segs = tokenize(query)
    idx = None
    for i in range(len(segs) - 1, -1, -1):
        if segs[i].kind == "comment":
            continue
        if segs[i].kind == "code":
            idx = i
        break
    if idx is None:
        return None, query
    m = _LIMIT_BY_RE.search(segs[idx].text)
    if m is None:
        return None, query
    n, cols, lim = m.groups()
    spec = {"n": int(n),
            "by": [c.strip() for c in cols.split(",")],
            "limit": None if lim is None else int(lim)}
    segs[idx].text = segs[idx].text[:m.start()]
    return spec, "".join(s.text for s in segs)


def _apply_limit_by(rows, schema, spec):
    """First ``n`` rows per distinct ``by``-tuple, in result order —
    CH LIMIT BY semantics (the "top-N per group" admin spelling)."""
    names = [f.name for f in schema.fields]
    for c in spec["by"]:
        if c not in names:
            raise ValueError(f"LIMIT BY column {c!r} is not in the result")
    seen: dict = {}
    out = []
    for r in rows:
        key = tuple(r[c] for c in spec["by"])
        k = seen.get(key, 0)
        if k < spec["n"]:
            out.append(r)
            seen[key] = k + 1
    if spec["limit"] is not None:
        out = out[:spec["limit"]]
    return out


# WITH FILL semantics live in operators.gapfill (stepped_fill_rows /
# stepped_fill_frame / stepped_fill) — ONE implementation shared with
# the render-path grid machinery; the router picks the driver loop for
# small results and the distributed sequence-explode path for large
# expansions, and refuses unbounded FROM/TO ranges.


def _code_view(query: str):
    """Tokenize ``query`` and return ``(text, search)`` where ``text``
    is the original statement and ``search`` is a same-length shadow
    with every non-code character (string literals, quoted
    identifiers, comments) replaced by ``\\x00`` — so regexes and
    paren counting over ``search`` can never match or count inside
    attacker-controlled literal content, while slices of ``text``
    preserve it verbatim."""
    from graphouse_spark.api import sqlguard

    segs = sqlguard.tokenize(query)
    text = "".join(s.text for s in segs)
    search = "".join(
        s.text if s.kind == "code" else "\x00" * len(s.text) for s in segs
    )
    return text, search


def _depth_at(search: str):
    """Paren depth before each character of ``search`` (code chars
    only — masked chars can't open or close a group)."""
    depths, d = [], 0
    for c in search:
        depths.append(d)
        if c == "(":
            d += 1
        elif c == ")":
            d -= 1
    return depths


def _select_alias_map(sel_part: str) -> dict:
    """Map each explicit ``expr AS alias`` in a ``SELECT ...`` prefix to
    its defining expression (alias lowercased — Spark resolves
    identifiers case-insensitively by default). Only top-level items
    with a trailing ``AS <ident>`` are mapped; everything else (bare
    columns, ``*``, implicit aliases) is left alone."""
    text, search = _code_view(sel_part)
    m = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?", search, re.IGNORECASE)
    body = m.end() if m else 0
    depths = _depth_at(search)
    spans, start = [], body
    for i in range(body, len(search)):
        if search[i] == "," and depths[i] == 0:
            spans.append((start, i))
            start = i + 1
    spans.append((start, len(search)))
    out = {}
    for s, e in spans:
        am = re.search(r"\bAS\s+(`?)(\w+)\1\s*$", search[s:e], re.IGNORECASE)
        if am is not None:
            expr = text[s:s + am.start()].strip()
            if expr:
                out[am.group(2).lower()] = expr
    return out


def _parse_call(text: str, search: str, open_idx: int):
    """Parse a balanced ``( ... )`` group starting at
    ``text[open_idx] == '('``. Returns ``(args, end)`` where ``args``
    are the top-level comma-split argument strings (original text,
    literals intact) and ``end`` is the index just past ``)``."""
    from graphouse_spark.api import sqlguard

    depth, args, buf = 0, [], []
    i, n = open_idx, len(text)
    while i < n:
        c = search[i]
        if c == "(":
            depth += 1
            if depth > 1:
                buf.append(text[i])
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return args, i + 1
            buf.append(text[i])
        elif c == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(text[i])
        i += 1
    raise sqlguard.GuardError("unbalanced parentheses in aggregate call")


#: CH -If / parameterized-quantile aggregate spellings served by
#: /query. The -If combinators rewrite to CASE-gated Spark aggregates
#: (NULLs fall out of the aggregate exactly like CH's filtered rows);
#: ``quantile(p)(x)``'s two-group syntax — which Spark cannot parse at
#: all — becomes ``percentile[_approx](x, p)``. Case-sensitive, like
#: ClickHouse itself.
_CH_IF_TEMPLATES = {
    # sumIf of zero matching rows is 0 in CH, not NULL
    "sumIf": "coalesce(sum(CASE WHEN {c} THEN {x} END), 0)",
    "avgIf": "avg(CASE WHEN {c} THEN {x} END)",
    "minIf": "min(CASE WHEN {c} THEN {x} END)",
    "maxIf": "max(CASE WHEN {c} THEN {x} END)",
    "uniqIf": "approx_count_distinct(CASE WHEN {c} THEN {x} END)",
    "uniqExactIf": "count(DISTINCT CASE WHEN {c} THEN {x} END)",
    "anyIf": "any_value(CASE WHEN {c} THEN {x} END)",
}
#: parameterized family: name -> (spark function, exact?)
_CH_QUANTILE_FUNCS = {
    "quantile": "percentile_approx",
    "quantileTDigest": "percentile_approx",
    "quantileExact": "percentile",
    "quantiles": "percentile_approx",
    "quantilesExact": "percentile",
    "quantileExactWeighted": "percentile",
}
_CH_AGG_NAME_RE = re.compile(
    r"(?<![\w.])(countIf|sumIf|avgIf|minIf|maxIf|uniqIf|uniqExactIf|anyIf|"
    r"uniqExact|sumDistinct|avgWeighted|quantilesExact|quantiles|"
    r"quantileExactWeighted|quantileTDigest|quantileExact|quantile)\s*\("
)


def _rewrite_combinator_aggs(query: str) -> str:
    """Rewrite CH combinator/parameterized aggregates to Spark
    spellings, one leftmost occurrence per pass until none remain.
    Token-safe: names never match inside literals, argument splitting
    counts parens/commas on code characters only, and each pass
    re-tokenizes the rewritten statement (argument text is spliced
    verbatim, literals and all)."""
    from graphouse_spark.api import sqlguard

    for _ in range(64):
        text, search = _code_view(query)
        m = _CH_AGG_NAME_RE.search(search)
        if m is None:
            return query
        name = m.group(1)
        args, end = _parse_call(text, search, m.end() - 1)
        if name in _CH_QUANTILE_FUNCS:
            # two-group syntax: quantile(p[, ...])(x[, w])
            j = end
            while j < len(text) and text[j].isspace():
                j += 1
            if j >= len(text) or search[j] != "(":
                raise sqlguard.GuardError(
                    f"{name} uses parameterized syntax {name}(p)(expr)")
            params = args
            args, end = _parse_call(text, search, j)
            fn = _CH_QUANTILE_FUNCS[name]
            if name.startswith("quantiles"):
                repl = f"{fn}({args[0]}, array({', '.join(params)}))"
            elif name == "quantileExactWeighted":
                if len(args) != 2:
                    raise sqlguard.GuardError(
                        "quantileExactWeighted takes (p)(expr, weight)")
                repl = f"{fn}({args[0]}, {params[0]}, {args[1]})"
            else:
                repl = f"{fn}({args[0]}, {params[0]})"
        elif name == "countIf":
            if len(args) != 1:
                raise sqlguard.GuardError("countIf takes one condition")
            repl = f"count_if({args[0]})"
        elif name == "uniqExact":
            repl = f"count(DISTINCT {', '.join(args)})"
        elif name == "sumDistinct":
            if len(args) != 1:
                raise sqlguard.GuardError("sumDistinct takes one expression")
            repl = f"sum(DISTINCT {args[0]})"
        elif name == "avgWeighted":
            if len(args) != 2:
                raise sqlguard.GuardError("avgWeighted takes (expr, weight)")
            x, w = args
            repl = f"(sum(({x}) * ({w})) / sum({w}))"
        else:
            if len(args) != 2:
                raise sqlguard.GuardError(f"{name} takes (expr, condition)")
            repl = _CH_IF_TEMPLATES[name].format(x=args[0], c=args[1])
        query = text[:m.start()] + repl + text[end:]
    raise sqlguard.GuardError("aggregate rewrite did not converge")


_MACRO_CALL_RE = re.compile(r"(?<![\w.])([A-Za-z_]\w*)\s*\(")
_MACRO_SIG_RE = re.compile(r"^\((.*)\)\s+RETURNS\s", re.DOTALL)


def _expand_ch_macros(expr: str) -> str:
    """Inline-expand CH dialect functions (registered as Spark SQL
    UDFs by ``chdialect``) into their SQL bodies. Needed wherever
    Spark bans SQL UDFs — generator expressions (ARRAY JOIN ->
    LATERAL VIEW) raise UNSUPPORTED_SQL_UDF_USAGE — and safe because
    every dialect body is pure built-in SQL by construction. All
    parameters substitute in ONE pass (no macro capture when an
    argument's text contains another parameter's name)."""
    from graphouse_spark import chdialect

    lower = {
        k.lower(): v
        for t in (chdialect.CH_SQL_FUNCTIONS, chdialect.CH_URL_FUNCTIONS,
                  chdialect.CH_JSON_FUNCTIONS)
        for k, v in t.items()
    }
    for _ in range(16):
        text, search = _code_view(expr)
        hit = None
        for m in _MACRO_CALL_RE.finditer(search):
            if m.group(1).lower() in lower:
                hit = m
                break
        if hit is None:
            return expr
        sig, body = lower[hit.group(1).lower()]
        params = [p.strip().split()[0]
                  for p in _MACRO_SIG_RE.match(sig).group(1).split(",")
                  if p.strip()]
        args, end = _parse_call(text, search, hit.end() - 1)
        if len(args) != len(params):
            from graphouse_spark.api import sqlguard
            raise sqlguard.GuardError(
                f"{hit.group(1)} takes {len(params)} argument(s)")
        sub = {p: f"({a})" for p, a in zip(params, args)}
        alt = re.compile(
            r"\b(" + "|".join(re.escape(p) for p in params) + r")\b")
        from graphouse_spark.api import sqlguard
        expanded = "".join(
            alt.sub(lambda mm: sub[mm.group(1)], s.text)
            if s.kind == "code" else s.text
            for s in sqlguard.tokenize(body))
        expr = text[:hit.start()] + f"({expanded})" + text[end:]
    return expr


_ARRAY_JOIN_RE = re.compile(r"\b(LEFT\s+)?ARRAY\s+JOIN\s+", re.IGNORECASE)
_ARRAY_JOIN_AS_RE = re.compile(r"\s+AS\s+([A-Za-z_]\w*)", re.IGNORECASE)
#: clause keywords that END an ARRAY JOIN expression — an `AS` found
#: past one of these belongs to a later clause, not the array alias
_ARRAY_JOIN_STOP_RE = re.compile(
    r"\s+(WHERE|GROUP|HAVING|ORDER|LIMIT|UNION|SETTINGS|FORMAT|JOIN"
    r"|LEFT|RIGHT|INNER|FULL|CROSS|PREWHERE|WINDOW)\b", re.IGNORECASE)


def _rewrite_array_join(query: str) -> str:
    """CH ``[LEFT] ARRAY JOIN <expr> AS <name>`` -> Spark
    ``LATERAL VIEW [OUTER] explode(<expr>) __ajN AS <name>``.

    Single-array form only (CH's comma list has zip semantics Spark's
    LATERAL VIEW chain cannot express; a comma list falls through to
    Spark's parser, which rejects it with its own error). LEFT keeps
    empty-array rows as NULL where CH substitutes the element-type
    default — the one documented divergence."""
    out, k = query, 0
    for _ in range(16):
        text, search = _code_view(out)
        m = _ARRAY_JOIN_RE.search(search)
        if m is None:
            return out
        depths = _depth_at(search)
        base = depths[m.start()]
        i, n = m.end(), len(text)
        as_m = None
        while i < n:
            if depths[i] == base and search[i].isspace():
                # a same-depth clause keyword before any AS means the
                # array expression has no alias — raise OUR error
                # instead of letting a later clause's AS get swallowed
                # into explode() and produce a confusing Spark parse
                # error (e.g. `ARRAY JOIN arr JOIN b AS c`)
                if _ARRAY_JOIN_STOP_RE.match(search, i):
                    break
                as_m = _ARRAY_JOIN_AS_RE.match(search, i)
                if as_m is not None:
                    break
            i += 1
        if as_m is None:
            from graphouse_spark.api import sqlguard
            raise sqlguard.GuardError(
                "ARRAY JOIN needs `<expr> AS <name>` (single array)")
        expr = _expand_ch_macros(text[m.end():i].strip())
        outer = "OUTER " if m.group(1) else ""
        repl = f"LATERAL VIEW {outer}explode({expr}) __aj{k} AS {as_m.group(1)}"
        out = text[:m.start()] + repl + text[as_m.end():]
        k += 1
    return out


_WITH_TOTALS_RE = re.compile(r"\bWITH\s+TOTALS\b", re.IGNORECASE)
_TOTALS_GROUP_BY_RE = re.compile(r"\bGROUP\s+BY\b", re.IGNORECASE)
_TOTALS_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_TOTALS_TAIL_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)\s*;?\s*$", re.IGNORECASE)
_TOTALS_COL = "__gh_totals"


def _extract_with_totals(query: str):
    """Detect a top-level CH ``GROUP BY <cols> WITH TOTALS`` and
    rewrite it to ``GROUP BY GROUPING SETS ((<cols>), ())`` with a
    hidden ``grouping_id() AS __gh_totals`` marker appended to the
    select list — one aggregation pass computes both the grouped rows
    and the totals row, exactly what CH's WITH TOTALS does in a single
    scan. Returns ``(spec | None, rewritten_query)``; the caller
    splits rows on the marker and serializes the totals row separately
    (blank-line-separated in TabSeparated, ``totals`` key in JSON,
    both the CH HTTP formats). A trailing ``LIMIT n`` is lifted into
    the spec so it bounds the data rows, not the totals row."""
    text, search = _code_view(query)
    m = _WITH_TOTALS_RE.search(search)
    if m is None:
        return None, query
    depths = _depth_at(search)
    if depths[m.start()] != 0:
        return None, query  # subquery totals: let Spark's parser reject
    gb = None
    for g in _TOTALS_GROUP_BY_RE.finditer(search, 0, m.start()):
        if depths[g.start()] == 0:
            gb = g
    frm = None
    if gb is not None:
        for f in _TOTALS_FROM_RE.finditer(search, 0, gb.start()):
            if depths[f.start()] == 0:
                frm = f
    if gb is None or frm is None:
        from graphouse_spark.api import sqlguard
        raise sqlguard.GuardError(
            "WITH TOTALS needs a top-level GROUP BY over a FROM clause")
    spec = {"limit": None}
    tail = text[m.end():]
    lm = _TOTALS_TAIL_LIMIT_RE.search(search[m.end():])
    if lm is not None:
        spec["limit"] = int(lm.group(1))
        tail = text[m.end():m.end() + lm.start()]
    # CH's default totals_mode is after_having_exclusive: with a
    # HAVING, the totals row aggregates ONLY rows belonging to groups
    # that PASS the predicate. GROUPING SETS alone can't express that
    # (its () row sees all input rows), so when a depth-0 HAVING is
    # present we inject a group-level semi-filter into the WHERE
    # clause — `(cols) IN (SELECT cols FROM (<original query with
    # HAVING>))` — then run GROUPING SETS over the pre-filtered rows
    # with no outer HAVING at all (data rows are already exactly the
    # passing groups; the () row must not be filtered). One documented
    # divergence: a group whose key is NULL never satisfies the IN
    # (SQL three-valued logic), so NULL-keyed groups that pass HAVING
    # are excluded from totals where CH would include them.
    t_text, t_search = _code_view(tail)
    t_depths = _depth_at(t_search)
    hm = None
    for h in re.finditer(r"\bHAVING\b", t_search, re.IGNORECASE):
        if t_depths[h.start()] == 0:
            hm = h
            break
    cols = text[gb.end():m.start()].strip()
    sel_part = text[:frm.start()]
    from_part = text[frm.start():gb.start()]
    if hm is not None:
        pend = len(t_text)
        for o in re.finditer(r"\bORDER\s+BY\b", t_search, re.IGNORECASE):
            if o.start() > hm.end() and t_depths[o.start()] == 0:
                pend = o.start()
                break
        pred = t_text[hm.end():pend].strip()
        tail = t_text[:hm.start()] + " " + t_text[pend:]
        # group-by expressions, split on top-level commas, re-exposed
        # under stable aliases so the outer IN can project them even
        # when they're expressions or absent from the select list
        col_exprs, depth, start = [], 0, 0
        for i, ch in enumerate(cols):
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                col_exprs.append(cols[start:i].strip())
                start = i + 1
        col_exprs.append(cols[start:].strip())
        # A group key may be a SELECT alias (`SELECT upper(metric) AS m
        # ... GROUP BY m` — legal in CH and in Spark via groupByAliases),
        # but aliases do NOT resolve in the WHERE scope where the
        # semi-filter lands. Spark resolves GROUP BY identifiers to a
        # BASE COLUMN first and falls back to the alias only when no
        # column matches, so the rewrite must match: the PRIMARY
        # variant keeps the raw keys (correct whenever they resolve in
        # WHERE scope, including when an alias shadows a real column);
        # when a key names a select alias, an ALT variant substitutes
        # the defining expression, and sql() retries with it if the
        # primary fails analysis (the alias-only case).
        alias_map = _select_alias_map(sel_part)
        resolved = [
            f"({alias_map[c.strip().strip('`').lower()]})"
            if c.strip().strip("`").lower() in alias_map else c
            for c in col_exprs
        ]

        def build_from_part(key_exprs: list) -> str:
            aliased = ", ".join(
                f"{c} AS __gh_g{i}" for i, c in enumerate(key_exprs))
            g_names = ", ".join(f"__gh_g{i}" for i in range(len(key_exprs)))
            # inner query = the ORIGINAL query shape (so HAVING resolves
            # select aliases exactly as it would have), plus the aliased
            # group keys; outer projects just the keys
            inner = (f"SELECT {g_names} FROM ({sel_part.rstrip()}, {aliased} "
                     f"{from_part} GROUP BY {cols} HAVING {pred}) __gh_hv")
            semi = f"({', '.join(key_exprs)}) IN ({inner})"
            fp_text, fp_search = _code_view(from_part)
            fp_depths = _depth_at(fp_search)
            wm = None
            for w in re.finditer(r"\bWHERE\b", fp_search, re.IGNORECASE):
                if fp_depths[w.start()] == 0:
                    wm = w
                    break
            if wm is not None:
                return (fp_text[:wm.end()]
                        + f" (({fp_text[wm.end():].strip()})) AND ({semi}) ")
            return fp_text + f" WHERE ({semi}) "

        from_variants = [build_from_part(col_exprs)]
        if resolved != col_exprs:
            from_variants.append(build_from_part(resolved))
        from_part = from_variants[0]
        if len(from_variants) > 1:
            spec["alt_query"] = (
                sel_part
                + f", grouping_id() AS {_TOTALS_COL} "
                + from_variants[1]
                + f"GROUP BY GROUPING SETS (({cols}), ())"
                + tail
            )
    rewritten = (
        sel_part
        + f", grouping_id() AS {_TOTALS_COL} "
        + from_part
        + f"GROUP BY GROUPING SETS (({cols}), ())"
        + tail
    )
    return spec, rewritten


class QueryLimitExceeded(ValueError):
    """A request expands past max-metrics-per-query: the reference
    REFUSES (HTTP 413, MetricDataServiceServlet.java:58-64) instead of
    attempting an unbounded fetch — at scale one wide-glob /render
    would otherwise materialize arbitrarily many series driver-side."""


def _exists(spark, path, _fs_cache: dict | None = None) -> bool:
    """Existence probe through the path's Hadoop FileSystem (HDFS-real;
    the local FS answers identically) — serving-layer twin of the
    commit layer's fs.py port. None path -> False.

    ``_fs_cache`` (path -> Fs) amortizes the Fs construction — several
    py4j round trips (Path, getFileSystem) — across requests: the
    service probes the same four configured paths on every hot serving
    request, and a fresh Fs per probe measurably taxes driver latency
    where the pre-r12 ``os.path.exists`` was one syscall. The cached
    Fs wraps the FileSystem OBJECT (itself cached JVM-side by scheme +
    authority), not any directory state, so create/delete of the
    probed path between requests answers correctly."""
    from graphouse_spark.fs import get_fs

    if path is None:
        return False
    if _fs_cache is None:
        return get_fs(path, spark).exists(path)
    fs = _fs_cache.get(path)
    if fs is None:
        fs = _fs_cache[path] = get_fs(path, spark)
    return fs.exists(path)


class GraphouseService:
    def __init__(self, spark: SparkSession, data_path: str, metrics_path: str,
                 provider: CombinedRetentionProvider | None = None,
                 max_points_per_metric: int = -1,
                 max_subdirs_per_dir: int = -1, max_metrics_per_dir: int = -1,
                 max_metrics_per_query: int = -1,
                 index_path: str | None = None,
                 lazy_tree: bool = False,
                 events_path: str | None = None,
                 tags_path: str | None = None,
                 batcher_opts: dict | None = None,
                 allow_all_negative_tag_queries: bool = False) -> None:
        self.spark = spark
        #: path -> Fs for request-path existence probes (see _exists)
        self._fs_cache: dict = {}
        self.data_path = data_path
        self.metrics_path = metrics_path
        #: persisted tag index (TAGS_SCHEMA, written by ingest when
        #: tagged ingest is on): /tags browsing + seriesByTag name
        #: resolution scan it instead of the points table
        self.tags_path = tags_path
        #: X6 dir-content batcher shape
        #: (graphouse.tree.dir-content.batcher.* via config.py):
        #: {max_parallel, max_batch_size, batch_aggregation_ms}
        self.batcher_opts = dict(batcher_opts or {})
        #: seriesByTag term sets with NO positive term (nothing
        #: requires a non-empty tag match) are REFUSED by default —
        #: graphite-web's own TagDB rejects them, so only hostile or
        #: buggy clients send the shape, and evaluating one costs a
        #: full-universe scan (the one measured tag plan above the 3 s
        #: 10M target: all-dense `k=`-only, 3.4 s — PLANS.md). The
        #: one-pass evaluator stays available behind this flag.
        self.allow_all_negative_tag_queries = allow_all_negative_tag_queries
        #: optional graphite events store (ENGINE EXTENSION,
        #: events.py): POST /events + /events/get_data + the
        #: events(*tags) render function
        self.events_path = events_path
        self.provider = provider or DefaultRetentionProvider()
        # index_path: optional zonemap (maintenance.run_index_update);
        # when present, /metricData reads only index-surviving files
        self.data_service = MetricDataService(
            self.provider, max_points_per_metric,
            data_path=data_path, index_path=index_path,
        )
        # system.query_log analog: per-request records (querylog.py)
        from graphouse_spark.querylog import QueryLog

        self.query_log = QueryLog()
        # CH query-cache analog for /render (use_query_cache): dashboards
        # re-poll identical targets on a refresh interval; a short TTL
        # serves the repeat from memory. 0 = off (default — correctness
        # first; the reference has no result cache either).
        self.render_cache_ttl = 0
        self._render_cache: dict = {}
        if lazy_tree:
            # CH-style cold start: no bootstrap scan; directories load
            # on first touch through the X6 batcher, so concurrent
            # cache misses share one metrics-table query
            # (MetricSearch.java:193-200 wiring)
            from graphouse_spark.api.batcher import DirContentBatcher, load_dirs_content
            from graphouse_spark.tree_index import LazyMetricTree

            batcher = DirContentBatcher(
                lambda dirs: load_dirs_content(spark, metrics_path, dirs),
                **self.batcher_opts,
            )
            self.tree = LazyMetricTree(
                batcher.load, max_subdirs_per_dir, max_metrics_per_dir
            )
        else:
            self.tree = MetricTree(max_subdirs_per_dir, max_metrics_per_dir)
        # graphouse.metric-data.max-metrics-per-query (-1 = unlimited);
        # exceeding it gets HTTP 413 (MetricDataServiceServlet.java:58-64)
        self.max_metrics_per_query = max_metrics_per_query
        self._loaded = lazy_tree  # lazy mode serves immediately
        # /ping + /monitoring (MonitoringServlet): the ping monitoring
        # carries the MetricTreeInit unit -> probes get 503 until the
        # tree bootstrap finishes (MetricSearch.java:163-164,343);
        # lazy mode serves immediately, so it boots ok
        from graphouse_spark.monitoring import Monitoring, MonitoringUnit

        self.ping = Monitoring()
        self.monitoring = Monitoring()
        self._tree_init_unit = MonitoringUnit("MetricTreeInit")
        if not lazy_tree:
            self._tree_init_unit.critical("Initializing")
        self.ping.add_unit(self._tree_init_unit)
        self.monitoring.add_unit(self._tree_init_unit)

    # -- bootstrap (S8: full scan, latest status per name) --
    #: above this many names, load_tree() switches to the lazy tree
    #: instead of materializing everything driver-side. Sized from the
    #: measured envelope (tools/tree_stress.py): ~217 bytes + ~21 us
    #: build per name, so 10M names = ~2.1 GB RSS + ~3.5 min bootstrap —
    #: the reference's "huge tree, raise Xmx" regime
    #: (doc/config.md:17-19). Lazy mode serves immediately and loads
    #: directories on first touch through the X6 request batcher.
    AUTO_LAZY_THRESHOLD = 10_000_000

    def load_tree(self) -> int:
        from graphouse_spark.operators.dedup import latest_status

        metrics = read_metrics(self.spark, self.metrics_path)
        # distinct NAMES, not raw rows: the metrics table is
        # append-only (each status change adds a row), so a churny
        # deployment would cross a row-count threshold far below 10M
        # real names and silently degrade to lazy serving
        n_rows = metrics.select("name").distinct().count()
        if n_rows > self.AUTO_LAZY_THRESHOLD:
            from graphouse_spark.api.batcher import (
                DirContentBatcher,
                load_dirs_content,
            )
            from graphouse_spark.tree_index import LazyMetricTree

            batcher = DirContentBatcher(
                lambda dirs: load_dirs_content(
                    self.spark, self.metrics_path, dirs),
                **self.batcher_opts,
            )
            self.tree = LazyMetricTree(
                batcher.load, self.tree.max_subdirs, self.tree.max_metrics
            )
            self._loaded = True
            self._tree_init_unit.ok()
            return n_rows
        resolved = latest_status(metrics)
        rows = [(r["name"], r["status"]) for r in resolved.collect()]
        # parents before children so statuses land on the right nodes
        rows.sort(key=lambda r: r[0])
        self.tree.load_rows(rows)
        self._loaded = True
        self._tree_init_unit.ok()
        return len(rows)

    # -- /search --
    def search(self, query: str) -> str:
        """Newline-separated matches; dirs keep their trailing dot."""
        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        return "\n".join(self.tree.search(query))

    # -- /searchCachedMetrics (X2: ignores visibility) --
    def search_cached(self, query: str) -> str:
        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        return "\n".join(self.tree.search_cached(query))

    # -- /events (graphite-web event markers; ENGINE EXTENSION) --
    def _events_frame(self):
        from graphouse_spark import events as ev_mod

        if self.events_path is None:
            return None
        if not _exists(self.spark, self.events_path, self._fs_cache):
            # configured but empty store: events() renders no markers
            # instead of erroring. Build a FRESH StructType —
            # StructType.add mutates self, so .add() on the module
            # global would append a duplicate 'date' field per call.
            from pyspark.sql.types import DateType, StructField, StructType
            empty_schema = StructType(
                list(ev_mod.EVENTS_SCHEMA.fields)
                + [StructField("date", DateType())])
            return self.spark.createDataFrame([], empty_schema)
        return ev_mod.read_events(self.spark, self.events_path)

    def add_events(self, payload) -> str:
        """``POST /events`` — graphite's JSON shape (one object or a
        list); returns the stored rows as JSON."""
        from graphouse_spark import events as ev_mod

        if self.events_path is None:
            raise ValueError("events store not configured "
                             "(serve with --events <path>)")
        rows = payload if isinstance(payload, list) else [payload]
        stored = ev_mod.write_events(self.spark, self.events_path, rows)
        return json.dumps(stored)

    def events_get_data(self, start: int | None, end: int | None,
                        tags: list[str] | None) -> str:
        """``GET /events/get_data`` — window + conjunctive tag filter,
        graphite's list-of-objects response."""
        from graphouse_spark import events as ev_mod

        frame = self._events_frame()
        if frame is None:
            raise ValueError("events store not configured "
                             "(serve with --events <path>)")
        return ev_mod.events_json(frame, start, end, tags)

    def render_base_step(self, targets: list[str] | str,
                         start: int, end: int) -> int:
        """The retention step the render grid uses for these targets —
        the ``/render?format=raw`` fallback when a series returns too
        few points to infer its step from the data (metadata-only:
        tree search + retention lookup, no scan)."""
        from graphouse_spark.functions.target import collect_series_globs

        if isinstance(targets, str):
            targets = [targets]
        names: list[str] = []
        for t in targets:
            for g in collect_series_globs(t):
                names.extend(m for m in self.tree.search(g)
                             if not m.endswith("."))
        if not names:
            return 60
        return self.data_service.query_params(names, start, end).step_seconds

    # -- /tags (graphite-web tag API; ENGINE EXTENSION with tags.py) --
    #: tag browsing resolves against metric names seen in the last N
    #: days — date is the PARTITION column, so the browse scans only
    #: those partitions' footers/name columns, never the full lake. A
    #: stale tag ages out of autocomplete like CH's own usage-driven
    #: tag listings; widen the window per-instance if needed.
    tag_lookback_days: int = 7

    def _tag_index(self):
        """The persisted tag index inside the lookback window, or None
        when no index is configured/built yet (fallback: scan the
        points table's names — the pre-index behavior)."""
        from pyspark.sql import functions as F

        if self.tags_path is None or not _exists(self.spark, self.tags_path, self._fs_cache):
            return None
        from graphouse_spark.sources.tables import read_tags

        idx = read_tags(self.spark, self.tags_path)
        return idx.filter(
            F.col("date") >= F.date_sub(F.current_date(),
                                        self.tag_lookback_days))

    def _tagged_names(self, exprs: list[str] | None = None):
        """Distinct tagged metric names inside the lookback window,
        optionally filtered by seriesByTag terms.

        With a persisted tag index this never touches the points
        table OR compiles a tag map: a positive equality (or a regex
        rewritten via the distinct-values sub-index) prunes the scan
        sargably, and every term is then verified as a conditional
        aggregate over the surviving metrics' index rows
        (tags.series_by_tag_on_index). Without an index it falls back
        to distinct names from the date-pruned points scan with the
        tag-map-compile filter (the pre-index path, kept for tables
        ingested before the index existed)."""
        from pyspark.sql import functions as F

        from graphouse_spark import tags as tg_mod

        if not self.allow_all_negative_tag_queries \
                and tg_mod.is_all_negative(exprs):
            # graphite-web's TagDB refuses term sets with no non-empty
            # match; the same refusal here keeps the one shape whose
            # evaluation floor is a full-universe scan (all-dense
            # `k=`-only) out of the serving path — the over-wide-glob
            # 413 posture applied to tags
            raise QueryLimitExceeded(
                "seriesByTag requires at least one term with a "
                "non-empty match (k=v, k!=, or k=~expr); all-negative "
                "term sets are refused "
                "(allow_all_negative_tag_queries enables them)")
        idx = self._tag_index()
        if idx is not None:
            if not exprs:
                uni = self._universe_metrics()
                if uni is not None:
                    return uni.distinct()
                return idx.select("metric").distinct()
            # slice-intersection evaluation over index rows (tags.py):
            # each term reads only its own tag's sargable slice, with
            # =~ terms rewritten into value-IN-lists via the
            # distinct-values sub-index when it resolves few enough
            # values. The all-negative shape (opt-in) serves its
            # universe side from the compacted distinct-metric slice
            # when present — resolved only for that shape, so positive
            # queries never pay the probe.
            uni = (self._universe_metrics()
                   if tg_mod.is_all_negative(exprs) else None)
            return tg_mod.series_by_tag_on_index(
                idx, exprs, regex_values=self._regex_value_list,
                universe=uni)
        else:
            if not _exists(self.spark, self.data_path, self._fs_cache):
                # pre-first-batch boot: serve the empty namespace, like
                # the empty-tree bootstrap does for /search
                return self.spark.createDataFrame([], "metric string")
            data = read_data(self.spark, self.data_path)
            names = (data.filter(
                F.col("date") >= F.date_sub(F.current_date(),
                                            self.tag_lookback_days))
                .filter(F.col("metric").contains(";"))
                .select("metric").distinct())
        if exprs:
            names = tg_mod.series_by_tag(names, exprs)
        return names

    def _universe_metrics(self, lookback: bool = True):
        """The distinct-metric universe slice inside the browse window
        (r12 verdict #3), or None when absent (pre-slice deployments
        and every rewrite's invalidation window — callers fall back to
        the main index's name slice, correct and slower)."""
        from pyspark.sql import functions as F

        from graphouse_spark.sources.tables import read_tag_metrics

        uni = read_tag_metrics(self.spark, self.tags_path)
        if uni is None:
            return None
        if lookback:
            uni = uni.filter(F.col("date") >= F.date_sub(
                F.current_date(), self.tag_lookback_days))
        return uni.select("metric")

    #: inline at most this many matched distinct values as an IN-list;
    #: beyond it the rlike-on-slice fallback is cheaper than shipping
    #: and hashing a giant literal list into the plan
    _REGEX_VALUES_CAP: int = 1000

    def _regex_value_list(self, key: str, anchored: str,
                          lookback: bool = True):
        """Distinct values of ``key`` matching the anchored pattern,
        from the sub-index, or None when the sub-index is absent or
        more than :attr:`_REGEX_VALUES_CAP` values match (callers then
        prune with the pattern itself).

        ``lookback=True`` applies the browse window (a pair last seen
        outside it has no in-window main rows either); the RENDER path
        must pass False — it resolves against the FULL index, so a
        value last seen before the window must still rewrite (else a
        quiet series would silently drop out of seriesByTag renders)."""
        from pyspark.sql import functions as F

        from graphouse_spark.sources.tables import read_tag_values

        vals = read_tag_values(self.spark, self.tags_path)
        if vals is None:
            return None
        cond = (F.col("tag") == key) & F.col("value").rlike(anchored)
        if lookback:
            cond = cond & (F.col("date") >= F.date_sub(
                F.current_date(), self.tag_lookback_days))
        rows = (vals.filter(cond)
                .select("value").distinct()
                .limit(self._REGEX_VALUES_CAP + 1).collect())
        if len(rows) > self._REGEX_VALUES_CAP:
            return None
        return [r["value"] for r in rows]

    def _regex_value_list_full(self, key: str, anchored: str):
        """No-lookback twin for full-index (render-path) resolution."""
        return self._regex_value_list(key, anchored, lookback=False)

    def tag_find_series(self, exprs: list[str],
                        limit: int | None = None) -> str:
        """``/tags/findSeries?expr=...&expr=...`` — JSON list of
        matching tagged series names (grafana's tag-mode series
        lookup). Graphite's findSeries has NO limit parameter —
        all matches return, bounded only by the server's 10k response
        cap (the /query max_rows posture); an explicit ``limit``
        param is still honored when a client sends one."""
        if not exprs:
            raise ValueError("findSeries needs at least one expr")
        rows = (self._tagged_names(exprs)
                .orderBy("metric")
                .limit(limit if limit is not None else 10000).collect())
        return json.dumps([r["metric"] for r in rows])

    def tag_autocomplete_tags(self, exprs: list[str] | None = None,
                              tag_prefix: str = "",
                              limit: int = 100) -> str:
        """``/tags/autoComplete/tags`` — distinct tag KEYS across the
        (optionally expr-filtered) tagged namespace."""
        from pyspark.sql import functions as F

        from graphouse_spark import tags as tg_mod

        idx = self._tag_index()
        if idx is not None and not exprs:
            # pure index scan: distinct tag keys straight off the
            # (tag, value, metric) rows — no map construction at all
            keys = idx.select("tag").filter(F.col("tag") != "name")
        elif idx is not None:
            # expr-filtered: semi-join the index rows to the matching
            # names — keys come off the index columns, still no map
            keys = (idx.join(self._tagged_names(exprs),
                             "metric", "left_semi")
                    .select("tag").filter(F.col("tag") != "name"))
        else:
            keys = (self._tagged_names(exprs)
                    .select(F.explode(F.map_keys(
                        tg_mod.tags_map_col(F.col("metric")))).alias("tag"))
                    .filter(F.col("tag") != "name"))
        if tag_prefix:
            keys = keys.filter(F.col("tag").startswith(tag_prefix))
        rows = keys.distinct().orderBy("tag").limit(limit).collect()
        return json.dumps([r["tag"] for r in rows])

    def tag_autocomplete_values(self, tag: str,
                                exprs: list[str] | None = None,
                                value_prefix: str = "",
                                limit: int = 100) -> str:
        """``/tags/autoComplete/values`` — distinct VALUES of one tag
        key across the (optionally expr-filtered) tagged namespace."""
        from pyspark.sql import functions as F

        from graphouse_spark import tags as tg_mod

        if not tag:
            raise ValueError("autoComplete/values needs a tag")
        idx = self._tag_index()
        if idx is not None and not exprs:
            # sargable index scan: tag equality prunes on the sorted
            # (tag, value, metric) layout's min/max stats
            vals = idx.filter(F.col("tag") == tag).select("value")
        elif idx is not None:
            # expr-filtered: the wanted tag's slice (sargable) semi-
            # joined to the matching names — values come off the
            # index column, no per-name map compile
            vals = (idx.filter(F.col("tag") == tag)
                    .join(self._tagged_names(exprs), "metric", "left_semi")
                    .select("value"))
        else:
            vals = (self._tagged_names(exprs)
                    .select(F.element_at(
                        tg_mod.tags_map_col(F.col("metric")),
                        tag).alias("value"))
                    .filter(F.col("value").isNotNull()))
        if value_prefix:
            vals = vals.filter(F.col("value").startswith(value_prefix))
        rows = vals.distinct().orderBy("value").limit(limit).collect()
        return json.dumps([r["value"] for r in rows])

    def tag_del_series(self, paths: list[str]) -> str:
        """``/tags/delSeries?path=...`` — remove series from the TAG
        DATABASE (graphite-web semantics: the tag index forgets the
        series; data points are untouched — graphite's own delSeries
        only edits its tag DB). Names are canonicalized before the
        match so any tag ordering deletes the stored spelling. JSON
        true when every requested series existed in the index."""
        import os

        from pyspark.sql import functions as F

        from graphouse_spark import tags as tg_mod
        from graphouse_spark.sources.tables import (
            read_tags, rewrite_tags_atomic)

        if not paths:
            raise ValueError("delSeries needs at least one path")
        if self.tags_path is None or not _exists(self.spark, self.tags_path, self._fs_cache):
            return json.dumps(False)  # no tag DB to delete from
        targets = [tg_mod.canonical(p) for p in paths]
        found = {r["metric"] for r in
                 read_tags(self.spark, self.tags_path)
                 .filter(F.col("metric").isin(targets))
                 .select("metric").distinct().collect()}
        # crash-safe, locked rewrite (stage -> swap, concurrent ingest
        # appends carried over) — tables.rewrite_tags_atomic
        rewrite_tags_atomic(
            self.spark, self.tags_path,
            lambda idx: idx.filter(~F.col("metric").isin(targets)))
        return json.dumps(all(t in found for t in targets))

    # -- /metricData --
    def metric_data(self, patterns: list[str], start: int, end: int,
                    now_seconds: int | None = None,
                    req_key: str | None = None) -> dict:
        """Glob-expand each pattern, then run the §3.1 read path.

        ``req_key`` is the plugin's request-tracing id (graphouse.py:78-88
        sends it; MetricDataServiceServlet.java:44-98 logs it and keys
        cancellation on it). Here it becomes the Spark job group for
        every job this request launches, so :meth:`cancel_request` can
        kill a running query — the Spark twin of the servlet's
        cancellation-on-disconnect.
        """
        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        with self.query_log.track(
            "/metricData", ",".join(patterns), req_key
        ) as log:
            if req_key:
                sc = self.spark.sparkContext
                sc.setJobGroup(req_key, f"/metricData reqKey={req_key}",
                               interruptOnCancel=True)
                try:
                    out = self._metric_data(patterns, start, end, now_seconds)
                finally:
                    sc.setJobGroup(None, None)
            else:
                out = self._metric_data(patterns, start, end, now_seconds)
            log["rows"] = len(out)
            return out

    def cancel_request(self, req_key: str) -> None:
        """Cancel every Spark job started under ``req_key``."""
        self.spark.sparkContext.cancelJobGroup(req_key)

    # -- /render (beyond-reference: graphite-web's render API engine-side) --
    def render(self, targets: list[str] | str, start: int, end: int,
               now_seconds: int | None = None,
               req_key: str | None = None,
               max_data_points: int | None = None) -> list[dict]:
        """graphite-web ``/render?format=json`` served by the engine.

        The reference only finds+fetches raw series and leaves every
        transform to graphite-web's python renderer (graphouse.py is a
        fetch adapter). Here the full target expression — nested
        function calls included — compiles to ONE Catalyst plan over
        the pruned scan (functions/target.py registry, 80+ functions),
        and only the final rendered points leave the engine. Returns
        graphite's wire shape:
        ``[{"target": name, "datapoints": [[value|null, ts], ...]}]``.
        """
        import math as _math

        from graphouse_spark.functions.target import (
            collect_alias_query_rewrites,
            collect_series_globs,
            collect_tag_selections,
            evaluate_target,
        )

        if isinstance(targets, str):
            targets = [targets]
        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")

        def run() -> list[dict]:
            data = read_data(self.spark, self.data_path)
            out: list[dict] = []
            for target in targets:
                names: list[str] = []
                seen: set[str] = set()
                for g in collect_series_globs(target):
                    for m in self.tree.search(g):
                        if not m.endswith(".") and m not in seen:
                            seen.add(m)
                            names.append(m)
                for head_globs, search, replace in \
                        collect_alias_query_rewrites(target):
                    # aliasQuery's subqueries derive from CONCRETE head
                    # names; patterns that leave the head GLOB
                    # untouched (the static derivation's blind spot)
                    # still resolve here
                    import re as _re_mod

                    heads: list[str] = []
                    for g in head_globs:
                        heads.extend(m for m in self.tree.search(g)
                                     if not m.endswith("."))
                    for nm in heads:
                        try:
                            q = _re_mod.sub(search, replace, nm)
                        except _re_mod.error as exc:
                            raise ValueError(
                                f"aliasQuery: bad pattern {search!r}: "
                                f"{exc}")
                        for m2 in self.tree.search(q):
                            if not m2.endswith(".") and m2 not in seen:
                                seen.add(m2)
                                names.append(m2)
                for exprs in collect_tag_selections(target):
                    # tagged series live outside the tree (ENGINE
                    # EXTENSION, tags.py): resolve the selection against
                    # the data table. A name= equality term is REQUIRED
                    # on the server path — it becomes the sargable
                    # metric prefix range the zonemap prunes; without it
                    # the resolve would be a full name scan per render,
                    # the same unbounded shape the expanded-glob 413
                    # refusal exists for.
                    from pyspark.sql import functions as F

                    from graphouse_spark import tags as tg_mod

                    has_index = _exists(self.spark, self.tags_path, self._fs_cache)
                    if not self.allow_all_negative_tag_queries \
                            and tg_mod.is_all_negative(exprs):
                        # same posture as _tagged_names: graphite-web
                        # refuses all-negative term sets; the shape's
                        # evaluation floor is a full-universe scan
                        raise QueryLimitExceeded(
                            "seriesByTag requires at least one term "
                            "with a non-empty match (k=v, k!=, or "
                            "k=~expr)")
                    if tg_mod.name_equals_term(exprs) is None and not has_index:
                        # without an index the resolve would scan the
                        # POINTS table names — unbounded per render; the
                        # index makes any term set a bounded per-series
                        # scan (graphite's own tag-DB posture)
                        raise QueryLimitExceeded(
                            "seriesByTag on the render path needs a "
                            "name=<literal> equality term (or a "
                            "persisted tag index)")
                    cap = (self.max_metrics_per_query
                           if self.max_metrics_per_query > 0 else None)
                    if has_index:
                        # persisted tag index: resolve names by slice
                        # intersection over rows per SERIES-TAG, not
                        # per point — a render never compiles tag maps
                        # (tags.series_by_tag_on_index). No lookback
                        # here (graphite's tag DB resolves regardless
                        # of the request window; series without points
                        # in range simply fetch nothing).
                        from graphouse_spark.sources.tables import read_tags

                        idx = read_tags(self.spark, self.tags_path)
                        # full-index resolution: neither the value-list
                        # rewrite nor the universe slice applies the
                        # browse lookback here
                        uni = (self._universe_metrics(lookback=False)
                               if tg_mod.is_all_negative(exprs) else None)
                        sel = tg_mod.series_by_tag_on_index(
                            idx, exprs,
                            regex_values=self._regex_value_list_full,
                            universe=uni)
                    else:
                        # date is the PARTITION column: without this
                        # pair of bounds every render's name-resolve
                        # would list and foot-read ALL partitions; with
                        # it the scan prunes to the request's days
                        # (UTC, matching ingest-side date derivation)
                        window = data.filter(
                            (F.col("timestamp") >= start)
                            & (F.col("timestamp") <= end)
                            & (F.col("date") >=
                               F.to_date(F.from_unixtime(F.lit(start))))
                            & (F.col("date") <=
                               F.to_date(F.from_unixtime(F.lit(end)))))
                        sel = (tg_mod.series_by_tag(window, exprs)
                               .select("metric").distinct())
                    if cap:
                        sel = sel.limit(cap + 1)
                    for r in sel.collect():
                        m = r["metric"]
                        if m not in seen:
                            seen.add(m)
                            names.append(m)
                if 0 < self.max_metrics_per_query < len(names):
                    # refuse BEFORE planning any fetch — the final
                    # collect is bounded by series x points, so the
                    # series count must be capped up front
                    raise QueryLimitExceeded(
                        "Too many metrics in query. Provided %d, max %d"
                        % (len(names), self.max_metrics_per_query))
                frame = self.data_service.base_series(
                    self.spark, data, names, start, end, now_seconds
                )
                evaluated = evaluate_target(
                    frame, target, start=start, end=end,
                    events=self._events_frame())
                # consolidateBy tag (round 8): the evaluator leaves a
                # literal column naming the reduction function; read it
                # (bounded 1-row action, only when present) and strip it
                consolidation = "average"
                from graphouse_spark.functions.timeseries import (
                    CONSOLIDATE_COL, consolidation_agg,
                )
                if CONSOLIDATE_COL in evaluated.columns:
                    tag = evaluated.select(CONSOLIDATE_COL).limit(1).collect()
                    if tag:
                        consolidation = tag[0][0]
                    evaluated = evaluated.drop(CONSOLIDATE_COL)
                if max_data_points and names:
                    # graphite's maxDataPoints: consolidate IN the
                    # engine (average, step snapped to a multiple of
                    # the retention step) so only the reduced series
                    # ever leaves the cluster — at 100 TB this is the
                    # difference between shipping millions of points
                    # to a dashboard and shipping max_data_points
                    base = self.data_service.query_params(
                        names, start, end, now_seconds
                    ).step_seconds
                    span = end - start
                    if span > max_data_points * base:
                        from pyspark.sql import functions as F

                        step_out = int(base * -(-span // (max_data_points * base)))
                        # request-start-anchored buckets (graphite
                        # consolidates on the request grid, not epoch)
                        bucket = (
                            F.lit(start)
                            + ((F.col("ts") - F.lit(start)) / step_out).cast("long")
                            * step_out
                        ).alias("ts")
                        evaluated = evaluated.groupBy("metric", bucket).agg(
                            consolidation_agg(consolidation).alias("value")
                        )
                by_metric: dict[str, list] = {}
                for r in evaluated.collect():
                    by_metric.setdefault(r["metric"], []).append((r["ts"], r["value"]))
                for m in sorted(by_metric):
                    pts = sorted(by_metric[m])
                    out.append({
                        "target": m,
                        "datapoints": [
                            [None if v is None or not _math.isfinite(v) else v, t]
                            for t, v in pts
                        ],
                    })
            return out

        # now_seconds is part of the key: it selects the retention step
        # (metric age), so aliasing across different nows serves wrong
        # steps. HTTP callers pass None; direct API callers vary it.
        cache_key = (tuple(targets), start, end, max_data_points, now_seconds)
        if self.render_cache_ttl > 0:
            hit = self._render_cache.get(cache_key)
            if hit is not None and hit[0] > _time.time():
                import copy

                cached = copy.deepcopy(hit[1])
                self.query_log.record(
                    "/render", ";".join(targets), int(_time.time()), 0.0,
                    sum(len(s["datapoints"]) for s in cached), "cached", req_key)
                return cached
        with self.query_log.track(
            "/render", ";".join(targets), req_key
        ) as log:
            if req_key:
                sc = self.spark.sparkContext
                sc.setJobGroup(req_key, f"/render reqKey={req_key}",
                               interruptOnCancel=True)
                try:
                    out = run()
                finally:
                    sc.setJobGroup(None, None)
            else:
                out = run()
            log["rows"] = sum(len(s["datapoints"]) for s in out)
            if self.render_cache_ttl > 0:
                import copy

                if len(self._render_cache) >= 256:  # bounded: drop expired,
                    now = _time.time()              # else the oldest entry
                    for k in [k for k, (exp, _) in self._render_cache.items()
                              if exp <= now]:
                        del self._render_cache[k]
                    if len(self._render_cache) >= 256:
                        self._render_cache.pop(next(iter(self._render_cache)))
                self._render_cache[cache_key] = (
                    _time.time() + self.render_cache_ttl, copy.deepcopy(out))
            return out

    def render_json(self, *args, **kwargs) -> str:
        return json.dumps(self.render(*args, **kwargs))

    def render_pickle(self, *args, **kwargs) -> bytes:
        """graphite-web REMOTE-backend payload: ``/render?format=pickle``.

        This is the wire format graphite-web's RemoteReader speaks to
        CLUSTER_SERVERS members, so serving it makes the engine a
        drop-in federation backend for a stock graphite-web frontend
        (the reference integrates as a local storage FINDER instead —
        graphouse.py:119-160 — which requires installing its plugin).

        Each series re-grids to the remote shape (name, start, end,
        step, values): step is the series' smallest positive timestamp
        delta, gaps become None. Pickle protocol 2 for graphite-web's
        py2-era compatibility floor.
        """
        import pickle

        out = []
        for s in self.render(*args, **kwargs):
            pts = sorted((ts, v) for v, ts in s["datapoints"])
            if not pts:
                continue
            tss = [t for t, _ in pts]
            deltas = [b - a for a, b in zip(tss, tss[1:]) if b > a]
            step = min(deltas) if deltas else 60
            t0, t1 = tss[0], tss[-1] + step
            # snap every point to its floor grid slot (last wins) so an
            # irregular timestamp lands in the nearest cell instead of
            # silently vanishing from the regular remote grid
            lookup = {t0 + ((t - t0) // step) * step: v for t, v in pts}
            out.append({
                "name": s["target"],
                "pathExpression": s["target"],
                "start": t0, "end": t1, "step": step,
                "values": [lookup.get(t) for t in range(t0, t1, step)],
            })
        return pickle.dumps(out, protocol=2)

    #: served relation -> (column, type) pairs for DESCRIBE (types are
    #: the engine's Spark types — the honest answer; CH names differ)
    def _table_columns(self, name: str):
        from graphouse_spark.schemas import DATA_SCHEMA, METRICS_SCHEMA

        if name in ("data", "data_final"):
            sch = DATA_SCHEMA
        elif name in ("metrics", "metrics_final"):
            sch = METRICS_SCHEMA
        elif name == "query_log":
            sch = self.query_log.frame(self.spark).schema
        elif name == "parts":
            return [("file", "string"), ("date", "date"),
                    ("n_rows", "bigint"), ("bytes", "bigint"),
                    ("min_metric", "string"), ("max_metric", "string"),
                    ("min_ts", "bigint"), ("max_ts", "bigint")]
        else:
            return None
        return [(f.name, f.dataType.simpleString()) for f in sch.fields]

    _SERVED_TABLES = ("data", "data_final", "metrics", "metrics_final",
                      "parts", "query_log")

    def _rewrite_introspection(self, query: str) -> str:
        """``SHOW TABLES`` / ``DESCRIBE [TABLE] t`` (CH spellings) ->
        SELECT over VALUES; anything else passes through untouched.
        A trailing ``FORMAT <name>`` is preserved for the normal
        format extraction."""
        import re as _re

        q = query.strip().rstrip(";")
        fm = _re.search(r"\s+FORMAT\s+(\w+)\s*$", q, _re.IGNORECASE)
        stmt, tail = (q[:fm.start()], q[fm.start():]) if fm else (q, "")
        if _re.fullmatch(r"SHOW\s+TABLES", stmt.strip(), _re.IGNORECASE):
            vals = ", ".join(f"('{t}')" for t in self._SERVED_TABLES)
            return (f"SELECT name FROM VALUES {vals} AS t(name) "
                    f"ORDER BY name{tail}")
        dm = _re.fullmatch(
            r"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?"
            r"(?:graphite\.|system\.)?(\w+)", stmt.strip(), _re.IGNORECASE)
        if dm is not None:
            cols = self._table_columns(dm.group(1).lower())
            if cols is None:
                raise ValueError(
                    f"unknown table {dm.group(1)!r} (served: "
                    f"{', '.join(self._SERVED_TABLES)})")
            vals = ", ".join(f"('{n}', '{t}')" for n, t in cols)
            return (f"SELECT name, type FROM VALUES {vals} "
                    f"AS t(name, type){tail}")
        return query

    def sql(self, query: str, fmt: str = "TSV",
            max_rows: int = 10000) -> str:
        """ClickHouse HTTP-interface analog: ad-hoc SELECT over the
        lake with the CH dialect registered.

        A graphouse admin's day-to-day is CH SQL against
        ``graphite.data`` / ``graphite.metrics``; this serves the same
        queries engine-side: both tables register as views (the
        ``graphite.`` qualifier rewrites to the view names), every CH
        scalar spelling resolves via the dialect shim
        (``chdialect.register_ch_dialect`` — parse-level, zero Python
        in the plan), and results come back as CH ``TabSeparated`` or
        ``FORMAT JSON`` ({meta, data, rows}).

        READ-ONLY by design, enforced on the PARSED PLAN (not the
        query text — keyword/regex guards fell to CTE-prefixed DML and
        backtick-quoted spellings): api/sqlguard.py rejects any
        non-query plan node, any relation outside the two registered
        views (which also kills file-format tables like
        text.`/etc/passwd`), and JVM-reflective functions by parsed
        name. One statement per request, as with CH readonly=1.
        """
        from graphouse_spark.api import sqlguard
        from graphouse_spark.chdialect import register_ch_dialect

        # normalize the caller's format name (the HTTP default_format
        # param arrives raw — CH spellings like Pretty or
        # TabSeparatedWithNames must not silently degrade to TSV)
        fmt = _FORMAT_NAMES.get(fmt.lower(), fmt)
        # CH introspection statements (SHOW TABLES / DESCRIBE): rewrite
        # to SELECT-over-VALUES so the normal guard + format machinery
        # serves them — no new execution path, no relation access
        query = self._rewrite_introspection(query)
        head = query.lstrip().split(None, 1)
        if not head or head[0].upper() not in ("SELECT", "WITH", "EXPLAIN"):
            raise ValueError("only SELECT/WITH/EXPLAIN queries are served "
                             "(readonly interface)")
        if ";" in query.rstrip().rstrip(";"):
            raise ValueError("one statement per request")
        with self.query_log.track("/query", query.strip()[:200]) as log:
            register_ch_dialect(self.spark)
            # CH ORDER BY ... WITH FILL: strip the clause, fill the
            # collected result below (token-safe — tokenizer errors
            # surface as GuardError from the main guard pass). A
            # trailing CH `FORMAT <name>` overrides the fmt param,
            # exactly like the CH HTTP interface.
            try:
                fmt_clause, query = _extract_format(query)
                if fmt_clause is not None:
                    fmt = fmt_clause
                fill_spec, query = _extract_with_fill(query)
                limit_by, query = _extract_limit_by(query)
            except sqlguard.GuardError:
                fill_spec = limit_by = None
            try:
                query = _rewrite_combinator_aggs(query)
                query = _rewrite_array_join(query)
                totals_spec, query = _extract_with_totals(query)
            except sqlguard.GuardError as exc:
                # tokenize failures fall through to the main guard
                # (same error there); arity/shape complaints from the
                # rewriters are user errors worth surfacing verbatim
                if "unterminated" in str(exc):
                    totals_spec = None
                else:
                    raise ValueError(str(exc))
            data_df = read_data(self.spark, self.data_path)
            metrics_df = read_metrics(self.spark, self.metrics_path)
            data_df.createOrReplaceTempView("data")
            metrics_df.createOrReplaceTempView("metrics")
            # CH FINAL modifier: the read-time LWW views (A1/W4 —
            # exactly what FINAL means on the reference's Replacing
            # tables, MetricDataService.java:73-76)
            from graphouse_spark.operators.dedup import (
                dedup_points_ranked, latest_status)

            dedup_points_ranked(data_df).createOrReplaceTempView("data_final")
            latest_status(metrics_df).createOrReplaceTempView("metrics_final")
            # system.query_log analog: admins debug slow requests with
            # the same CH SQL they use in production
            self.query_log.frame(self.spark).createOrReplaceTempView(
                "query_log")
            # system.parts analog (tables.table_stats): registered only
            # when the query names it — the stats pass walks the table
            # directory driver-side at registration
            import re as _re

            try:
                # CODE segments only: string literals ('%parts%', the
                # SHOW TABLES VALUES list) must not trigger the
                # driver-side directory walk below
                _, _code = _code_view(query)
            except Exception:
                _code = query  # tokenize errors surface in the guard
            if _re.search(r"\bparts\b", _code, _re.IGNORECASE):
                from graphouse_spark.sources.tables import table_stats

                if _exists(self.spark, self.data_path, self._fs_cache):
                    table_stats(self.spark, self.data_path) \
                        .createOrReplaceTempView("parts")
                else:
                    self.spark.createDataFrame(
                        [], "file string, date date, n_rows long, "
                            "bytes long, min_metric string, "
                            "max_metric string, min_ts long, max_ts long"
                    ).createOrReplaceTempView("parts")

            def _rw(code: str) -> str:
                # graphite.* qualifiers -> view names, plus the
                # mechanically-renameable CH aggregates (scalar shims
                # can't cover aggregates; chdialect.AGGREGATE_EQUIVALENTS
                # documents the full rewrite table). Runs on CODE
                # segments only — string literals like
                # 'graphite.data.x' pass through untouched.
                code = (code.replace("graphite.data", "data")
                        .replace("graphite.metrics", "metrics")
                        .replace("system.query_log", "query_log")
                        .replace("system.parts", "parts"))
                # CH FINAL modifier -> the LWW-deduped view (keeps an
                # optional AS alias: ``data AS d FINAL`` and
                # ``data FINAL d`` both resolve)
                code = _re.sub(
                    r"\b(data|metrics)\b((?:\s+AS)?\s+\w+)?\s+FINAL\b",
                    lambda m: f"{m.group(1)}_final{m.group(2) or ''}",
                    code, flags=_re.IGNORECASE)
                # CH SAMPLE k: fraction (0,1] -> PERCENT, integer ->
                # ROWS — Spark spells both TABLESAMPLE
                def _sample(m):
                    k = float(m.group(3))
                    t = m.group(1) + (m.group(2) or "")
                    if k <= 1.0:
                        return f"{t} TABLESAMPLE ({k * 100:g} PERCENT)"
                    return f"{t} TABLESAMPLE ({int(k)} ROWS)"
                code = _re.sub(
                    r"\b(data|metrics|query_log)(_final)?\s+SAMPLE\s+"
                    r"(\d+\.?\d*|\.\d+)\b",
                    _sample, code, flags=_re.IGNORECASE)
                # CH PREWHERE is WHERE plus a storage hint Catalyst
                # handles itself (pushdown); a query carrying BOTH
                # clauses fails Spark's parse with an explicit error
                # rather than silently dropping a predicate
                code = _re.sub(r"\bPREWHERE\b", "WHERE", code,
                               flags=_re.IGNORECASE)
                # CH numbers(n) / numbers(offset, n) table function ->
                # Spark range, with the column renamed to CH's `number`.
                # Our `AS numbers` default alias yields only when the
                # query supplies its own (`numbers(10) AS t`) — a
                # doubled alias is a parse error
                _kw = {"where", "group", "order", "limit", "having",
                       "union", "join", "inner", "left", "right",
                       "full", "cross", "on", "using", "intersect",
                       "except", "window", "qualify", "sample",
                       "lateral", "format"}

                def _numbers(m):
                    a = int(m.group(1))
                    b = m.group(2)
                    lo, hi = (a, a + int(b)) if b is not None else (0, a)
                    body = f"(SELECT id AS number FROM range({lo}, {hi}))"
                    nxt = _re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)",
                                    m.string[m.end():], _re.IGNORECASE)
                    if nxt and nxt.group(1).lower() not in _kw:
                        return body
                    return body + " AS numbers"
                code = _re.sub(
                    r"\bnumbers\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
                    _numbers, code)
                for ch, sp in (("argMax", "max_by"), ("argMin", "min_by"),
                               ("uniqCombined", "approx_count_distinct"),
                               ("uniqHLL12", "approx_count_distinct"),
                               ("uniq", "approx_count_distinct"),
                               ("anyLast", "any_value"),
                               ("anyHeavy", "mode"),
                               ("any", "any_value"),
                               ("groupArray", "collect_list"),
                               ("groupUniqArray", "collect_set"),
                               ("stddevPop", "stddev_pop"),
                               ("stddevSamp", "stddev_samp"),
                               ("varPop", "var_pop"),
                               ("varSamp", "var_samp"),
                               ("covarPop", "covar_pop"),
                               ("covarSamp", "covar_samp"),
                               ("groupBitAnd", "bit_and"),
                               ("groupBitOr", "bit_or"),
                               ("groupBitXor", "bit_xor")):
                    code = _re.sub(rf"\b{ch}\s*\(", sp + "(", code)
                return code

            _allowed = frozenset({"data", "metrics", "query_log",
                                  "data_final", "metrics_final", "parts"})
            try:
                rewritten = sqlguard.rewrite_code(query, _rw)
                sqlguard.assert_readonly(self.spark, rewritten, _allowed)
                # INTERPOLATE (col AS expr) expressions were stripped
                # from the query before the guard above ran, and they
                # are later evaluated verbatim via F.expr in the fill
                # path — run each through the SAME guard (banned plan
                # nodes, banned functions, relation allowlist) so the
                # readonly contract covers them too.
                if fill_spec is not None:
                    for _iexpr in (fill_spec.get("interpolate_exprs")
                                   or {}).values():
                        sqlguard.assert_readonly(
                            self.spark, f"SELECT {_iexpr}", _allowed)
            except sqlguard.GuardError as exc:
                raise ValueError(str(exc))
            try:
                df = self.spark.sql(rewritten).limit(max_rows)
            except Exception:
                # TOTALS+HAVING with a group key that is a SELECT alias
                # and NOT a base column: the primary rewrite's raw key
                # cannot resolve in WHERE scope — retry the variant with
                # the alias's defining expression substituted (matches
                # Spark's own base-column-first GROUP BY resolution).
                if not (totals_spec and totals_spec.get("alt_query")):
                    raise
                try:
                    rewritten = sqlguard.rewrite_code(
                        totals_spec["alt_query"], _rw)
                    sqlguard.assert_readonly(self.spark, rewritten, _allowed)
                except sqlguard.GuardError as exc:
                    raise ValueError(str(exc))
                df = self.spark.sql(rewritten).limit(max_rows)
            rows = df.collect()
            out_fields = df.schema.fields
            totals_row = None
            if totals_spec is not None:
                from pyspark.sql import Row as _Row

                out_fields = [f for f in out_fields
                              if f.name != _TOTALS_COL]
                names = [f.name for f in out_fields]
                data_rows = []
                for r in rows:
                    d = r.asDict()
                    flag = d.pop(_TOTALS_COL, 0)
                    row = _Row(*names)(*[d[k] for k in names])
                    if flag:
                        totals_row = row
                    else:
                        data_rows.append(row)
                rows = data_rows
                if totals_spec["limit"] is not None:
                    rows = rows[:totals_spec["limit"]]
            from pyspark.sql.types import StructType as _StructType

            out_schema = _StructType(out_fields)
            if fill_spec is not None:
                from graphouse_spark.operators.gapfill import stepped_fill

                rows = stepped_fill(self.spark, rows, out_schema, fill_spec)
                if fill_spec["limit"] is not None:
                    rows = rows[:fill_spec["limit"]]
            if limit_by is not None:
                rows = _apply_limit_by(rows, out_schema, limit_by)
            log["rows"] = len(rows)
            fmt_u = fmt.upper()
            if fmt_u == "JSONEACHROW":
                # CH JSONEachRow: one object per row, newline-delimited
                lines = [
                    json.dumps({f: (None if v is None else v)
                                for f, v in r.asDict().items()}, default=str)
                    for r in rows
                ]
                if totals_row is not None:
                    lines.append(json.dumps(
                        {f: (None if v is None else v)
                         for f, v in totals_row.asDict().items()},
                        default=str))
                return "\n".join(lines) + ("\n" if lines else "")
            if fmt_u in ("CSV", "CSVWITHNAMES"):
                import csv as _csv
                import io as _io

                buf = _io.StringIO()
                w = _csv.writer(buf, lineterminator="\n")
                if fmt_u == "CSVWITHNAMES":
                    w.writerow([f.name for f in out_fields])
                for r in rows:
                    w.writerow(["\\N" if v is None else v for v in r])
                if totals_row is not None:
                    w.writerow([])
                    w.writerow(["\\N" if v is None else v
                                for v in totals_row])
                return buf.getvalue()
            if fmt_u == "PRETTYCOMPACT":
                return _render_pretty(out_fields, rows, totals_row)
            if fmt_u == "VERTICAL":
                return _render_vertical(out_fields, rows, totals_row)
            if fmt_u == "TSVWITHNAMES":
                header = "\t".join(f.name for f in out_fields) + "\n"
                body_rows = "\n".join(
                    "\t".join("\\N" if v is None else str(v) for v in r)
                    for r in rows
                ) + ("\n" if rows else "")
                if totals_row is not None:
                    body_rows += "\n" + "\t".join(
                        "\\N" if v is None else str(v)
                        for v in totals_row) + "\n"
                return header + body_rows
            if fmt.upper() == "JSON":
                body = {
                    "meta": [{"name": f.name, "type": f.dataType.simpleString()}
                             for f in out_fields],
                    "data": [
                        {f: (None if v is None else v) for f, v in r.asDict().items()}
                        for r in rows
                    ],
                    "rows": len(rows),
                }
                if totals_row is not None:
                    body["totals"] = {
                        f: (None if v is None else v)
                        for f, v in totals_row.asDict().items()
                    }
                return json.dumps(body, default=str)
            # CH TabSeparated: \t columns, \n rows, no header; WITH
            # TOTALS appends the totals row after one empty line,
            # exactly the CH TabSeparated framing
            out = "\n".join(
                "\t".join("\\N" if v is None else str(v) for v in r)
                for r in rows
            ) + ("\n" if rows else "")
            if totals_row is not None:
                out += "\n" + "\t".join(
                    "\\N" if v is None else str(v) for v in totals_row
                ) + "\n"
            return out

    def find_pickle(self, query: str) -> bytes:
        """``/metrics/find?format=pickle`` — the remote-finder twin of
        :meth:`find_nodes`: a pickled list of
        ``{metric_path, isLeaf, intervals}`` dicts (RemoteFinder's
        expected node shape; intervals empty — the engine serves any
        requested range and prunes at scan time)."""
        import pickle

        nodes = [
            {"metric_path": n["id"], "isLeaf": bool(n["leaf"]), "intervals": []}
            for n in self.find_nodes(query)
        ]
        return pickle.dumps(nodes, protocol=2)

    def explain_target(self, target: str, start: int, end: int,
                       now_seconds: int | None = None) -> str:
        """The formatted Spark physical plan a render target compiles
        to — ClickHouse's EXPLAIN for the graphite surface. Shows
        PushedFilters/PartitionFilters and WholeStageCodegen spans
        without executing anything."""
        from graphouse_spark.functions.target import (
            collect_series_globs,
            evaluate_target,
        )

        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        names: list[str] = []
        seen: set[str] = set()
        for g in collect_series_globs(target):
            for m in self.tree.search(g):
                if not m.endswith(".") and m not in seen:
                    seen.add(m)
                    names.append(m)
        data = read_data(self.spark, self.data_path)
        frame = self.data_service.base_series(
            self.spark, data, names, start, end, now_seconds
        )
        df = evaluate_target(frame, target, start=start, end=end)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def estimate_target(self, target: str, start: int, end: int,
                        now_seconds: int | None = None) -> dict:
        """ClickHouse ``EXPLAIN ESTIMATE`` for the graphite surface:
        how much of the lake this target would scan, from the skip
        indexes alone — no data read, no job run.

        ``files_total``/``files_scanned`` come from the zonemap range
        prune intersected with the bloom membership prune (the same
        path the real read takes), ``rows_estimate`` sums the zonemap's
        per-file row counts over the survivors — an UPPER bound, the
        may-contain discipline's estimate analog. Without a built
        index the answer is honestly unknown (``indexed: false``)
        rather than a fake full-scan number.
        """
        from graphouse_spark.functions.target import collect_series_globs
        from graphouse_spark.sources import skipping

        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        names: list[str] = []
        seen: set[str] = set()
        for g in collect_series_globs(target):
            for m in self.tree.search(g):
                if not m.endswith(".") and m not in seen:
                    seen.add(m)
                    names.append(m)
        out = {"target": target, "series": len(names), "indexed": False,
               "files_total": None, "files_scanned": None, "rows_estimate": None}
        index_path = self.data_service.index_path
        if not index_path or not _exists(self.spark, index_path, self._fs_cache):
            return out
        try:
            index = skipping.read_file_index(self.spark, index_path)
            rows_by_file: dict[str, int] = {}
            for r in index.select("file", "rows").collect():
                rows_by_file[r["file"]] = max(
                    rows_by_file.get(r["file"], 0), r["rows"] or 0)
            files = skipping.prune_files_for_query(index, names, start, end)
            bloom_path = index_path.rstrip("/") + "_bloom"
            if files and _exists(self.spark, bloom_path, self._fs_cache):
                blooms = skipping.read_bloom_index(self.spark, bloom_path)
                indexed = {r["file"] for r in
                           blooms.select("file").distinct().collect()}
                may = set(skipping.prune_files_bloom(blooms, names))
                files = [f for f in files if f not in indexed or f in may]
        except Exception:
            return out  # unreadable index: same honest-unknown answer
        out.update(
            indexed=True,
            files_total=len(rows_by_file),
            files_scanned=len(files),
            rows_estimate=sum(rows_by_file.get(f, 0) for f in files),
        )
        return out

    # -- /metrics/find (graphite-web finder JSON, beyond-reference) --
    def find_nodes(self, query: str) -> list[dict]:
        """graphite-web ``/metrics/find?format=treejson`` node list.

        The plugin implements find by round-tripping ``/search`` text
        and re-deriving leaf/branch from the trailing dot
        (graphouse.py:202-225); serving the JSON shape directly lets a
        dashboard talk to the engine with no plugin in between.
        ``leaf``/``expandable`` follow the trailing-dot convention;
        ``id`` is the full path, ``text`` the last segment.
        """
        if not self._loaded:
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        out = []
        for m in self.tree.search(query):
            is_dir = m.endswith(".")
            path = m[:-1] if is_dir else m
            out.append({
                "id": path,
                "text": path.rsplit(".", 1)[-1],
                "leaf": 0 if is_dir else 1,
                "expandable": 1 if is_dir else 0,
                "allowChildren": 1 if is_dir else 0,
            })
        return out

    def find_nodes_json(self, query: str) -> str:
        return json.dumps(self.find_nodes(query))

    def _metric_data(self, patterns: list[str], start: int, end: int,
                     now_seconds: int | None = None) -> dict:
        # literals also route through search (MetricDataService.java:86-98):
        # banned/hidden/unknown names produce no series at all, while
        # registered-but-dataless metrics get full null series
        names: list[str] = []
        seen = set()
        for pattern in patterns:
            for m in self.tree.search(pattern):
                if not m.endswith(".") and m not in seen:
                    seen.add(m)
                    names.append(m)
        # the HTTP layer bounds the POSTed list; globs can expand far
        # past it, so re-check on the EXPANDED set before any fetch
        if 0 < self.max_metrics_per_query < len(names):
            raise QueryLimitExceeded(
                "Too many metrics in query. Provided %d, max %d"
                % (len(names), self.max_metrics_per_query))
        data = read_data(self.spark, self.data_path)
        return self.data_service.get_data(self.spark, data, names, start, end, now_seconds)

    def metric_data_json(self, *args, **kwargs) -> str:
        # compact separators = Gson JsonWriter's framing
        # (MetricDataRowCallbackHandler.java writes no whitespace), so
        # the plugin sees byte-identical JSON — and multi-MB responses
        # shed the ~15% padding json.dumps' default separators add
        return json.dumps(self.metric_data(*args, **kwargs),
                          separators=(",", ":"))

    # -- /checkOnRecordCache + /printBannedCacheState diagnostics --
    def check_on_record_cache(self, metric_name: str) -> str:
        """OnRecordMetricCacheServlet.checkMetricStateInCache analog:
        the write-path view of one metric — non-SIMPLE ancestors first
        (the ban trace), then the full per-level tree trace."""
        if not self._loaded:
            raise RuntimeError("Metric tree not loaded")
        trace = self.tree.trace_state(metric_name)
        banned = [l for l in trace
                  if not l.endswith(" SIMPLE") and "NOT_FOUND" not in l]
        return "\n".join(["Banned cache:"] + banned
                         + ["Tree cache:"] + trace) + "\n"

    def print_banned_cache_state(self) -> str:
        if not self._loaded:
            raise RuntimeError("Metric tree not loaded")
        return self.tree.cache_state()

    # -- /ban /approve /hide /multiModify --
    def modify(self, pattern: str, status: str) -> list[str]:
        """Set status on a path or on every glob match; returns touched names."""
        if not self._loaded:
            # every route 503s until bootstrap finishes
            # (MetricSearchServlet.isServerNotReady) — mutating an empty
            # tree would persist bogus status rows
            raise RuntimeError("metric tree not loaded yet (the reference returns 503)")
        st = MetricStatus(status)
        targets = self.tree.search(pattern) if contains_expressions(pattern) else [pattern]
        touched: list[str] = []
        for name in targets:
            node = self.tree.modify(name, st)
            if node is not None:
                touched.append(name)
        if touched:
            self._persist_status(touched, st)
        return touched

    def ban(self, pattern: str) -> list[str]:
        return self.modify(pattern, "BAN")

    def approve(self, pattern: str) -> list[str]:
        return self.modify(pattern, "APPROVED")

    def hide(self, pattern: str) -> list[str]:
        return self.modify(pattern, "HIDDEN")

    def _persist_status(self, names: list[str], status: MetricStatus) -> None:
        from graphouse_spark.paths import get_level, get_parent_name

        rows = [(n, get_level(n), get_parent_name(n), status.value) for n in names]
        df = self.spark.createDataFrame(rows, "name string, level int, parent string, status string")
        df = df.selectExpr("name", "level", "parent", "status", "current_timestamp() AS updated")
        write_metrics(df, self.metrics_path)
