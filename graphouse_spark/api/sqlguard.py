"""Read-only SQL guard for the /query HTTP interface.

The reference firewalls its CH HTTP endpoint with ``readonly=1``;
Spark has no such session flag, and source-text keyword checks are
bypassable two ways (both demonstrated against the previous guard):

- CTE-prefixed DML: ``WITH t AS (SELECT ...) INSERT OVERWRITE
  DIRECTORY '/path' ...`` starts with WITH yet writes to disk.
- backtick-quoted spellings: ``` `reflect`('java.lang.System', ...) ```
  and ``` FROM `text`.`/etc/passwd` ``` dodge any unquoted-word regex.

So the guard validates the PARSED PLAN, not the text:

1. tokenize the query (string literals / backtick identifiers /
   comments), rejecting malformed spans and identifiers that could
   forge treeString lines;
2. rebuild a SANITIZED twin with every string literal replaced by
   ``'X'`` and comments dropped — structurally identical (literals
   only carry values), but its plan tree contains no attacker text;
3. parse the sanitized twin with Spark's own SQL parser and walk the
   tree string: every node name must avoid the DML/DDL blacklist,
   every ``UnresolvedRelation`` must be a registered view or a CTE
   defined in the query itself, and every unresolved function must
   avoid the JVM-reflective blacklist.

Rewrites (``graphite.data`` -> view name, CH aggregate spellings) run
through the same tokenizer, touching only code segments — a string
literal ``'graphite.data.x'`` passes through byte-for-byte.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# node names that mean the statement is not a pure query.  Matched as
# substrings of the parsed logical-plan node name (InsertIntoDir,
# InsertIntoStatement, CreateTableAsSelectStatement, ExplainCommand...).
# UnresolvedIdentifier bans the IDENTIFIER('...') clause, which would
# otherwise let a literal smuggle a table name past the allowlist.
_BANNED_NODES = re.compile(
    r"Insert|Create|Drop|Alter|Delete|Update|Merge|Truncate|Write"
    r"|Command|AddJar|AddFile|Analyze|Cache|Refresh|Repair|LoadData"
    r"|SetCatalog|SetNamespace|UnresolvedIdentifier",
    re.IGNORECASE,
)

_BANNED_FUNCTIONS = frozenset({
    "reflect", "java_method", "input_file_name",
    "input_file_block_start", "input_file_block_length",
})

_EXPLAIN_PREFIX = re.compile(
    r"^\s*EXPLAIN(\s+(EXTENDED|CODEGEN|COST|FORMATTED))?\s+", re.IGNORECASE
)


@dataclass
class Segment:
    kind: str  # "code" | "string" | "ident" | "comment"
    text: str  # raw text including delimiters


class GuardError(ValueError):
    """Raised when a query is rejected by the readonly guard."""


def tokenize(query: str) -> list[Segment]:
    """Split ``query`` into code / string-literal / backtick-identifier
    / comment segments. Raises :class:`GuardError` on unterminated
    spans. Handles ``''`` / ``""`` doubling, backslash escapes inside
    quotes, ``--`` line comments and ``/* */`` block comments."""
    segs: list[Segment] = []
    i, n = 0, len(query)
    code_start = 0

    def flush_code(end: int) -> None:
        nonlocal code_start
        if end > code_start:
            segs.append(Segment("code", query[code_start:end]))

    while i < n:
        ch = query[i]
        if ch in ("'", '"'):
            flush_code(i)
            j = i + 1
            while j < n:
                if query[j] == "\\":
                    j += 2
                    continue
                if query[j] == ch:
                    if j + 1 < n and query[j + 1] == ch:  # '' doubling
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                raise GuardError("unterminated string literal")
            segs.append(Segment("string", query[i:j + 1]))
            i = j + 1
            code_start = i
        elif ch == "`":
            flush_code(i)
            j = i + 1
            while j < n:
                if query[j] == "`":
                    if j + 1 < n and query[j + 1] == "`":  # `` doubling
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                raise GuardError("unterminated quoted identifier")
            body = query[i + 1:j]
            # an identifier containing newlines or brackets could forge
            # plan-tree lines the validator trusts; no legitimate
            # metric/column name needs them
            if any(c in body for c in "\n\r[]"):
                raise GuardError("quoted identifier contains forbidden "
                                 "characters")
            segs.append(Segment("ident", query[i:j + 1]))
            i = j + 1
            code_start = i
        elif ch == "-" and query[i:i + 2] == "--":
            flush_code(i)
            j = query.find("\n", i)
            j = n if j < 0 else j
            segs.append(Segment("comment", query[i:j]))
            i = j
            code_start = i
        elif ch == "/" and query[i:i + 2] == "/*":
            flush_code(i)
            j = query.find("*/", i + 2)
            if j < 0:
                raise GuardError("unterminated block comment")
            segs.append(Segment("comment", query[i:j + 2]))
            i = j + 2
            code_start = i
        else:
            i += 1
    flush_code(n)
    return segs


def rewrite_code(query: str, fn) -> str:
    """Apply ``fn(text) -> text`` to code segments only; string
    literals, quoted identifiers and comments pass through verbatim."""
    return "".join(
        fn(s.text) if s.kind == "code" else s.text for s in tokenize(query)
    )


# Literal bodies matching this charset pass through sanitized()
# unchanged: digits, hex letters, ISO date/timestamp punctuation and
# the T/Z markers. Nothing here can open a paren (the function check
# needs "name("), start a plan-tree line (needs \n) or quote/escape
# (the tokenizer already consumed the delimiters) — yet it covers the
# typed literals Spark VALIDATES AT PARSE TIME (DATE '2020-01-01',
# TIMESTAMP '...', X'41'), which an 'X' placeholder would break.
_SAFE_LITERAL_BODY = re.compile(r"^[0-9a-fA-F:. +\-TZ]*$")

# INTERVAL bodies additionally carry unit words ('5 minutes',
# '1-2' YEAR TO MONTH): word chars, digits, space, colon, dot, dash.
# Still no parens/newlines/quotes/backticks/brackets.
_SAFE_INTERVAL_BODY = re.compile(r"^[\w .:\-]*$")

_TYPE_CONSTRUCTOR = re.compile(
    r"(?:^|[^\w])(DATE|TIMESTAMP|TIMESTAMP_NTZ|TIMESTAMP_LTZ|INTERVAL|X)\s*$",
    re.IGNORECASE,
)


def sanitized(query: str) -> str:
    """The structural twin: string literals become ``'X'``, comments
    become a space, code and identifiers stay. Its parse tree is
    attacker-text-free (given the identifier character check).

    Exception — typed literals: Spark validates DATE/TIMESTAMP/X'..'
    bodies at parse time, so ``DATE 'X'`` would reject legitimate
    time-filter queries. When the preceding code ends in a
    type-constructor keyword AND the body fits a strict safe charset
    (see ``_SAFE_LITERAL_BODY``), the literal passes through; the
    charset cannot form function calls, plan-tree lines or quoting."""
    out = []
    prev_code = ""
    for s in tokenize(query):
        if s.kind == "string":
            body = s.text[1:-1]
            m = _TYPE_CONSTRUCTOR.search(prev_code)
            safe = (_SAFE_INTERVAL_BODY
                    if m and m.group(1).upper() == "INTERVAL"
                    else _SAFE_LITERAL_BODY)
            if m and safe.match(body):
                out.append(s.text)
            else:
                out.append("'X'")
        elif s.kind == "comment":
            out.append(" ")
        else:
            out.append(s.text)
        if s.kind == "code":
            prev_code = s.text
    return "".join(out)


def _node_names(tree: str) -> list[str]:
    names = []
    for line in tree.splitlines():
        m = re.match(r"^[\s:+|\-]*'?([A-Za-z][A-Za-z0-9_]*)", line)
        if m:
            names.append(m.group(1))
    return names


def assert_readonly(spark, query: str,
                    allowed_relations: frozenset[str]) -> None:
    """Parse the sanitized twin of ``query`` and reject anything that
    is not a pure read over ``allowed_relations`` (or the query's own
    CTEs). Raises :class:`GuardError` with a reason."""
    safe = sanitized(query)
    # EXPLAIN parses to ExplainCommand (a Command); validate its body
    safe = _EXPLAIN_PREFIX.sub("", safe)
    try:
        jplan = spark._jsparkSession.sessionState().sqlParser().parsePlan(safe)
    except Exception as exc:  # noqa: BLE001 - parser errors vary
        raise GuardError(f"parse error: {str(exc).splitlines()[0][:200]}")
    tree = jplan.treeString()

    for name in _node_names(tree):
        if _BANNED_NODES.search(name):
            raise GuardError(f"statement kind not served ({name}); the "
                             "/query interface is readonly")

    ctes = {
        part.strip().lower()
        for m in re.finditer(r"^[\s:+|\-]*'?CTE \[([^\]]*)\]", tree,
                             re.MULTILINE)
        for part in m.group(1).split(",")
    }
    for m in re.finditer(r"'?UnresolvedRelation \[([^\]]*)\]", tree):
        rel = ".".join(p.strip() for p in m.group(1).split(",")).lower()
        if rel not in allowed_relations and rel not in ctes:
            raise GuardError(f"relation `{rel}` is not served (query the "
                             "registered views)")

    for m in re.finditer(r"'(\w+)\(", tree):
        if m.group(1).lower() in _BANNED_FUNCTIONS:
            raise GuardError(f"function {m.group(1)} is not served")
