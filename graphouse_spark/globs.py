"""Graphite glob -> regex compiler.

The reference matches search queries per path level with NIO
``FileSystem.getPathMatcher("glob:...")``
(/root/reference/src/main/java/ru/yandex/market/graphouse/search/tree/MetricTree.java:227-233).
Supported syntax: ``*`` ``?`` ``[a-z]`` ``[!a-z]`` ``{a,b}`` (groups
cannot nest), ``\\`` escapes. An **invalid glob compiles to None** and
the caller returns an empty result instead of erroring
(MetricTree.java:101-103).

Two forms:
- :func:`level_glob_to_regex` — one path component; ``*`` never
  crosses a dot (matches NIO semantics where ``*`` stops at the
  separator).
- :func:`glob_to_regex` — a full dotted query compiled into a single
  anchored regex usable with ``Column.rlike`` so glob search can run
  as one JVM-side filter over the ``metrics`` table at any scale.
"""

from __future__ import annotations

import re
import warnings

_EXPRESSION_CHARS = set("*?[]{}")


def _compile_or_none(pattern: str) -> "re.Pattern[str] | None":
    """``re.compile`` with FutureWarning treated as invalid: a pattern
    the stdlib warns about (e.g. the set-difference parse of a
    malformed range like ``[0--]``) may change meaning under a future
    ``re`` — the invalid-glob contract (None -> empty result,
    MetricTree.java:101-103) is the safe bucket for it, and the
    warning must not leak to callers either way."""
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            return re.compile(pattern)
    except (re.error, FutureWarning):
        return None


def contains_expressions(s: str) -> bool:
    """True if the string has any glob metacharacter (MetricTree.java:235-242)."""
    return any(c in _EXPRESSION_CHARS for c in s)


def level_glob_to_regex(glob: str) -> str | None:
    """Translate one glob path component to a regex fragment.

    Returns None for invalid syntax (unterminated class/group, nested
    groups, dangling escape).
    """
    out: list[str] = []
    i, n = 0, len(glob)
    group_depth = 0
    while i < n:
        c = glob[i]
        if c == "\\":
            if i + 1 >= n:
                return None
            out.append(re.escape(glob[i + 1]))
            i += 2
        elif c == "*":
            # '**' in a single component degenerates to '*'
            while i + 1 < n and glob[i + 1] == "*":
                i += 1
            out.append("[^.]*")
            i += 1
        elif c == "?":
            out.append("[^.]")
            i += 1
        elif c == "[":
            j = i + 1
            neg = False
            if j < n and glob[j] == "!":
                neg = True
                j += 1
            body_start = j
            if j < n and glob[j] == "]":  # leading ']' is a literal
                j += 1
            while j < n and glob[j] != "]":
                j += 1
            if j >= n or j == body_start:
                return None  # unterminated or empty class
            inner = glob[body_start:j].replace("\\", "\\\\")
            if inner[0] == "^":
                inner = "\\" + inner
            # [, ], &, |, ~ are literals inside a class in both Python
            # and Java, but unescaped they trip Python's FutureWarning
            # machinery (nested set / set operations) — meaning a
            # future `re` may change what they match. Escaping pins
            # the literal meaning forever without changing it today.
            inner = re.sub(r"[\[\]&|~]", lambda m: "\\" + m.group(0), inner)
            out.append("[" + ("^" if neg else "") + inner + "]")
            i = j + 1
        elif c == "{":
            if group_depth > 0:
                return None  # groups cannot nest
            group_depth += 1
            out.append("(?:")
            i += 1
        elif c == ",":
            if group_depth > 0:
                out.append("|")
            else:
                out.append(",")
            i += 1
        elif c == "}":
            if group_depth == 0:
                return None
            group_depth -= 1
            out.append(")")
            i += 1
        else:
            out.append(re.escape(c))
            i += 1
    if group_depth != 0:
        return None
    return "".join(out)


def glob_to_regex(query: str, anchor: bool = True) -> str | None:
    """Compile a full dotted glob query to one regex.

    ``five_sec.int_874?.x*`` -> ``^five_sec\\.int_874[^.]\\.x[^.]*$``.
    Returns None when any component is invalid.
    """
    parts = query.split(".")
    compiled: list[str] = []
    for part in parts:
        r = level_glob_to_regex(part)
        if r is None:
            return None
        compiled.append(r)
    body = "\\.".join(compiled)
    out = f"^{body}$" if anchor else body
    # malformed classes like [0--] survive translation but are invalid
    # regexes (in Python and Java alike); the invalid-glob contract is
    # None -> empty result, never an error (MetricTree.java:101-103)
    if _compile_or_none(out) is None:
        return None
    return out


def compile_glob(query: str) -> "re.Pattern[str] | None":
    """Python-side matcher for the driver tree index (None if invalid)."""
    r = glob_to_regex(query)
    if r is None:
        return None
    return _compile_or_none(r)


def compile_level_glob(glob: str) -> "re.Pattern[str] | None":
    """Matcher for a single path component (None if invalid)."""
    r = level_glob_to_regex(glob)
    if r is None:
        return None
    return _compile_or_none(f"^{r}$")
