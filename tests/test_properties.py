"""Property-based tests (hypothesis) for the pure core.

Invariants that must hold for ANY input, not just the reference
corpus: glob compilation safety, validator/pattern agreement, path
arithmetic round-trips, retention monotonic lookup, query-param grid
laws.
"""

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from graphouse_spark.globs import compile_glob, glob_to_regex, level_glob_to_regex
from graphouse_spark.paths import MetricValidator, get_level, get_parent_name, is_dir
from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.retention import MetricRetention
from graphouse_spark.status import MetricStatus, select_status

name_chars = st.text(alphabet="abcdefABC012-_", min_size=1, max_size=8)
paths = st.lists(name_chars, min_size=1, max_size=6).map(".".join)
glob_chars = st.text(alphabet="abc01*?[]{}-,.\\", min_size=0, max_size=12)


@given(glob_chars)
@settings(max_examples=300)
def test_glob_compiler_never_raises(g):
    # any input either compiles to a valid regex or returns None
    r = glob_to_regex(g)
    if r is not None:
        re.compile(r)


@given(paths)
@settings(max_examples=200)
def test_literal_glob_matches_itself(p):
    # a glob with no metacharacters matches exactly its own path
    m = compile_glob(p)
    assert m is not None and m.match(p)


@given(paths)
@settings(max_examples=200)
def test_parent_level_roundtrip(p):
    parent = get_parent_name(p)
    if parent:
        assert is_dir(parent)
        assert get_level(parent) == get_level(p) - 1
        assert p.startswith(parent)
    else:
        assert get_level(p) == 1


@given(paths, st.booleans())
@settings(max_examples=200)
def test_validator_accepts_only_its_charset(p, allow_dirs):
    v = MetricValidator()
    if v.validate(p, allow_dirs):
        assert re.fullmatch(r"[-_0-9a-zA-Z\.]*", p)
        assert ".." not in p and not p.startswith(".")


@given(st.integers(min_value=-10**6, max_value=10**9))
@settings(max_examples=200)
def test_retention_step_monotone_in_config(age):
    r = MetricRetention("avg", {0: 1, 3600: 5, 86400: 60})
    step = r.step_size(age)
    assert step in (1, 5, 60)
    # coarser with age
    assert r.step_size(max(age, 0) + 10**9) >= step


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=-1, max_value=5000),
)
@settings(max_examples=300)
def test_query_params_grid_laws(start, span, max_points):
    end = start + span
    r = MetricRetention("avg", {0: 60})
    p = MetricDataQueryParams.create([r], start, end, max_points, now_seconds=end)
    assert p.start_time_seconds % p.step_seconds == 0
    assert (p.end_time_seconds - p.start_time_seconds) % p.step_seconds == 0
    assert p.start_time_seconds <= start
    assert p.end_time_seconds <= p.start_time_seconds + span + p.step_seconds
    if max_points > 0:
        assert p.num_points <= max_points


@given(st.sampled_from(list(MetricStatus)), st.sampled_from(list(MetricStatus)))
def test_select_status_closed_and_stable(old, new):
    out = select_status(old, new)
    assert out in (old, new)
    # applying the same request twice changes nothing more
    assert select_status(out, new) == out


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_target_parser_never_crashes_unexpectedly(target):
    """The render-target parser either parses or raises ValueError —
    never an unhandled exception (the HTTP layer maps ValueError to
    400; anything else would 500)."""
    from graphouse_spark.functions.target import parse_target

    try:
        parse_target(target)
    except ValueError:
        pass


@given(st.lists(st.sampled_from(
    ["SELECT", " ", "'", '"', "`", "--", "/*", "*/", "\\", "\n",
     "a", "1", ",", "(", ")", "x'y", "it''s"]), max_size=30))
@example(parts=['"', "'", '"']).via("discovered failure")
@example(parts=["\\", "'", "\\", "'", "'"]).via("discovered failure")
def test_sqlguard_tokenize_roundtrips_or_rejects(parts):
    """For ANY byte soup: tokenize either rejects (GuardError) or
    returns segments that concatenate back to the input exactly —
    never silently drops or reorders text."""
    from graphouse_spark.api.sqlguard import GuardError, tokenize

    q = "".join(parts)
    try:
        segs = tokenize(q)
    except GuardError:
        return
    assert "".join(s.text for s in segs) == q
    # literal-free twin never leaks string-literal content
    from graphouse_spark.api.sqlguard import sanitized
    try:
        s = sanitized(q)
    except GuardError:
        return
    code_text = "".join(seg.text for seg in segs if seg.kind != "string")
    for seg in segs:
        if seg.kind == "string" and len(seg.text) > 2:
            content = seg.text[1:-1]
            # the twin may legitimately contain the substring when the
            # CODE itself contains it — only a literal-only payload
            # must vanish
            if content in ("X", "") or content in code_text:
                continue
            # the 'X' placeholder's own delimiters are quote chars; a
            # literal whose content is all quote/escape characters
            # (e.g. "'", or "\\'" when a code segment happens to end
            # in a backslash right before the placeholder's opening
            # quote) can "leak" only via delimiters and code syntax,
            # never via payload — exempt pure-syntax contents
            if set(content) <= set("'\"`\\"):
                continue
            assert content not in s


@given(st.integers(1, 4), st.integers(1, 24), st.integers(1, 24),
       st.integers(0, 2 ** 32 - 1))
@settings(max_examples=20, deadline=None)
def test_png_roundtrip_lossless_property(nc, h, w, seed):
    import numpy as np

    from graphouse_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if nc == 1 else (h, w, nc)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    assert (decode_png(encode_png(img))["pixels"] == img).all()


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 255))
@settings(max_examples=20, deadline=None)
def test_jpeg_flat_roundtrip_exact_property(h, w, v):
    import numpy as np

    from graphouse_spark.functions.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    img = np.full((h, w), v, dtype=np.uint8)
    assert (decode_baseline_jpeg(encode_baseline_jpeg(img))["pixels"]
            == img).all()


# ------------------------------------------------ /query CH rewriters

_literal_contents = st.text(
    alphabet=st.characters(blacklist_characters="\x00"),
    max_size=30,
).map(lambda s: s.replace("'", "''"))


@settings(max_examples=300, deadline=None)
@given(_literal_contents, _literal_contents)
def test_combinator_rewrite_never_touches_literals(a, b):
    """The combinator rewriter parses with a literal-masked shadow:
    whatever hostile text sits inside string literals — including
    'sumIf(', unbalanced parens, WITH TOTALS — must pass through
    byte-identical, and the rewrite must reach a fixpoint."""
    from graphouse_spark.api.service import (
        _rewrite_combinator_aggs, _rewrite_array_join)
    from graphouse_spark.api import sqlguard

    q = (f"SELECT sumIf(value, metric = '{a}') AS s, "
         f"countIf(metric != '{b}') AS n FROM data")
    try:
        out = _rewrite_combinator_aggs(q)
    except sqlguard.GuardError:
        return  # hostile content may legitimately fail tokenization
    # literals survive verbatim
    lits = [seg.text for seg in sqlguard.tokenize(out)
            if seg.kind == "string"]
    assert f"'{a}'" in lits and f"'{b}'" in lits
    # combinator names are gone from CODE segments (fixpoint)
    code = "".join(seg.text for seg in sqlguard.tokenize(out)
                   if seg.kind == "code")
    assert "sumIf" not in code and "countIf" not in code
    # idempotent: a second pass changes nothing
    assert _rewrite_combinator_aggs(out) == out
    assert _rewrite_array_join(out) == out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["sumIf(v, c)", "countIf(c)", "quantile(0.5)(v)", "uniqExact(k)",
     "avgIf(v, c)", "quantilesExact(0.1, 0.9)(v)", "max(v)"]),
    min_size=1, max_size=5))
def test_combinator_rewrite_composes_any_select_list(parts):
    from graphouse_spark.api.service import _rewrite_combinator_aggs
    from graphouse_spark.api import sqlguard

    q = "SELECT " + ", ".join(
        f"{p} AS c{i}" for i, p in enumerate(parts)) + " FROM data"
    out = _rewrite_combinator_aggs(q)
    code = "".join(seg.text for seg in sqlguard.tokenize(out)
                   if seg.kind == "code")
    for name in ("sumIf", "countIf", "avgIf", "uniqExact(",
                 "quantile(", "quantilesExact("):
        assert name not in code
    assert out.count("(") == out.count(")")
    assert _rewrite_combinator_aggs(out) == out
