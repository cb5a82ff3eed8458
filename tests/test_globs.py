"""Glob compiler corpus (MetricTreeTest.java:31-58 + adversarial cases)."""

import pytest

from graphouse_spark.globs import compile_glob, compile_level_glob, contains_expressions, glob_to_regex

# (glob, candidates that must match) — MetricTreeTest.generate()
CORPUS = [
    ("msh0[1-6]d_market_yandex_net", ["msh01d_market_yandex_net", "msh03d_market_yandex_net"]),
    ("min.market-front*.e", ["min.market-front.e", "min.market-front-ugr.e"]),
    ("min.market-front{-ugr,-fol}.e", ["min.market-front-fol.e", "min.market-front-ugr.e"]),
    ("min.market-front{,-ugr,-fol}.e", ["min.market-front.e", "min.market-front-ugr.e"]),
]


@pytest.mark.parametrize("glob,candidates", CORPUS)
def test_glob_corpus(glob, candidates):
    matcher = compile_glob(glob)
    assert matcher is not None
    for cand in candidates:
        assert matcher.match(cand), f"{glob} must match {cand}"


def test_invalid_glob_returns_none():
    assert compile_glob("asdf[") is None
    assert compile_glob("a{b{c,d}}") is None  # nested groups
    assert compile_glob("a{b,c") is None
    assert compile_glob("trailing\\") is None


def test_contains_expressions():
    assert contains_expressions("msh0[1-6]d_market_yandex_net")
    assert not contains_expressions("plain.metric.name")


def test_star_does_not_cross_levels():
    m = compile_glob("five_sec.*")
    assert m.match("five_sec.int_8742")
    assert not m.match("five_sec.int_8742.x1")


def test_question_mark():
    m = compile_glob("five_sec.int_874?.x1")
    assert m.match("five_sec.int_8742.x1")
    assert m.match("five_sec.int_8743.x1")
    assert not m.match("five_sec.int_874.x1")
    assert not m.match("five_sec.int_87422.x1")


def test_negated_class():
    m = compile_level_glob("x[!0-5]")
    assert m.match("x7")
    assert not m.match("x3")


def test_escape():
    m = compile_level_glob("a\\*b")
    assert m.match("a*b")
    assert not m.match("axb")


def test_regex_metachars_quoted():
    m = compile_level_glob("a+b(c)")
    assert m.match("a+b(c)")
    assert not m.match("aab(c)")


def test_full_regex_for_rlike():
    assert glob_to_regex("five_sec.int_8742.x*") == r"^five_sec\.int_8742\.x[^.]*$"


def test_bracket_inside_class_is_warning_free():
    # '[' in a class body trips Python's nested-set FutureWarning
    # unescaped — meaning a future `re` could change the match
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m = compile_level_glob("a[[]b")
        assert m.match("a[b")
        assert not m.match("axb")
        m = compile_level_glob("a[&|~]b")
        assert m.match("a&b") and m.match("a|b") and m.match("a~b")
        m = compile_level_glob("a[x&&y]b")  # doubled set-op chars
        assert m.match("a&b") and m.match("axb")
        # valid range whose endpoints include '-' stays a range
        m = compile_level_glob("v[--0]")
        assert m.match("v.") and not m.match("v1")


def test_invalid_range_is_none_and_silent():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert compile_level_glob("x[0--]") is None
        assert glob_to_regex("a.x[0--].b") is None
