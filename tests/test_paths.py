"""Ports of MetricUtilTest.java and MetricValidatorTest.java."""

from graphouse_spark.paths import (
    MetricValidator,
    get_last_level_name,
    get_level,
    get_parent_name,
    is_dir,
)

VALIDATOR = MetricValidator(r"[-_0-9a-zA-Z\.]*$", 5, 500, 2, 20)


def test_last_level_name():
    assert get_last_level_name("a.b.c") == "c"
    assert get_last_level_name("a.b.c.") == "c"


def test_parent_name():
    assert get_parent_name("one_min.") == ""
    assert get_parent_name("one_min.clickphite.") == "one_min."
    assert get_parent_name("one_min.clickphite.some_metric") == "one_min.clickphite."


def test_level():
    assert get_level("one_min.") == 1
    assert get_level("one_min.clickphite.") == 2
    assert get_level("one_min.clickphite.some_metric") == 3
    assert get_level("one_min.market.market_api.gravicapa06e_yandex_ru.gc.endOfMajorGC") == 6


def test_is_dir():
    assert is_dir("one_min.")
    assert not is_dir("one_min.x")


def test_validator_corpus():
    # MetricValidatorTest.java:16-34
    assert VALIDATOR.validate("five_min.", allow_dirs=True)
    assert not VALIDATOR.validate("gdsgsgs", allow_dirs=True)
    assert VALIDATOR.validate("one_min.fdsfdsfs.fdsfsfsd", allow_dirs=True)
    assert not VALIDATOR.validate("five_min.", allow_dirs=False)
    assert not VALIDATOR.validate("-嘊-嘊嘍-嘍-aaa_.._tt_personal-billing-report_xml.0_995", allow_dirs=True)
    assert not VALIDATOR.validate(
        "market.mbo-front-iva.timings-dynamic.3febfdd52d4fea02xxx'x22<>_.._tt_personal-billing-report_xml_.0_995",
        allow_dirs=True,
    )
    assert not VALIDATOR.validate(
        "market.mbo-front-iva.timings-dynamic.tt_personal-billing-report_xml_3febfdd52d4fea02xxx'x22<>_...0_99",
        allow_dirs=True,
    )
    assert not VALIDATOR.validate("one_min.fdsfdsfs..fdsfsfsd", allow_dirs=True)
    assert not VALIDATOR.validate("one_min.fdsfdsfs.fdsfsfsd.", allow_dirs=False)
    assert VALIDATOR.validate("one_min.fdsfdsfs.fdsfsfsd.", allow_dirs=True)
    assert not VALIDATOR.validate(".one_min.fdsfdsfs.fdsfsfsd", allow_dirs=True)
    assert not VALIDATOR.validate("one_min..x", allow_dirs=True)
    assert not VALIDATOR.validate(
        "one_min.x.x.d.d.d.d.d.d.x.x.x.x.d.x.d.d.x.d.d.d.d.d.d.x.x.x.x.d.x.d.d", allow_dirs=True
    )
    assert not VALIDATOR.validate("nameadsfdsfdsfdsfsd", allow_dirs=True)
    assert not VALIDATOR.validate("a.b", allow_dirs=True)
