"""Status lattice semantics (MetricStatus.java:48-103)."""

from graphouse_spark.status import MetricStatus as S
from graphouse_spark.status import select_status


def test_visible():
    assert S.SIMPLE.visible
    assert S.APPROVED.visible
    assert not S.BAN.visible
    assert not S.AUTO_BAN.visible
    assert not S.HIDDEN.visible
    assert not S.AUTO_HIDDEN.visible


def test_handmade():
    assert S.APPROVED.handmade and S.BAN.handmade and S.HIDDEN.handmade
    assert not (S.SIMPLE.handmade or S.AUTO_HIDDEN.handmade or S.AUTO_BAN.handmade)


def test_select_status_identity():
    for s in S:
        assert select_status(s, s) is s


def test_select_status_restrictions():
    # BAN sticks against SIMPLE/AUTO_HIDDEN but yields to APPROVED/HIDDEN
    assert select_status(S.BAN, S.SIMPLE) is S.BAN
    assert select_status(S.BAN, S.AUTO_HIDDEN) is S.BAN
    assert select_status(S.BAN, S.APPROVED) is S.APPROVED
    assert select_status(S.BAN, S.HIDDEN) is S.HIDDEN
    # APPROVED resists automation
    assert select_status(S.APPROVED, S.SIMPLE) is S.APPROVED
    assert select_status(S.APPROVED, S.AUTO_HIDDEN) is S.APPROVED
    assert select_status(S.APPROVED, S.BAN) is S.BAN
    # HIDDEN only resists AUTO_HIDDEN
    assert select_status(S.HIDDEN, S.AUTO_HIDDEN) is S.HIDDEN
    assert select_status(S.HIDDEN, S.SIMPLE) is S.SIMPLE
    # SIMPLE/AUTO_HIDDEN are unrestricted
    assert select_status(S.SIMPLE, S.AUTO_HIDDEN) is S.AUTO_HIDDEN
    assert select_status(S.AUTO_HIDDEN, S.SIMPLE) is S.SIMPLE
