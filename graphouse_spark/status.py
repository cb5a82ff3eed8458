"""Metric visibility status lattice.

Parity: /root/reference/src/main/java/ru/yandex/market/graphouse/search/MetricStatus.java:13-103.

Statuses are stored as strings in the ``metrics`` table (Spark has no
enum type); ``AUTO_BAN`` is in-memory only and never persisted.
"""

from __future__ import annotations

from enum import Enum


class MetricStatus(str, Enum):
    SIMPLE = "SIMPLE"
    BAN = "BAN"
    APPROVED = "APPROVED"
    HIDDEN = "HIDDEN"
    AUTO_HIDDEN = "AUTO_HIDDEN"
    AUTO_BAN = "AUTO_BAN"  # internal, never stored

    @property
    def visible(self) -> bool:
        """Invisible metrics (and whole dirs) vanish from search."""
        return self in (MetricStatus.SIMPLE, MetricStatus.APPROVED)

    @property
    def handmade(self) -> bool:
        """Statuses set by an operator, which automation must not undo."""
        return self in (MetricStatus.APPROVED, MetricStatus.BAN, MetricStatus.HIDDEN)


#: transitions that are silently refused (old -> [denied new states])
RESTRICTED_EDGES: dict[MetricStatus, tuple[MetricStatus, ...]] = {
    MetricStatus.BAN: (MetricStatus.SIMPLE, MetricStatus.AUTO_HIDDEN),
    MetricStatus.AUTO_BAN: (MetricStatus.SIMPLE, MetricStatus.AUTO_HIDDEN),
    MetricStatus.HIDDEN: (MetricStatus.AUTO_HIDDEN,),
    MetricStatus.APPROVED: (MetricStatus.SIMPLE, MetricStatus.AUTO_HIDDEN),
}

#: persistable status values, in enum-code order
STORED_STATUSES = ("SIMPLE", "BAN", "APPROVED", "HIDDEN", "AUTO_HIDDEN")
VISIBLE_STATUSES = ("SIMPLE", "APPROVED")


def select_status(old: MetricStatus, new: MetricStatus) -> MetricStatus:
    """Resolve a requested status change against the transition graph."""
    if old == new:
        return old
    restricted = RESTRICTED_EDGES.get(old)
    if restricted is not None and new in restricted:
        return old
    return new
