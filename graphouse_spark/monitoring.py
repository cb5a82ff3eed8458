"""Monitoring units + aggregate health results — the /ping and
/monitoring surface every load balancer and deployment probe hits.

Reference parity: ``monitoring/Monitoring.java`` aggregates named units
into one result — OK unless any unit is WARNING ("WARN {name: msg}")
or CRITICAL ("CRIT {name: msg}"); ``MonitoringServlet.java`` maps
OK/WARNING to HTTP 200 and CRITICAL to 503. Graphouse registers a
``MetricTreeInit`` unit on the PING monitoring that starts critical
("Initializing") and flips ok once the tree bootstrap finishes
(``MetricSearch.java:163-164,343``) — so a stock deployment's health
probe holds the daemon out of rotation until it can actually serve.
"""

from __future__ import annotations

import threading

OK = "OK"
WARNING = "WARNING"
CRITICAL = "CRITICAL"

_ORDER = {OK: 0, WARNING: 1, CRITICAL: 2}


class MonitoringUnit:
    """One named health check; mutable status + message."""

    def __init__(self, name: str) -> None:
        self.name = name
        self._lock = threading.Lock()
        self._status = OK
        self._message = ""

    def ok(self) -> None:
        with self._lock:
            self._status, self._message = OK, ""

    def warning(self, message: str) -> None:
        with self._lock:
            self._status, self._message = WARNING, message

    def critical(self, message: str) -> None:
        with self._lock:
            self._status, self._message = CRITICAL, message

    def snapshot(self) -> tuple[str, str]:
        with self._lock:
            return self._status, self._message


class Monitoring:
    """Aggregate of units -> (status, text) exactly like the reference:
    ``OK`` when every unit is ok, else ``CRIT {a: m1, b: m2} WARN
    {c: m3}`` (critical section first, each section only if non-empty).
    """

    def __init__(self) -> None:
        self._units: dict[str, MonitoringUnit] = {}
        self._lock = threading.Lock()

    def add_unit(self, unit: MonitoringUnit) -> MonitoringUnit:
        with self._lock:
            self._units[unit.name] = unit
        return unit

    def result(self) -> tuple[str, str]:
        crit, warn = [], []
        with self._lock:
            units = list(self._units.values())
        for u in units:
            status, msg = u.snapshot()
            if status == CRITICAL:
                crit.append(f"{u.name}: {msg}")
            elif status == WARNING:
                warn.append(f"{u.name}: {msg}")
        parts = []
        status = OK
        if crit:
            parts.append("CRIT {" + ", ".join(crit) + "}")
            status = CRITICAL
        if warn:
            parts.append("WARN {" + ", ".join(warn) + "}")
            if status == OK:
                status = WARNING
        return (status, " ".join(parts)) if parts else (OK, "OK")

    def http_response(self) -> tuple[int, str]:
        """(status_code, body): OK/WARNING -> 200, CRITICAL -> 503
        (MonitoringServlet.writeResponse)."""
        status, text = self.result()
        return (503 if status == CRITICAL else 200), text
