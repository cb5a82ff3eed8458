"""Driver-side metric-name tree index (the serving-layer cache).

Reimplements the reference's in-memory tree semantics
(search/tree/MetricTree.java, MetricDir.java, MetricBase.java) in
Python, for interactive glob search and write-path checks without a
Spark job per request. The DataFrame operators in
``operators/tree.py`` express the same search relationally for bulk
work; this index is the low-latency path and the state machine for
status propagation:

- status changes route through the transition lattice
  (MetricBase.setStatus -> MetricStatus.selectStatus);
- a dir auto-hides when its last visible child goes invisible and
  re-opens when any child turns visible again
  (MetricDir.notifyChildStatusChange:106-162);
- AUTO_HIDDEN children are evicted from the maps;
- BAN'd dirs block adds beneath them (MetricTree.modify:300-328);
- per-dir child limits reject non-handmade creates and surface
  ``_SUBDIRS_LIMIT_REACHED_MAX_N`` notification rows in ``*`` searches
  (MetricDir.getOrCreateDir:59-95, MetricTree.appendLimitNotifications).

The index is rebuildable from the ``metrics`` table (S8 bootstrap:
apply resolved rows in any order — convergence is what
randomOrderStatusOnLoadTest pins down) and emits its mutations as
rows to append back to the table.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

from graphouse_spark.globs import compile_level_glob, contains_expressions
from graphouse_spark.paths import get_last_level_name
from graphouse_spark.paths import is_dir as _is_dir
from graphouse_spark.paths import split_to_levels
from graphouse_spark.status import MetricStatus, select_status

ALL_PATTERN = "*"


class _Node:
    __slots__ = ("parent", "name", "_status", "update_time")

    def __init__(self, parent: "_Dir | None", name: str, status: MetricStatus) -> None:
        self.parent = parent
        self.name = name
        self._status = status
        self.update_time = time.time()

    # -- status machinery (MetricBase.java:60-75) --
    @property
    def status(self) -> MetricStatus:
        return self._status

    @property
    def visible(self) -> bool:
        return self._status.visible

    def is_dir(self) -> bool:
        return False

    def is_root(self) -> bool:
        return self.parent is None

    def set_status(self, new: MetricStatus, event: MetricStatus | None = None) -> None:
        event = event if event is not None else new
        resolved = select_status(self._status, new)
        if self._status is not resolved:
            old = self._status
            self._status = resolved
            self.update_time = time.time()
            if self.parent is not None:
                self.parent.notify_child_status_change(self, old, event)
        elif event.visible and self.parent is not None:
            self.parent.notify_child_status_change(self, self._status, event)

    @property
    def full_name(self) -> str:
        parts: list[str] = []
        node: _Node | None = self
        while node is not None and not node.is_root():
            parts.append(node.name)
            node = node.parent
        path = ".".join(reversed(parts))
        return path + "." if self.is_dir() else path


class _Metric(_Node):
    __slots__ = ()


class _Dir(_Node):
    __slots__ = ("dirs", "metrics", "visible_children")

    def __init__(self, parent: "_Dir | None", name: str, status: MetricStatus) -> None:
        super().__init__(parent, name, status)
        self.dirs: dict[str, _Dir] = {}
        self.metrics: dict[str, _Metric] = {}
        self.visible_children = 0

    def is_dir(self) -> bool:
        return True

    # -- creation with limits (MetricDir.java:59-95) --
    def get_or_create_dir(self, name: str, status: MetricStatus, max_subdirs: int) -> "_Dir | None":
        d = self.dirs.get(name)
        if d is not None:
            return d
        if 0 < max_subdirs <= len(self.dirs) and not status.handmade:
            return None
        d = _Dir(self, name, status)
        self.dirs[name] = d
        self.notify_child_status_change(d, None, d.status)
        return d

    def get_or_create_metric(self, name: str, status: MetricStatus, max_metrics: int) -> "_Metric | None":
        m = self.metrics.get(name)
        if m is not None:
            return m
        if 0 < max_metrics <= len(self.metrics) and not status.handmade:
            return None
        m = _Metric(self, name, status)
        self.metrics[name] = m
        self.notify_child_status_change(m, None, m.status)
        return m

    # -- auto-hide propagation (MetricDir.java:106-162) --
    def notify_child_status_change(self, child: _Node, old: MetricStatus | None,
                                   event: MetricStatus) -> None:
        if self.is_root():
            return
        new = child.status
        if new is MetricStatus.AUTO_HIDDEN:
            (self.dirs if child.is_dir() else self.metrics).pop(child.name, None)
        if old is not None and old.visible == new.visible:
            if event.visible:
                self._try_open_hidden(event)
            return
        if new.visible:
            self.set_status(MetricStatus.SIMPLE, event)
            self.visible_children += 1
        else:
            if self.visible_children <= 1:
                count = sum(
                    1 for n in (*self.dirs.values(), *self.metrics.values()) if n.visible
                )
            else:
                count = self.visible_children - 1
            self.set_status(MetricStatus.SIMPLE if count > 0 else MetricStatus.AUTO_HIDDEN, event)
            self.visible_children = count

    def _try_open_hidden(self, event: MetricStatus) -> None:
        cur = self._status
        if cur in (MetricStatus.BAN, MetricStatus.AUTO_BAN):
            return
        if cur in (MetricStatus.HIDDEN, MetricStatus.AUTO_HIDDEN):
            self.set_status(MetricStatus.SIMPLE, event)
        elif self.parent is not None:
            self.parent.notify_child_status_change(self, cur, event)


class MetricTree:
    """In-memory tree: add / modify / glob search / limit notifications."""

    def __init__(self, max_subdirs_per_dir: int = -1, max_metrics_per_dir: int = -1) -> None:
        self.root = _Dir(None, "", MetricStatus.SIMPLE)
        self.max_subdirs = max_subdirs_per_dir
        self.max_metrics = max_metrics_per_dir
        self._subdirs_msg = f"_SUBDIRS_LIMIT_REACHED_MAX_{max_subdirs_per_dir}"
        self._metrics_msg = f"_METRICS_LIMIT_REACHED_MAX_{max_metrics_per_dir}"

    # -- mutation (MetricTree.java:300-328) --
    def add(self, metric: str) -> _Node | None:
        return self.modify(metric, MetricStatus.SIMPLE)

    def modify(self, metric: str, status: MetricStatus) -> _Node | None:
        """Create or restatus a node; None if blocked by BAN or limits."""
        target_is_dir = _is_dir(metric)
        levels = split_to_levels(metric)
        d: _Dir | None = self.root
        for i, level in enumerate(levels):
            if d is None or d.status is MetricStatus.BAN:
                return None
            last = i == len(levels) - 1
            if not last:
                d = d.get_or_create_dir(level, status, self.max_subdirs)
            else:
                node: _Node | None
                if target_is_dir:
                    node = d.get_or_create_dir(level, status, self.max_subdirs)
                else:
                    node = d.get_or_create_metric(level, status, self.max_metrics)
                if node is not None:
                    node.set_status(select_status(node.status, status))
                return node
        raise AssertionError("unreachable")

    # -- search (MetricTree.java:48-120) --
    def search(self, query: str) -> list[str]:
        out: list[str] = []
        self._search(self.root, split_to_levels(query), 0, out)
        return out

    def _append(self, node: _Node, out: list[str], force: bool = False) -> None:
        if force or node.visible:
            out.append(node.full_name)

    def _limit_notifications(self, d: _Dir, out: list[str]) -> None:
        prefix = d.full_name if not d.is_root() else ""
        if 0 < self.max_subdirs <= len(d.dirs):
            out.append(prefix + self._subdirs_msg)
        if 0 < self.max_metrics <= len(d.metrics):
            out.append(prefix + self._metrics_msg)

    def _search(self, d: _Dir | None, levels: list[str], idx: int, out: list[str]) -> None:
        if d is None or (not d.is_root() and not d.visible):
            return
        last = idx == len(levels) - 1
        level = levels[idx]
        if not contains_expressions(level):
            if last:
                if level in d.dirs:
                    self._append(d.dirs[level], out)
                if level in d.metrics:
                    self._append(d.metrics[level], out)
            else:
                self._search(d.dirs.get(level), levels, idx + 1, out)
        elif level == ALL_PATTERN:
            if last:
                self._limit_notifications(d, out)
                for child in d.dirs.values():
                    self._append(child, out)
                for child in d.metrics.values():
                    self._append(child, out)
            else:
                for child in d.dirs.values():
                    self._search(child, levels, idx + 1, out)
        else:
            matcher = compile_level_glob(level)
            if matcher is None:
                return  # invalid glob -> empty result, not an error
            if last:
                for name, child in d.dirs.items():
                    if matcher.match(name):
                        self._append(child, out)
                for name, child in d.metrics.items():
                    if matcher.match(name):
                        self._append(child, out)
            else:
                for name, child in d.dirs.items():
                    if matcher.match(name):
                        self._search(child, levels, idx + 1, out)

    def search_cached(self, query: str) -> list[str]:
        """X2: same recursion but force-append (ignores visibility).

        Diagnostic surface (MetricTree.java:131-179) — shows what the
        index holds regardless of status.
        """
        out: list[str] = []
        self._search_cached(self.root, split_to_levels(query), 0, out)
        return out

    def _search_cached(self, d: _Dir | None, levels: list[str], idx: int, out: list[str]) -> None:
        if d is None:
            return
        last = idx == len(levels) - 1
        level = levels[idx]
        matcher = None if not contains_expressions(level) else compile_level_glob(level)
        if not contains_expressions(level):
            if last:
                if level in d.dirs:
                    self._append(d.dirs[level], out, force=True)
                if level in d.metrics:
                    self._append(d.metrics[level], out, force=True)
            else:
                self._search_cached(d.dirs.get(level), levels, idx + 1, out)
            return
        if matcher is None and level != ALL_PATTERN:
            return
        for name, child in d.dirs.items():
            if level == ALL_PATTERN or matcher.match(name):
                if last:
                    self._append(child, out, force=True)
                else:
                    self._search_cached(child, levels, idx + 1, out)
        if last:
            for name, child in d.metrics.items():
                if level == ALL_PATTERN or matcher.match(name):
                    self._append(child, out, force=True)

    # -- lookups (MetricTree.java:254-289) --
    def maybe_find_metric(self, metric: str) -> _Node | None:
        levels = split_to_levels(metric)
        d: _Dir | None = self.root
        for i, level in enumerate(levels):
            if i == len(levels) - 1:
                return d.metrics.get(level) if d else None
            d = d.dirs.get(level) if d else None
            if d is None or d.status is MetricStatus.BAN:
                return None
        return None

    def maybe_find_dir(self, path: str) -> _Dir | None:
        levels = split_to_levels(path)
        d: _Dir | None = self.root
        for i, level in enumerate(levels):
            if d is None:
                return None
            if i == len(levels) - 1:
                return d.dirs.get(level)
            d = d.dirs.get(level)
            if d is None or d.status is MetricStatus.BAN:
                return None
        return None

    # -- diagnostics (/checkOnRecordCache, /printBannedCacheState) --
    def trace_state(self, name: str) -> list[str]:
        """Per-level trace of ``name`` through the tree — the
        OnRecordMetricCacheServlet ``/checkOnRecordCache`` diagnostic
        (BannedMetricCache/OnRecordMetricTree.traceMetricStateInCache):
        one ``<full-path> <STATUS>`` line per existing level, stopping
        with ``<full-path> NOT_FOUND`` at the first absent one."""
        out: list[str] = []
        levels = split_to_levels(name)
        target_is_dir = _is_dir(name)
        d: _Dir | None = self.root
        full = ""
        for i, level in enumerate(levels):
            last = i == len(levels) - 1
            full += level + ("" if last and not target_is_dir else ".")
            ensure = getattr(self, "_ensure_loaded", None)
            if ensure is not None and d is not None:
                ensure(d)
            node: _Node | None
            if last and not target_is_dir:
                node = d.metrics.get(level) if d else None
            else:
                node = d.dirs.get(level) if d else None
            if node is None:
                out.append(f"{full} NOT_FOUND")
                return out
            out.append(f"{full} {node.status.name}")
            d = node if node.is_dir() else None
        return out

    def cache_state(self) -> str:
        """BannedMetricCache.printCacheState analog: node totals plus
        banned/auto-banned counts (the write-path ban state lives in
        the same tree here — there is no separate cache to drift)."""
        counts = {"nodes": 0, "ban": 0, "auto_ban": 0}

        def walk(d: _Dir) -> None:
            ensure = getattr(self, "_ensure_loaded", None)
            if ensure is not None:
                ensure(d)
            for node in list(d.dirs.values()) + list(d.metrics.values()):
                counts["nodes"] += 1
                if node.status is MetricStatus.BAN:
                    counts["ban"] += 1
                elif node.status is MetricStatus.AUTO_BAN:
                    counts["auto_ban"] += 1
                if node.is_dir():
                    walk(node)

        walk(self.root)
        return ("Total nodes = %d. Banned metrics count = %d. "
                "AutoBanned metrics count = %d"
                % (counts["nodes"], counts["ban"], counts["auto_ban"]))

    # -- bulk load / export (S8 bootstrap, S7 writeback) --
    def load_rows(self, rows: Iterable[tuple[str, str]]) -> None:
        """Apply (name, status) rows in any order (bootstrap from table)."""
        for name, status in rows:
            self.modify(name, MetricStatus(status))

    def export_rows(self) -> list[tuple[str, int, str, str]]:
        """(name, level, parent, status) for every loaded node."""
        out: list[tuple[str, int, str, str]] = []

        def walk(d: _Dir, depth: int) -> None:
            for child in d.dirs.values():
                full = child.full_name
                out.append((full, depth + 1, d.full_name if not d.is_root() else "", child.status.value))
                walk(child, depth + 1)
            for child in d.metrics.values():
                out.append((child.full_name, depth + 1, d.full_name if not d.is_root() else "", child.status.value))

        walk(self.root, 0)
        return out

    def metric_count(self) -> int:
        def count(d: _Dir) -> int:
            return len(d.metrics) + sum(count(c) for c in d.dirs.values())

        return count(self.root)


class LazyMetricTree(MetricTree):
    """CH-style lazy-load serving mode: directories materialize their
    children on FIRST touch through a loader callback.

    This is the mode that makes X6 request coalescing load-bearing
    (MetricSearch.java:193-200 wires its tree to DirContentBatcher the
    same way): pass ``DirContentBatcher(load_dirs_content...).load`` as
    the loader and concurrent cache misses for different dirs coalesce
    into one batched metrics-table scan instead of one Spark job each.

    ``loader(dir_full_name) -> [(child_full_name, status), ...]`` where
    ``dir_full_name`` is '' for the root and keeps the trailing dot
    otherwise (the ``parent`` column of the metrics table). Search,
    cached search, and mutation all force the path they walk; dirs
    never visited are never loaded — a glob of one subtree touches one
    subtree, exactly the reference's cold-cache behavior.
    """

    def __init__(self, loader, max_subdirs_per_dir: int = -1,
                 max_metrics_per_dir: int = -1) -> None:
        super().__init__(max_subdirs_per_dir, max_metrics_per_dir)
        self._loader = loader
        self._loaded: set[int] = set()  # id(_Dir) -> children materialized

    # -- lazy materialization --
    def _ensure_loaded(self, d: _Dir) -> None:
        if id(d) in self._loaded:
            return
        self._loaded.add(id(d))  # before inserting: inserts must not re-enter
        # the metrics table stores '' as the root's parent (export_rows
        # writes the same), while root.full_name renders as '.'
        dir_name = "" if d.is_root() else d.full_name
        for name, status in sorted(self._loader(dir_name)):
            st = MetricStatus(status)
            level = get_last_level_name(name)
            if _is_dir(name):
                child = d.get_or_create_dir(level, st, self.max_subdirs)
            else:
                child = d.get_or_create_metric(level, st, self.max_metrics)
            if child is not None:
                child.set_status(select_status(child.status, st))

    def _search(self, d: "_Dir | None", levels: list[str], idx: int, out: list[str]) -> None:
        if d is not None:
            self._ensure_loaded(d)
        super()._search(d, levels, idx, out)

    def _search_cached(self, d: "_Dir | None", levels: list[str], idx: int, out: list[str]) -> None:
        if d is not None:
            self._ensure_loaded(d)
        super()._search_cached(d, levels, idx, out)

    def modify(self, metric: str, status: MetricStatus) -> "_Node | None":
        # force the walked path first so BAN gates, limits and existing
        # children apply exactly as in the eager tree
        d: "_Dir | None" = self.root
        for level in split_to_levels(metric)[:-1]:
            if d is None:
                break
            self._ensure_loaded(d)
            d = d.dirs.get(level)
        if d is not None:
            self._ensure_loaded(d)
        return super().modify(metric, status)
