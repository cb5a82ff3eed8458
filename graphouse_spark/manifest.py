"""Manifest (generation + pointer) commits for rename-less stores.

The storage protocols in this repo need exactly two primitives: hidden
staging directories readers skip, and ONE atomic visibility flip per
commit. On rename-atomic filesystems (local, HDFS) the flip is a
directory rename — the protocols in ``operators/rollup.py`` and
``sources/tables.py`` as shipped since round 12. On object stores
(S3A, GCS) there is no atomic rename, so the flip must move from the
NAMESPACE to a MANIFEST: write data into a fresh dot-hidden
``.gen-<ts>-<token>`` directory, then atomically overwrite one small
pointer object naming it (:meth:`graphouse_spark.fs.Fs.write_text` —
a single PUT, which IS atomic there). Readers resolve the pointer and
list through it instead of trusting the directory namespace. This is
the commit design of Iceberg/Delta, and the training-shard export sink
(``sources/export.py``) proved the pattern in-repo in round 12; this
module generalizes it behind the :class:`~graphouse_spark.fs.Fs` seam
so the ROLLUP PARTITION COMMIT and the TAG-INDEX REWRITE serve
rename-less stores instead of refusing them (round-12 verdict #1).

Two manifest shapes, one pointer file ``_TABLE_MANIFEST.json`` at the
table root (hidden from Spark listings by the leading underscore, so
legacy readers of a never-manifested table are unaffected):

WHOLE-TABLE generation (tag index, its distinct-values sub-index):
    {"generation": ".gen-...", "previous": ".gen-..." | null,
     "pending_gc": [{"ts": <flip epoch>, "paths": [<rel>, ...]}]}
The table's entire contents live in ``root/<generation>``; ``previous``
is what the pointer targeted before the last flip (in-flight readers
may hold it — GC keeps it regardless of age, the export sink's rule);
``pending_gc`` records root-resident LEGACY files orphaned by the
first manifest commit, swept once older than the grace window.

PER-PARTITION generations (the date-partitioned data table):
    {"partitions": {"<date>": {"generation": ".gen-...",
                               "replaced": [<rel path>, ...]}},
     "pending_gc": [...]}
A partition's committed rows live in ``root/<gen>/date=<date>``;
``replaced`` lists the ROOT-RESIDENT files (legacy layout + appends
since the previous compaction) whose content that generation absorbed
— readers serve root files NOT in any replaced list (so a streaming
append to an already-compacted date is visible immediately and rolled
up by the next compaction), plus each committed partition's generation
directory. Partitions absent from the map read from the root alone.

Crash posture (why no recover state machine exists here): the ONLY
mutation readers can observe is the single pointer overwrite, which is
atomic. A crash anywhere before it leaves an unreferenced young
generation that ages out of the grace window and is swept by the next
commit/GC; a crash anywhere after it leaves dead-but-listed files that
``replaced``/``pending_gc`` already exclude from reads and the next
sweep deletes. Query results are byte-identical across a crash at
every step — asserted by the crash-injection suites with the test
scheme forced onto this path (``tests/test_manifest_commit.py``).

Multi-writer: pointer overwrites are last-writer-wins; concurrent
COMMITTERS to one table must be serialized by the writer lease
(:func:`graphouse_spark.fs.acquire_lease`). Readers need no
coordination at any point.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from graphouse_spark import fs as fs_mod
from graphouse_spark.fs import Fs

TABLE_MANIFEST = "_TABLE_MANIFEST.json"

#: seconds a superseded/orphaned generation or dead file must age
#: before GC may take it (protects in-flight readers and a slower
#: concurrent writer's still-uncommitted generation) — same window as
#: the export sink's.
GC_GRACE_SECONDS = 3600


def scheme_of(path: str) -> str:
    """URI scheme by string inspection — ZERO py4j cost, so the hot
    read path can rule manifest resolution out without touching the
    JVM on local/HDFS tables."""
    if "://" not in path:
        return "file"
    return path.split("://", 1)[0] or "file"


def manifest_possible(path: str) -> bool:
    """Whether ``path``'s scheme is one where commits go through a
    manifest (rename-less stores). Reads ``RENAME_ATOMIC_SCHEMES``
    dynamically so the crash suites can force a local table onto the
    manifest path by shrinking the set."""
    return scheme_of(path) not in fs_mod.RENAME_ATOMIC_SCHEMES


def manifest_mode(fs: Fs) -> bool:
    """Same rule, from a live Fs (authoritative scheme)."""
    return fs.scheme not in fs_mod.RENAME_ATOMIC_SCHEMES


def new_gen_name(now: int) -> str:
    """Fresh dot-hidden generation directory name; the embedded
    timestamp drives the GC grace window, the uuid suffix
    disambiguates same-second writers."""
    return f".gen-{int(now):012d}-{uuid.uuid4().hex[:8]}"


def gen_age_seconds(name: str, now: int) -> int | None:
    """Age of a generation dir by its name timestamp; None when the
    name does not parse (foreign dir — GC must leave it alone rather
    than treat it as infinitely old)."""
    try:
        return int(now) - int(name.split("-")[1])
    except (ValueError, IndexError):
        return None


def manifest_path(root: str) -> str:
    return root.rstrip("/") + "/" + TABLE_MANIFEST


def read_table_manifest(fs: Fs, root: str) -> dict | None:
    """The table's manifest, or None when the table has never been
    manifest-committed (legacy namespace layout). A pointer that
    EXISTS but cannot be read or parsed raises: falling back to the
    legacy layout could serve replaced files or miss committed
    generations — refusing is the only answer-preserving posture."""
    p = manifest_path(root)
    if not fs.exists(p):
        return None
    try:
        return json.loads(fs.read_text(p))
    except Exception as exc:
        raise RuntimeError(
            f"unreadable table manifest {p}: {exc!r}; refusing to fall "
            "back to the namespace layout (could serve replaced files)"
        ) from exc


def write_table_manifest(fs: Fs, root: str, man: dict) -> None:
    fs.write_text(manifest_path(root), json.dumps(man, sort_keys=True))


def rel_path(fs: Fs, root: str, p: str) -> str:
    rn = fs.norm(root).rstrip("/")
    pn = fs.norm(p)
    return pn[len(rn):].lstrip("/") if pn.startswith(rn) else pn


# ---------------------------------------------------------------------------
# whole-table generations (tag index + values sub-index)
# ---------------------------------------------------------------------------

def resolve_table_dir(fs: Fs, root: str) -> str:
    """Where the table's live rows are: the committed generation when
    a manifest exists, the root itself otherwise (legacy layout, and
    every rename-atomic deployment)."""
    man = read_table_manifest(fs, root)
    if man is None or not man.get("generation"):
        return root
    return f"{root.rstrip('/')}/{man['generation']}"


def tombstone_table(fs: Fs, root: str, now: int) -> dict:
    """Atomically mark a whole-table generation ABSENT — the
    manifest-mode spelling of "delete the sub-index before rebuilding"
    (backfill's crashed-window contract: readers must fall back to the
    slow-correct path, never read a stale or partial sub-index).

    Deleting the POINTER instead would be wrong twice over: the
    pending_gc record would be lost, and dead-but-unswept legacy files
    at the root would make the table look like a live legacy layout to
    the absent-detection. The tombstone keeps ``previous`` pointing at
    the superseded generation so in-flight readers' files survive the
    grace window, and on a never-manifested table records the visible
    legacy files as dead."""
    root = root.rstrip("/")
    prev = read_table_manifest(fs, root)
    man: dict = {"generation": None,
                 "previous": (prev or {}).get("generation"),
                 "pending_gc": list((prev or {}).get("pending_gc", []))}
    if prev is None:
        legacy = [rel_path(fs, root, p) for p, _ in fs.list_files(root)]
        if legacy:
            man["pending_gc"].append({"ts": int(now), "paths": legacy})
    write_table_manifest(fs, root, man)
    return man


def commit_table_generation(fs: Fs, root: str, gen: str, now: int,
                            grace: int = GC_GRACE_SECONDS) -> dict:
    """Flip the whole-table pointer to ``gen`` (one atomic write),
    then GC: superseded generations other than {new, previous} once
    aged past ``grace``; root-resident legacy files recorded dead at
    the FIRST manifest commit, likewise once aged."""
    root = root.rstrip("/")
    prev = read_table_manifest(fs, root)
    man: dict = {"generation": gen,
                 "previous": (prev or {}).get("generation"),
                 "pending_gc": list((prev or {}).get("pending_gc", []))}
    if prev is None:
        # first manifest commit over a legacy namespace table: every
        # non-hidden root file is now dead (the generation was built
        # from them) — record for the aged sweep, readers already
        # ignore them (resolution goes through the generation)
        legacy = [rel_path(fs, root, p) for p, _ in fs.list_files(root)]
        if legacy:
            man["pending_gc"].append({"ts": int(now), "paths": legacy})
    write_table_manifest(fs, root, man)
    return gc_table_manifest(fs, root, man, now, grace)


def gc_table_manifest(fs: Fs, root: str, man: dict, now: int,
                      grace: int = GC_GRACE_SECONDS) -> dict:
    """Sweep a whole-table manifest's garbage: aged pending_gc files
    and aged generation dirs not in {current, previous}. Idempotent;
    rewrites the manifest when anything was swept."""
    root = root.rstrip("/")
    keep = {man.get("generation"), man.get("previous")}
    swept = False
    for d in fs.listdir(root):
        if not d.startswith(".gen-") or d in keep:
            continue
        age = gen_age_seconds(d, now)
        if age is not None and age >= grace:
            fs.delete(f"{root}/{d}")
    remaining, swept_rels = [], set()
    for entry in man.get("pending_gc", []):
        if int(now) - int(entry.get("ts", now)) >= grace:
            for rel in entry.get("paths", []):
                fs.delete(f"{root}/{rel}")
                swept_rels.add(rel)
            swept = True
        else:
            remaining.append(entry)
    _drop_emptied_dirs(fs, root, swept_rels)
    if swept:
        man = dict(man, pending_gc=remaining)
        write_table_manifest(fs, root, man)
    return man


def _drop_emptied_dirs(fs: Fs, root: str, swept_rels: set[str]) -> None:
    """Remove directories a sweep fully emptied (a dead legacy
    ``date=`` dir with every file swept would otherwise linger as an
    empty husk in namespace listings). Only data files remaining count
    as occupancy — a lone checksum sidecar doesn't keep a dir alive."""
    parents = {rel.rsplit("/", 1)[0] for rel in swept_rels if "/" in rel}
    for rel in sorted(parents, key=len, reverse=True):
        p = f"{root}/{rel}"
        names = fs.listdir(p)
        if not any(not n.startswith(".") for n in names):
            fs.delete(p)


# ---------------------------------------------------------------------------
# per-partition generations (the data table)
# ---------------------------------------------------------------------------

def live_root_files(fs: Fs, root: str, man: dict | None) -> list[str]:
    """Non-hidden root-resident files minus everything any partition's
    generation replaced (dead-but-not-yet-swept)."""
    dead: set[str] = set()
    if man:
        for ent in man.get("partitions", {}).values():
            dead.update(ent.get("replaced", []))
        for ent in man.get("pending_gc", []):
            dead.update(ent.get("paths", []))
    return [p for p, _ in fs.list_files(root)
            if rel_path(fs, root, p) not in dead]


def resolve_data_sources(fs: Fs, root: str,
                         man: dict | None) -> list[tuple[str, list[str]]]:
    """The data table as ``(basePath, [files...])`` scan groups.

    One group for the live root files (legacy partitions + appends
    newer than their partition's last compaction), one per referenced
    generation (all its committed partition dirs together). Each group
    carries its own basePath so Spark recovers the ``date`` partition
    column; groups can't share one basePath — a dot-hidden generation
    segment between root and ``date=`` trips partition discovery's
    conflicting-structures check."""
    root = root.rstrip("/")
    groups: list[tuple[str, list[str]]] = []
    live = live_root_files(fs, root, man)
    if live:
        groups.append((root, live))
    by_gen: dict[str, list[str]] = {}
    for date, ent in (man or {}).get("partitions", {}).items():
        by_gen.setdefault(ent["generation"], []).append(date)
    for gen, dates in sorted(by_gen.items()):
        gdir = f"{root}/{gen}"
        paths = [f"{gdir}/date={d}" for d in sorted(dates)
                 if fs.exists(f"{gdir}/date={d}")]
        if paths:
            groups.append((gdir, paths))
    return groups


def read_with_manifest(spark: SparkSession, schema, root: str,
                       fs: Fs | None = None) -> DataFrame | None:
    """Manifest-resolved read of a per-partition table; None when the
    table has no manifest (caller does the plain namespace read)."""
    fs = fs or fs_mod.get_fs(root, spark)
    man = read_table_manifest(fs, root)
    if man is None:
        return None
    groups = resolve_data_sources(fs, root, man)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    frames = []
    for base, paths in groups:
        r = spark.read.schema(schema) if schema is not None else spark.read
        frames.append(r.option("basePath", base).parquet(*paths))
    if not frames:
        return (spark.createDataFrame([], schema) if schema is not None
                else reader.parquet(root).limit(0))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def data_files_with_manifest(fs: Fs, root: str) -> list[str] | None:
    """Every live data file of a per-partition table (zonemap/bloom
    builders); None when no manifest governs the table."""
    man = read_table_manifest(fs, root)
    if man is None:
        return None
    out = list(live_root_files(fs, root, man))
    for base, paths in resolve_data_sources(fs, root, man):
        if base == root.rstrip("/"):
            continue
        for p in paths:
            out.extend(f for f, _ in fs.list_files(p))
    return sorted(out)


def commit_data_generation(fs: Fs, root: str, gen: str,
                           replaced_by_date: dict[str, list[str]],
                           now: int,
                           grace: int = GC_GRACE_SECONDS) -> dict:
    """Point each date in ``replaced_by_date`` at ``gen`` with ONE
    atomic manifest write, then GC.

    ``replaced_by_date[date]`` must be the root-resident files (paths
    relative to ``root``) whose content the generation's ``date=``
    directory absorbed — i.e. the compaction's READ SNAPSHOT, not a
    commit-time listing: a file appended between snapshot and commit
    was not rolled up, so it must STAY LIVE (its rows read alongside
    the rolled rows; the read path's dedup/bucket aggregation is
    rollup-invariant by design, and the next compaction absorbs it).
    """
    root = root.rstrip("/")
    man = read_table_manifest(fs, root) or {}
    parts = dict(man.get("partitions", {}))
    pending = list(man.get("pending_gc", []))
    newly_dead: list[str] = []
    for date, replaced in replaced_by_date.items():
        old = parts.get(date)
        merged = set(replaced)
        if old:
            # files the PREVIOUS generation replaced that are still on
            # disk stay excluded until their sweep finishes
            merged.update(old.get("replaced", []))
        parts[date] = {"generation": gen, "replaced": sorted(merged)}
        newly_dead.extend(replaced)
    if newly_dead:
        pending.append({"ts": int(now), "paths": sorted(set(newly_dead))})
    man = {"partitions": parts, "pending_gc": pending}
    write_table_manifest(fs, root, man)
    return gc_data_manifest(fs, root, man, now, grace)


def gc_data_manifest(fs: Fs, root: str, man: dict, now: int,
                     grace: int = GC_GRACE_SECONDS) -> dict:
    """Sweep a per-partition manifest's garbage once aged past the
    grace window: dead root files (pending_gc), generation dirs no
    partition references, and swept files' ``replaced`` entries.
    Idempotent — a crash mid-sweep re-runs to the same end state; the
    manifest is rewritten only when something changed."""
    root = root.rstrip("/")
    referenced = {ent["generation"]
                  for ent in man.get("partitions", {}).values()}
    for d in fs.listdir(root):
        if not d.startswith(".gen-") or d in referenced:
            continue
        age = gen_age_seconds(d, now)
        if age is not None and age >= grace:
            fs.delete(f"{root}/{d}")
    remaining, swept_paths = [], set()
    for entry in man.get("pending_gc", []):
        if int(now) - int(entry.get("ts", now)) >= grace:
            for rel in entry.get("paths", []):
                fs.delete(f"{root}/{rel}")
                swept_paths.add(rel)
        else:
            remaining.append(entry)
    _drop_emptied_dirs(fs, root, swept_paths)
    if not swept_paths:
        return man
    parts = {
        date: {"generation": ent["generation"],
               "replaced": [r for r in ent.get("replaced", [])
                            if r not in swept_paths]}
        for date, ent in man.get("partitions", {}).items()
    }
    man = {"partitions": parts, "pending_gc": remaining}
    write_table_manifest(fs, root, man)
    return man
