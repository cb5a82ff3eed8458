"""Hadoop-FileSystem-backed commit primitives for the durable tables.

Every stage/swap/cleanup step of the storage engine (rollup partition
commit in ``operators/rollup.py``, tag-index rewrite in
``sources/tables.py``, delete/update mutations in
``operators/mutate.py``, zonemap/bloom + metrics maintenance in
``maintenance.py``, whisper migration staging in ``__main__.py``)
routes through the Hadoop FileSystem OF THE TABLE PATH, not through
``os``/``shutil`` — so the same code drives:

- local disk (``file://`` / scheme-less, the test default):
  ``RawLocalFileSystem.rename`` is rename(2) — atomic;
- HDFS: rename is a single NameNode metadata op — atomic;
- rename-less object stores (S3A, GCS): EVERY protocol switches to
  the generation + pointer-commit protocol (:mod:`graphouse_spark.
  manifest` — the design note below, made executable in r13): rollup
  partition commit, delete/update mutations, tag-index rewrite/
  backfill, metrics-tree compaction, export sink. :meth:`Fs.rename`
  itself still refuses there — reaching it on such a store means a
  protocol took the wrong branch.

The reference delegates all of this to ClickHouse's part-commit
machinery (MergeTree parts become visible via one in-memory + one
filesystem rename); this module is the lake-native equivalent of that
seam, kept deliberately tiny: qualified-path helpers plus the five
verbs the protocols actually use (exists / rename / delete / mkdirs /
list), and one generic three-state swap-recovery helper.

DESIGN NOTE — rename-less stores (the 100 TB S3 story). S3 has no
atomic directory rename: "rename" is a client-side copy+delete,
O(data) and non-atomic, so a namespace-flip commit protocol cannot be
made safe there no matter how it is staged. The protocols in this
repo only ever need (a) hidden staging dirs that readers skip and
(b) ONE visibility flip per commit — which means on an object store
the flip must move from the NAMESPACE to a MANIFEST: write the new
file list as ``_manifest.<token>.json`` (PUT of a single object is
atomic on S3), then atomically overwrite a single ``_current``
pointer object naming it; readers resolve ``_current`` and list
through the manifest instead of the directory. That is precisely the
commit design of Iceberg/Delta — and since r13 it is IMPLEMENTED for
every storage protocol (:mod:`graphouse_spark.manifest`: rollup
partition commit, delete/update mutations, tag-index rewrite/backfill
+ both sub-indexes, metrics-tree compaction, training-shard export).
A deployment can still choose Iceberg/Delta instead (the partition
protocol maps onto ``replaceWhere``, mutations onto ``DELETE/UPDATE
WHERE``, the tag rewrite onto ``overwritePartitions``); the in-repo
manifest layer removes the dependency. :meth:`Fs.rename` itself keeps
raising ``NotImplementedError`` on filesystems whose rename is not
known-atomic unless ``GRAPHOUSE_ALLOW_NONATOMIC_RENAME`` is set —
reaching a namespace rename on such a store now means a protocol took
the wrong branch, and failing loudly beats corrupting silently.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: schemes whose FileSystem.rename is atomic (namespace metadata op).
#: Everything else (s3a, gs, wasb, oss, ...) emulates rename by
#: copy+delete and MUST go through a manifest commit instead.
RENAME_ATOMIC_SCHEMES = {"file", "hdfs", "viewfs", "webhdfs", "hftp", "ofs"}


class Fs:
    """Thin wrapper over one ``org.apache.hadoop.fs.FileSystem``.

    String-path API in, string-path API out. Listings return paths in
    the SAME style as the root the instance was built from: a
    scheme-less local root yields plain ``/...`` paths (so existing
    ``os.path``-style joins and relpaths keep working in tests), a
    qualified root (``hdfs://...``, ``file:///...``) yields fully
    qualified URIs.
    """

    def __init__(self, spark: SparkSession, sample_path: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gw = spark.sparkContext._gateway
        self._hconf = spark._jsc.hadoopConfiguration()
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._strip_scheme = "://" not in sample_path
        jp = self._jpath(sample_path)
        self._fs = jp.getFileSystem(self._hconf)
        self.scheme = self._fs.getUri().getScheme() or "file"

    # -- path plumbing ---------------------------------------------------

    def _jpath(self, p: str):
        if "://" not in p and not os.path.isabs(p):
            # pin scheme-less relative paths to the process cwd (what
            # the os.* code they replace did), not Hadoop's notion of
            # a working directory
            p = os.path.abspath(p)
        return self._Path(p)

    def _out(self, jpath) -> str:
        uri = jpath.toUri()
        if self._strip_scheme and (uri.getScheme() or "file") == "file":
            return uri.getPath()
        return str(uri)

    def norm(self, p: str) -> str:
        """``p`` in this instance's listing style (see class docstring)
        — use for prefix arithmetic against :meth:`list_files` output."""
        return self._out(self._fs.makeQualified(self._jpath(p)))

    # -- the five verbs the commit protocols use --------------------------

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._jpath(p)))

    def is_dir(self, p: str) -> bool:
        jp = self._jpath(p)
        return bool(self._fs.exists(jp)
                    and self._fs.getFileStatus(jp).isDirectory())

    def rename(self, src: str, dst: str) -> None:
        """ATOMIC namespace move; raises (never returns false) so a
        failed commit step surfaces instead of half-applying.

        Hadoop ``rename(src, dst)`` moves src INTO dst when dst is an
        existing directory (mv semantics, unlike ``os.rename``) — the
        protocols here always rename onto a non-existent target, so
        an existing destination is rejected up front."""
        if self.scheme not in RENAME_ATOMIC_SCHEMES and not os.environ.get(
                "GRAPHOUSE_ALLOW_NONATOMIC_RENAME"):
            raise NotImplementedError(
                f"FileSystem scheme '{self.scheme}' has no atomic rename. "
                "Every storage protocol serves such stores through the "
                "manifest commit (graphouse_spark/manifest.py) — reaching "
                "a namespace rename here means a caller took the "
                "rename-protocol branch on a rename-less store. Set "
                "GRAPHOUSE_ALLOW_NONATOMIC_RENAME only for single-writer "
                "dev runs where a copy-rename is tolerable")
        jsrc, jdst = self._jpath(src), self._jpath(dst)
        if self._fs.exists(jdst):
            raise FileExistsError(f"rename target exists: {dst}")
        if not self._fs.rename(jsrc, jdst):
            raise OSError(f"rename failed: {src} -> {dst} "
                          f"(src exists={self._fs.exists(jsrc)})")

    def delete(self, p: str, ignore_errors: bool = True) -> bool:
        """Recursive delete; missing path is not an error."""
        try:
            jp = self._jpath(p)
            if not self._fs.exists(jp):
                return False
            return bool(self._fs.delete(jp, True))
        except Exception:
            if ignore_errors:
                return False
            raise

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._jpath(p))

    # -- listings ----------------------------------------------------------

    def listdir(self, p: str) -> list[str]:
        """Child NAMES of a directory (empty when absent)."""
        jp = self._jpath(p)
        if not self._fs.exists(jp):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(jp)]

    def list_files(self, root: str, suffix: str = ".parquet",
                   hidden: bool = False) -> list[tuple[str, int]]:
        """Recursive (path, size) of regular files under ``root``
        matching ``suffix``. Unless ``hidden``, skips dot/underscore-
        hidden names AND files under hidden directories — the same
        visibility rule Spark's file listing applies, so a staged
        ``.date=*.new`` partition never leaks into a zonemap or size
        audit (an os.walk-based listing descended into them). One
        RemoteIterator — a single round of RPCs even on a million-file
        table, where a per-dir walk issues one listing per directory.

        Robust to paths VANISHING mid-walk: a concurrent Spark commit
        creates and deletes ``_temporary`` scratch under the live dir
        (``rewrite_tags_atomic``'s snapshot listing deliberately runs
        outside the append lock), and the recursive RemoteIterator
        descends into hidden dirs at the Java level — when an entry it
        is about to stat disappears, ``hasNext`` throws (local FS: a
        RuntimeException from the permission ``ls``; HDFS:
        FileNotFoundException). Committed VISIBLE files are never
        deleted concurrently (every swap/delete protocol holds the
        rewrite serial mutex or the writer lease), so re-listing from
        scratch converges; only transient hidden scratch can vanish.
        Reproduced deterministically with a lister thread racing
        ``write_tags`` appends (r13; previously a rare in-suite flake
        in test_write_tags_appends_serialize_with_rewrite)."""
        from py4j.protocol import Py4JJavaError

        jroot = self._jpath(root)
        root_uri = None
        last_err = None
        for _attempt in range(5):
            if not self._fs.exists(jroot):
                return []
            if root_uri is None:
                root_uri = self._out(self._fs.makeQualified(jroot)).rstrip("/")
            out = []
            try:
                it = self._fs.listFiles(jroot, True)
                while it.hasNext():
                    st = it.next()
                    p = self._out(st.getPath())
                    if not p.endswith(suffix):
                        continue
                    if not hidden:
                        rel = p[len(root_uri):] if p.startswith(root_uri) else p
                        if any(seg and seg[0] in "._" for seg in rel.split("/")):
                            continue
                    out.append((p, int(st.getLen())))
                return sorted(out)
            except Py4JJavaError as e:
                msg = str(e)
                if ("FileNotFoundException" in msg
                        or "No such file or directory" in msg
                        or "File does not exist" in msg):
                    last_err = e
                    continue
                raise
        raise last_err

    def copy_file(self, src: str, dst: str) -> None:
        """Copy one file (used for carrying concurrent appends into a
        staged rewrite); parent dirs are created."""
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        jdst = self._jpath(dst)
        self._fs.mkdirs(jdst.getParent())
        if not FileUtil.copy(self._fs, self._jpath(src), self._fs, jdst,
                             False, True, self._hconf):
            raise OSError(f"copy failed: {src} -> {dst}")

    def size(self, p: str) -> int:
        return int(self._fs.getFileStatus(self._jpath(p)).getLen())

    # -- small-file text IO (manifest commits) ----------------------------

    def write_text(self, p: str, text: str) -> None:
        """Commit a small text file — THE single-object pointer-commit
        primitive of the manifest design note. On rename-capable
        filesystems: write a sibling ``.tmp`` then rename over
        (delete+rename; a crash in the gap leaves the file ABSENT,
        which every reader treats as 'uncommitted' — never
        half-written). On object stores: one direct ``create`` — the
        upload materializes atomically on close (an S3 PUT), which is
        exactly why manifest commits work where directory renames
        don't."""
        data = bytearray(text.encode("utf-8"))
        if self.scheme not in RENAME_ATOMIC_SCHEMES:
            out = self._fs.create(self._jpath(p), True)
            try:
                out.write(data)
            finally:
                out.close()
            return
        tmp = p + ".tmp"
        out = self._fs.create(self._jpath(tmp), True)
        try:
            out.write(data)
        finally:
            out.close()
        jdst = self._jpath(p)
        try:
            # FileContext rename(OVERWRITE) is the os.replace twin:
            # one atomic metadata op, the destination NEVER observably
            # absent — a reader racing the flip sees old or new
            # content, nothing else. The flags must be a REAL Java
            # Rename[] (py4j converts a Python list to ArrayList,
            # which silently misses the varargs overload).
            Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
            flags = self._gw.new_array(Rename, 1)
            flags[0] = Rename.OVERWRITE
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._fs.getUri(), self._hconf)
            fc.rename(self._fs.makeQualified(self._jpath(tmp)),
                      self._fs.makeQualified(jdst), flags)
        except Exception:
            # FileContext has no impl for some FS flavors: fall back
            # to delete+rename — the gap demotes the pointer to the
            # readers-treat-as-uncommitted state, never half-written
            if self._fs.exists(jdst):
                self._fs.delete(jdst, False)
            if not self._fs.rename(self._jpath(tmp), jdst):
                raise OSError(f"manifest rename failed: {tmp} -> {p}")

    def create_exclusive(self, p: str, text: str) -> bool:
        """Create-if-absent with content; False when the path already
        exists (or another creator won the race).

        Atomicity is per-filesystem: LOCAL uses ``O_CREAT|O_EXCL``
        directly — ``RawLocalFileSystem.create(overwrite=false)`` is
        check-then-create, and two racers both "win" it, the second
        TRUNCATING the first (measured: a 4-thread hammer ghosts the
        lease file that way); HDFS ``create(overwrite=false)`` is one
        atomic NameNode op; object stores are HEAD+PUT — callers must
        confirm by reading back (see :func:`acquire_writer_lease`)."""
        if self.scheme == "file":
            local = p[len("file://"):] if p.startswith("file://") else p
            if "://" not in p and not os.path.isabs(local):
                local = os.path.abspath(local)
            try:
                fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                             0o644)
            except FileExistsError:
                return False
            try:
                os.write(fd, text.encode("utf-8"))
                os.fsync(fd)
            finally:
                os.close(fd)
            return True
        try:
            out = self._fs.create(self._jpath(p), False)
        except Exception:
            return False
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True

    def mtime(self, p: str) -> int:
        """Modification time (epoch seconds)."""
        return int(self._fs.getFileStatus(self._jpath(p))
                   .getModificationTime() // 1000)

    def touch_existing(self, p: str) -> bool:
        """Refresh an existing file's mtime IN PLACE — the file is
        never observably absent (unlike a write_text replace, whose
        delete+rename window readers can land in; ChecksumFs-backed
        local renames have that window even through FileContext).
        Lease RENEWAL depends on this property: absence means
        "acquirable" to a contending create_exclusive. False when the
        path is missing or the store cannot set times (callers decide
        the fallback)."""
        if self.scheme == "file":
            local = p[len("file://"):] if p.startswith("file://") else p
            if "://" not in p and not os.path.isabs(local):
                local = os.path.abspath(local)
            try:
                os.utime(local, None)
                return True
            except OSError:
                return False
        try:
            import time as _time

            now_ms = int(_time.time() * 1000)
            self._fs.setTimes(self._jpath(p), now_ms, now_ms)
            return True
        except Exception:
            return False

    def read_text(self, p: str) -> str:
        # bytes must come back as a RETURN VALUE: py4j passes byte[]
        # by value, so readFully(buf) would fill a JVM-side copy and
        # leave the Python buffer zeroed
        inp = self._fs.open(self._jpath(p))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(inp)
            return bytes(data).decode("utf-8")
        finally:
            inp.close()


def abspath(p: str) -> str:
    """Scheme-less relative paths pinned to the process cwd; qualified
    URIs pass through (their FS resolves them)."""
    return p if "://" in p else os.path.abspath(p)


def parent_dir(p: str) -> str:
    p = abspath(p).rstrip("/")
    head = p.rsplit("/", 1)[0]
    return head or "/"


def base_name(p: str) -> str:
    return abspath(p).rstrip("/").rsplit("/", 1)[1]


def get_fs(path: str, spark: SparkSession | None = None) -> Fs:
    """The :class:`Fs` for ``path``, resolved through the active
    session's Hadoop configuration (so ``fs.defaultFS`` and per-bucket
    credentials apply)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession; commit-protocol "
                           "filesystem ops need the session's Hadoop conf")
    return Fs(spark, path)


def lease_path(root: str) -> str:
    """The table's lease file: a dot-hidden SIBLING of the table root
    (never inside it — the tag-index rename protocol swaps the root
    directory itself, which would carry an in-root lease away mid-
    protocol and let a second writer acquire)."""
    root = abspath(root).rstrip("/")
    return f"{parent_dir(root)}/.{base_name(root)}.lease"

#: default lease TTL. Must exceed the longest uninterrupted Spark
#: stage of any protocol run (renewals only happen between stages);
#: generous because takeover exists only for CRASHED writers, not slow
#: ones.
LEASE_TTL_SECONDS = 4 * 3600


class LeaseHeld(RuntimeError):
    """Another writer holds the table's lease (and it is not stale)."""


class WriterLease:
    """Handle for a held single-writer lease; see
    :func:`acquire_writer_lease`."""

    def __init__(self, fs: Fs, path: str, owner: str):
        self._fs = fs
        self.path = path
        self.owner = owner

    def renew(self) -> None:
        """Refresh the lease mtime (call between protocol milestones
        so a long run never looks crashed). Raises LeaseHeld if the
        lease was meanwhile taken over.

        The refresh is an IN-PLACE mtime bump, never a file replace:
        renewing via ``write_text`` (tmp + rename-over) made the lease
        file observably ABSENT for a moment on ChecksumFs-backed local
        filesystems (delete+rename inside the overwrite-rename), and a
        contending ``create_exclusive`` landing in that window
        acquired a second live lease — the rename then silently
        clobbered the contender's token, so BOTH writers proceeded
        (reproduced: a renew loop against two retrying acquirers
        breaches on the first renewal; this was the root cause of the
        interleaved-compaction/mutation test's "load flake")."""
        if self._fs.exists(self.path):
            if self._fs.read_text(self.path).strip() != self.owner:
                raise LeaseHeld(f"lease {self.path} taken over mid-run")
            if self._fs.touch_existing(self.path):
                return
            # store cannot set times (some object stores): fall back
            # to the replace. On those stores acquisition is already
            # HEAD+PUT (documented race) — this is no wider.
            self._fs.write_text(self.path, self.owner)
            return
        # lease file vanished (external cleanup): re-create atomically
        # rather than overwrite-write, so a concurrent acquirer either
        # beats us (we raise) or loses cleanly (it keeps retrying)
        if not self._fs.create_exclusive(self.path, self.owner):
            raise LeaseHeld(f"lease {self.path} taken over mid-run")

    def release(self) -> None:
        try:
            if self._fs.exists(self.path) and \
                    self._fs.read_text(self.path).strip() == self.owner:
                self._fs.delete(self.path)
        except Exception:
            pass  # a stale lease self-heals via the TTL takeover


def acquire_writer_lease(fs: Fs, root: str, owner: str | None = None,
                         ttl_seconds: int = LEASE_TTL_SECONDS) -> WriterLease:
    """THE multi-writer contract (round-12 verdict #2): every
    whole-table or partition REWRITER (rollup compaction, delete/
    update mutations, tag-index rewrite/backfill) must hold the
    table's lease for the duration of its protocol; concurrent
    rewriters get :class:`LeaseHeld` and retry later. APPENDS never
    take it — every protocol's snapshot/carry-over design already
    tolerates any number of concurrent appenders; what the protocols
    can NOT tolerate is a second concurrent REWRITER interleaving
    stage/swap states on the same partitions (``recover_swap`` is a
    one-writer state machine). This mirrors the reference, whose
    single MetricCacher writer pool is the implicit arbiter
    (MetricCacher.java) — on a shared lake the arbiter must be
    explicit.

    Mechanics: one dot-hidden lease file BESIDE the table root
    (:func:`lease_path`), content = owner token, staleness = file
    mtime older than ``ttl_seconds``
    (a crashed writer's lease ages out and is taken over; a live
    long-running writer renews between milestones). Acquisition is
    create-exclusive — atomic on local/HDFS; on object stores it is
    HEAD+PUT, so the post-write read-back confirmation below narrows
    (not fully closes) the race — two writers whose PUTs interleave
    exactly can both think they won for one round-trip. Deployments
    needing hard S3 mutual exclusion should front this with a
    conditional-PUT or external lock; the protocols stay crash-safe
    either way (generation commits are last-writer-wins-consistent,
    never corrupting)."""
    import os as _os
    import socket
    import time as _time
    import uuid as _uuid

    owner = owner or (f"{socket.gethostname()}-{_os.getpid()}-"
                      f"{_uuid.uuid4().hex[:8]}")
    path = lease_path(root)
    fs.mkdirs(parent_dir(root.rstrip("/")))
    # NOTE: acquisition never overwrite-writes the lease file — the
    # content rides in create_exclusive itself. An unconditional
    # post-acquire write_text raced a concurrent acquirer's (two
    # overwrite-renames on one path can throw FileAlreadyExists out of
    # ChecksumFs's delete+rename window), turning a clean LeaseHeld
    # into an unhandled error.
    acquired = created = False
    for _attempt in range(3):
        if fs.create_exclusive(path, owner):
            acquired = created = True
            break
        try:
            cur = fs.read_text(path).strip()
        except Exception:
            cur = None  # torn write: judge by mtime alone
        try:
            age = int(_time.time()) - fs.mtime(path)
        except Exception:
            continue  # vanished between probe and stat: retry create
        if cur == owner:
            acquired = True  # re-entrant; content already ours
            break
        if age <= ttl_seconds:
            raise LeaseHeld(
                f"writer lease on {root} held by {cur or '<unreadable>'} "
                f"({age}s old, ttl {ttl_seconds}s)")
        # stale: the holder crashed — take over
        fs.delete(path)
    if not acquired:
        raise LeaseHeld(f"writer lease on {root}: lost takeover race")
    try:
        cur = fs.read_text(path).strip()
    except Exception:
        cur = None
    if cur != owner:
        if created and cur is None:
            # we created the file but cannot read it back (transient):
            # remove our own token rather than ghost the table until
            # the TTL; a DIFFERENT token stays — its owner confirmed it
            fs.delete(path)
        raise LeaseHeld(f"writer lease on {root}: lost acquisition race")
    return WriterLease(fs, path, owner)


def writer_lease(fs: Fs, root: str, owner: str | None = None,
                 ttl_seconds: int = LEASE_TTL_SECONDS):
    """Context-manager form of :func:`acquire_writer_lease`."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        lease = acquire_writer_lease(fs, root, owner, ttl_seconds)
        try:
            yield lease
        finally:
            lease.release()

    return _ctx()


def recover_swap(fs: Fs, live: str, stage: str, bak: str) -> str | None:
    """Roll a three-path staged swap (stage -> live with ``bak``
    holding the previous live) forward or back after a crash; the same
    state machine :func:`operators.rollup.recover_compaction` applies
    per partition, reusable for whole-table swaps. Returns the action
    taken (or None when the state was already clean):

    - stage + live            -> drop the stale stage (swap never started)
    - stage + bak, no live    -> finish: stage -> live, drop bak
    - bak + live, no stage    -> drop bak (swap done, cleanup missed)
    - bak only                -> restore: bak -> live
    """
    s, l, b = fs.exists(stage), fs.exists(live), fs.exists(bak)
    if s:
        if l:
            fs.delete(stage)
            if b:  # stale backup of an older commit: live wins
                fs.delete(bak)
            return "dropped-stale-stage"
        if b:
            fs.rename(stage, live)
            fs.delete(bak)
            return "finished-swap"
        fs.delete(stage)
        return "dropped-orphan-stage"
    if b:
        if l:
            fs.delete(bak)
            return "dropped-backup"
        fs.rename(bak, live)
        return "restored-backup"
    return None
