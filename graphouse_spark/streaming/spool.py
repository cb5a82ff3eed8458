"""Durable spool: live TCP -> atomic line files -> checkpointed ingest.

The custom socket DataSource (sources/graphite_source.py) matches the
reference's topology but shares its weakness: a crash between accept
and the parquet commit loses in-flight lines — the reference holds the
batch in memory and retries forever (MetricCacher.java:266-303), which
survives *insert* failure but not process death. This module closes
that gap by making the durable boundary as early as possible:

  producers --TCP--> SpoolServer --append--> LineSpool
      (fsync'd atomic line files in a spool directory)
          --> start_file_ingest (checkpointed file source)
              --> data + metrics parquet

The file source + checkpoint replays any uncommitted spool file after
a restart (the crash-resume path proven by
tests/test_ingest.py::test_ingest_crash_resume), so once a line is
spooled it is never lost — strictly stronger than the reference end to
end. The only loss window left is lines received but not yet flushed
(bounded by ``flush_seconds``/``max_buffer_lines``; the reference's
window is its whole in-memory cache, cacheSize up to millions of
points, MetricCacher.java:97).

Scale posture: the spool is sequential appends on the ingest node —
the same single-writer chokepoint the reference's TCP server is; the
Spark side reads the spool like any directory source, so partitioning,
ban filtering and the name anti-join are unchanged. For >1-node ingest
run one SpoolServer per ingest node onto shared storage (unique file
names make concurrent spoolers safe) or front with Kafka.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
import uuid

from graphouse_spark.sources.graphite_source import (
    MAX_PICKLE_FRAME, carbon_batch_to_lines, safe_unpickle_frame)


class LineSpool:
    """Batches lines into atomic, fsync'd files under ``spool_dir``.

    Files appear atomically (write hidden ``.tmp-*`` -> fsync -> rename
    -> fsync dir), so the Spark file source never lists a torn file
    (dot-prefixed names are invisible to Spark's listing). File names
    are ``spool-<millis>-<seq>-<uuid>.txt`` — unique across restarts
    and across concurrent spoolers on shared storage."""

    def __init__(self, spool_dir: str, flush_seconds: float = 1.0,
                 max_buffer_lines: int = 100_000) -> None:
        self.spool_dir = spool_dir
        self.flush_seconds = flush_seconds
        self.max_buffer_lines = max_buffer_lines
        os.makedirs(spool_dir, exist_ok=True)
        self._lock = threading.Lock()
        self._buffer: list[str] = []
        self._seq = 0
        self._stopped = threading.Event()
        self._flusher = threading.Thread(target=self._flush_loop, daemon=True)
        self._flusher.start()

    def append(self, lines: list[str]) -> None:
        flush_now = False
        with self._lock:
            self._buffer.extend(lines)
            flush_now = len(self._buffer) >= self.max_buffer_lines
        if flush_now:
            try:
                self.flush()
            except OSError:
                # Overflow flush hit a disk hiccup. flush() already put
                # the lines back in the buffer; the flusher thread will
                # retry next tick. Never kill the reader connection over
                # a transient write error.
                pass

    def flush(self) -> str | None:
        """Durably write the buffered lines as one spool file; returns
        the file path (None if the buffer was empty).

        Crash/IO contract: the buffer is snapshotted (not dropped) —
        if any step of write/fsync/rename fails, the snapshot is
        re-prepended to the buffer under the lock (preserving arrival
        order against concurrent appends) and the tmp file is removed,
        so a transient ENOSPC/EIO loses nothing; the flusher retries."""
        with self._lock:
            if not self._buffer:
                return None
            lines, self._buffer = self._buffer, []
            self._seq += 1
            seq = self._seq
        name = f"spool-{int(time.time() * 1000)}-{seq}-{uuid.uuid4().hex[:8]}.txt"
        tmp = os.path.join(self.spool_dir, f".tmp-{name}")
        final = os.path.join(self.spool_dir, name)
        try:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
                f.flush()
                os.fsync(f.fileno())
            # os.rename, DELIBERATELY not fs.Fs.rename: the spool is
            # the node-local durable buffer in FRONT of the lake — it
            # must be local disk (fsync semantics are the whole point;
            # an object store has none) — so this is the one documented
            # exception to the "commit paths are os.*-free" invariant.
            # The lake side of the drain is FS-agnostic: the ingest
            # paths may be qualified URIs while the spool stays local
            # (tests/test_remote_fs.py::test_spool_drains_onto_
            # qualified_uri_lake).
            os.rename(tmp, final)
        except Exception:
            # Put the batch back (ahead of anything appended meanwhile)
            # so the durability claim holds across disk errors.
            with self._lock:
                self._buffer[:0] = lines
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        # fsync the directory so the rename itself survives power loss
        dir_fd = os.open(self.spool_dir, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        return final

    def _flush_loop(self) -> None:
        while not self._stopped.wait(self.flush_seconds):
            try:
                self.flush()
            except OSError:
                # disk hiccup: keep the lines buffered, retry next tick
                pass

    def stop(self) -> None:
        self._stopped.set()
        self._flusher.join(timeout=10)
        self.flush()


class SpoolServer:
    """The reference's TCP front door (MetricServer.java:151-222) with
    a durable floor: every received line is appended to a
    :class:`LineSpool` instead of a process-lifetime ring buffer.
    Speaks both carbon protocols (``line`` plaintext :2003, ``pickle``
    length-framed batches :2004) via the same hardened decoders as the
    socket DataSource."""

    def __init__(self, spool: LineSpool, host: str = "0.0.0.0",
                 port: int = 2003, protocol: str = "line") -> None:
        if protocol not in ("line", "pickle"):
            raise ValueError(f"unknown protocol {protocol!r} (line or pickle)")
        self.spool = spool
        self.protocol = protocol
        self._stopped = threading.Event()
        self._conns_lock = threading.Lock()
        self._conns: set[socket.socket] = set()
        self._readers: list[threading.Thread] = []
        self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._server.bind((host, port))
        self._server.listen(128)
        self.port = self._server.getsockname()[1]  # resolved (0 -> ephemeral)
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._stopped.is_set():
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            reader = (self._reader_pickle if self.protocol == "pickle"
                      else self._reader_line)
            with self._conns_lock:
                self._conns.add(conn)
                # bounded bookkeeping: drop finished reader threads so
                # a reconnect-per-send producer can't grow the list
                self._readers = [t for t in self._readers if t.is_alive()]
                t = threading.Thread(target=self._run_reader,
                                     args=(reader, conn), daemon=True)
                self._readers.append(t)
            t.start()

    def _run_reader(self, reader, conn: socket.socket) -> None:
        try:
            reader(conn)
        finally:
            with self._conns_lock:
                self._conns.discard(conn)

    def _reader_line(self, conn: socket.socket) -> None:
        with conn, conn.makefile("r", encoding="utf-8",
                                 errors="replace") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.spool.append([line])

    def _reader_pickle(self, conn: socket.socket) -> None:
        with conn:
            f = conn.makefile("rb")
            while not self._stopped.is_set():
                header = f.read(4)
                if len(header) < 4:
                    return
                (length,) = struct.unpack("!L", header)
                if not 0 < length <= MAX_PICKLE_FRAME:
                    return
                payload = f.read(length)
                if len(payload) < length:
                    return
                batch = safe_unpickle_frame(payload)
                if batch is None:
                    continue  # corrupt/hostile frame: skip it
                lines = carbon_batch_to_lines(batch)
                if lines:
                    self.spool.append(lines)

    def stop(self) -> None:
        """Stop accepting, drain readers, then final-flush the spool.

        Order matters: connections are shut down and reader threads
        joined *before* the final flush, so every line a producer got
        onto the wire before stop() is either in the spool or was cut
        with its connection — never appended after the last flush."""
        self._stopped.set()
        try:
            self._server.close()
        except OSError:
            pass
        with self._conns_lock:
            conns = list(self._conns)
            readers = list(self._readers)
        for conn in conns:
            try:
                conn.shutdown(socket.SHUT_RD)
            except OSError:
                pass
        for t in readers:
            t.join(timeout=10)
        self.spool.stop()
