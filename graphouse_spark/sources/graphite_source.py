"""Custom PySpark streaming DataSource speaking the Graphite plaintext protocol.

The reference ingests via a blocking TCP *server* — producers connect
and push ``name value ts`` lines (server/MetricServer.java:151-222).
Spark's built-in socket source has the opposite topology (it dials
out), so this implements the server side as a Spark 4 Python
``DataSource``/``DataSourceStreamReader``:

- a listener thread on the driver accepts any number of producer
  connections (the reference runs 100 reader threads; here each
  connection gets a thread, and lines land in one ring buffer);
- offsets are line counters — ``latestOffset`` snapshots the buffer
  head, ``partitions(start, end)`` ships the slice to executors in
  fixed-size chunks (the reference's read-batch-size), ``commit``
  prunes;
- each line carries its arrival timestamp (``updated`` — T1: event
  time comes from the line, arrival time from the server clock);
- at-least-once across restarts (uncommitted buffered lines are
  gone if the driver dies — same contract as the reference's
  in-memory queue, MetricCacher.java:97).

Usage::

    spark.dataSource.register(GraphiteDataSource)
    raw = (spark.readStream.format("graphite")
           .option("port", "2003").load())
    parsed = parse_lines(raw, updated=F.col("updated"))

The driver is the ingest chokepoint by design at this layer — one
node terminated TCP in the reference too. For >1-node ingest scale,
front with Kafka and reuse everything after ``parse_lines``.
"""

from __future__ import annotations

import socket
import threading
from collections import deque

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

DEFAULT_PORT = 2003
READ_BATCH_SIZE = 1000  # lines per partition (graphouse-default.properties:31)

#: oversized pickle frame cutoff — a sane relay batch is kilobytes
MAX_PICKLE_FRAME = 16 * 1024 * 1024


def safe_unpickle_frame(payload: bytes):
    """Unpickle a carbon frame with ALL globals forbidden.

    Unpickling network bytes normally executes arbitrary constructors;
    carbon batches are pure lists/tuples/numbers/strings and need no
    globals, so a malicious frame fails to load instead of running
    code (carbon itself grew the same guard as
    ``USE_INSECURE_UNPICKLER=False``). Returns the batch, or ``None``
    for a corrupt/hostile frame."""
    import io
    import pickle

    class _SafeUnpickler(pickle.Unpickler):
        def find_class(self, module, name):  # noqa: ARG002
            raise pickle.UnpicklingError("globals forbidden in metric frames")

    try:
        batch = _SafeUnpickler(io.BytesIO(payload)).load()
    except Exception:
        return None
    return batch if isinstance(batch, (list, tuple)) else None


def carbon_batch_to_lines(batch) -> list[str]:
    """``(metric, (ts, value))`` datapoints -> plaintext lines, so
    everything downstream (parse -> validate -> ban -> write) is one
    shared path whichever protocol carried the point. Malformed
    datapoints are skipped, matching carbon's tolerant readers."""
    lines: list[str] = []
    for item in batch:
        try:
            metric, (ts, value) = item
            # round() like the line parser (F.round on the ts field) so
            # the same datapoint lands on the same second whichever
            # protocol carried it
            lines.append(f"{metric} {value} {round(float(ts))}")
        except (TypeError, ValueError):
            continue
    return lines


class GraphiteLinesPartition(InputPartition):
    def __init__(self, rows: list) -> None:
        self.rows = rows


class GraphiteDataSource(DataSource):
    """format("graphite") — options: host (bind addr), port, protocol
    (``line`` = carbon plaintext :2003, the reference's contract;
    ``pickle`` = carbon's batched pickle protocol :2004 — 4-byte
    length-framed lists of ``(metric, (ts, value))``, what
    carbon-relay/aggregator fleets actually emit)."""

    @classmethod
    def name(cls) -> str:
        return "graphite"

    def schema(self) -> str:
        return "value string, updated bigint"

    def streamReader(self, schema) -> "GraphiteStreamReader":
        return GraphiteStreamReader(self.options)


class GraphiteStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        import time

        self._host = options.get("host", "0.0.0.0")
        self._port = int(options.get("port", DEFAULT_PORT))
        self._protocol = options.get("protocol", "line")
        if self._protocol not in ("line", "pickle"):
            raise ValueError(f"unknown protocol {self._protocol!r} (line or pickle)")
        self._lock = threading.Lock()
        self._buffer: deque = deque()
        self._base = 0  # absolute offset of buffer[0]
        self._count = 0  # next absolute offset
        self._stopped = threading.Event()
        self._time = time
        self._server: socket.socket | None = None
        self.port: int | None = None

    def _ensure_started(self) -> None:
        """Bind lazily on the first offset poll: Spark instantiates the
        reader more than once (planning vs execution) and only the
        running stream polls offsets — eager binding would clash."""
        with self._lock:
            if self._server is not None:
                return
            server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            server.bind((self._host, self._port))
            server.listen(128)
            self._server = server
            self.port = server.getsockname()[1]  # resolved (0 -> ephemeral)
        threading.Thread(target=self._accept_loop, daemon=True).start()

    # -- listener (MetricServer analog) --
    def _accept_loop(self) -> None:
        while not self._stopped.is_set():
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            reader = (self._reader_pickle if self._protocol == "pickle"
                      else self._reader)
            threading.Thread(target=reader, args=(conn,), daemon=True).start()

    def _reader(self, conn: socket.socket) -> None:
        with conn, conn.makefile("r", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                now = int(self._time.time())
                with self._lock:
                    self._buffer.append((line, now))
                    self._count += 1

    #: oversized pickle frame cutoff (module constant kept as a class
    #: attr for back-compat)
    MAX_PICKLE_FRAME = MAX_PICKLE_FRAME

    def _reader_pickle(self, conn: socket.socket) -> None:
        """carbon pickle protocol: ``!L``-framed pickled batches of
        ``(metric, (ts, value))``, decoded via the shared hardened
        helpers (:func:`safe_unpickle_frame` /
        :func:`carbon_batch_to_lines`). Corrupt frames drop; framing
        errors drop the connection."""
        import struct

        with conn:
            f = conn.makefile("rb")
            while not self._stopped.is_set():
                header = f.read(4)
                if len(header) < 4:
                    return
                (length,) = struct.unpack("!L", header)
                if not 0 < length <= self.MAX_PICKLE_FRAME:
                    return
                payload = f.read(length)
                if len(payload) < length:
                    return
                batch = safe_unpickle_frame(payload)
                if batch is None:
                    continue  # corrupt/hostile frame: skip it
                now = int(self._time.time())
                rows = [(l, now) for l in carbon_batch_to_lines(batch)]
                with self._lock:
                    for r in rows:
                        self._buffer.append(r)
                        self._count += 1

    # -- offsets (line counters) --
    def initialOffset(self) -> dict:
        self._ensure_started()
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._ensure_started()
        with self._lock:
            return {"offset": self._count}

    def partitions(self, start: dict, end: dict) -> list:
        s, e = start["offset"], end["offset"]
        with self._lock:
            lo = max(s - self._base, 0)
            hi = max(e - self._base, 0)
            rows = list(self._buffer)[lo:hi]
        if not rows:
            return [GraphiteLinesPartition([])]
        return [
            GraphiteLinesPartition(rows[i : i + READ_BATCH_SIZE])
            for i in range(0, len(rows), READ_BATCH_SIZE)
        ]

    def read(self, partition: GraphiteLinesPartition):
        yield from partition.rows

    def __getstate__(self) -> dict:
        # read() runs on executors: ship nothing but identity — the
        # partition object already carries its rows; sockets, locks and
        # the ring buffer stay on the driver
        return {"_host": self._host, "_port": self._port,
                "_protocol": self._protocol}

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)

    def commit(self, end: dict) -> None:
        e = end["offset"]
        with self._lock:
            while self._base < e and self._buffer:
                self._buffer.popleft()
                self._base += 1

    def stop(self) -> None:
        self._stopped.set()
        try:
            self._server.close()
        except OSError:
            pass
