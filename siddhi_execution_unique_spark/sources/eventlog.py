"""Custom PYTHON DATA SOURCE — the Spark 4 ``pyspark.sql.datasource``
API (user-defined sources registered from Python, scheduled like any
other scan) demonstrated as a from-scratch source/sink pair for the
events stream. The reference engine's extension points include custom
io (sources/sinks) registered against the host engine; this is the
Spark-4-native analogue of that surface (SURVEY.md §2b source/sink),
alongside the built-in parquet/ORC/CSV/JSON paths.

Format ("evtlog"): line-oriented, one JSON array per line in the
fixed column order of :data:`EVENTLOG_SCHEMA`. JSON gives
delimiter-free escaping (the ``props`` column carries arbitrary JSON
text that would break naive CSV-style splitting), exact int64
round-trips, and IEEE doubles via repr shortest-round-trip.

Scale shape: one file per write task and one read task per file, so
parallelism follows the upstream partitioning on write and the file
count on read — the same contract as Spark's own text sources. The
Python reader is NOT the 100 TB hot path (per-row Python vs the JVM's
vectorized readers); it is the extension-point demonstration, and the
engine's bulk formats remain parquet/ORC. Local/driver-shared
filesystem is assumed (local mode); on a real cluster the path must
be shared storage.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    InputPartition,
    LessThan,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENTLOG_SCHEMA = (
    "event_id bigint, ts_ms bigint, user_id bigint, "
    "event_type string, value double, props string"
)
_FIELDS = ("event_id", "ts_ms", "user_id", "event_type", "value", "props")


def _parse_file(path: str) -> list:
    """Parse one evtlog file in a SINGLE C-level ``json.loads`` call:
    the format is one JSON array per line, and JSON string values can
    never contain a RAW newline (always escaped ``\\n``), so joining
    the lines with commas inside one synthetic outer array is exact.
    The old per-line ``json.loads`` loop re-entered the parser once
    per row and dominated every evtlog read (guide §4.2: hand whole
    batches to native code — the r14 Arrow-return reader measured
    FLAT against the tuple path precisely because per-line parsing
    swamped both)."""
    with open(path, "rb") as fh:
        data = fh.read()
    body = data.strip()
    if not body:
        return []
    return json.loads(b"[" + body.replace(b"\n", b",") + b"]")


def _dump_lines(fh, rows) -> None:
    """Serialize rows (iterables in ``_FIELDS`` order) to JSON-array
    lines — byte-identical to the old per-row ``json.dumps`` loop."""
    out = "\n".join(map(json.dumps, rows))
    if out:
        fh.write(out + "\n")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _EventLogReader(DataSourceReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("evtlog read requires option 'path'")
        self._preds: list = []  # (field index, operator, literal)

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self._dir) if f.endswith(".evt")
        )
        return [_FilePartition(os.path.join(self._dir, f)) for f in files]

    def read(self, partition):
        preds = self._preds
        rows = _parse_file(partition.path)
        if not preds:
            return map(tuple, rows)
        return (
            tuple(row)
            for row in rows
            # SQL comparison semantics: NULL never matches
            if all(
                row[i] is not None and op(row[i], v)
                for (i, op, v) in preds
            )
        )


class _EventLogPushdownReader(_EventLogReader):
    """Selected by ``option("pushdown", "true")``: Spark REFUSES a
    reader that merely defines ``pushFilters`` while the session conf
    ``spark.sql.python.filterPushdown.enabled`` is false, so the
    pushdown surface lives on this opt-in subclass — both switches on
    together enable it, the plain reader stays valid everywhere
    else."""

    def pushFilters(self, filters):
        """Spark 4.1 Python-source FILTER PUSHDOWN (opt-in via
        ``spark.sql.python.filterPushdown.enabled``): accept simple
        comparisons on top-level columns and evaluate them inside the
        per-file read loop, so filtered-out rows never cross the
        Python→Arrow→JVM boundary; anything else is yielded back for
        Spark to apply above the scan. evtlog files carry no min/max
        stats, so the win is transfer volume, not I/O — on a stats-
        bearing format this hook is where file pruning would live."""
        import operator

        ops = {EqualTo: operator.eq, GreaterThan: operator.gt,
               LessThan: operator.lt}
        for f in filters:
            op = ops.get(type(f))
            attr = getattr(f, "attribute", None)
            value = getattr(f, "value", None)
            if (
                op is not None
                and attr is not None
                and len(attr) == 1
                and attr[0] in _FIELDS
                and value is not None
            ):
                self._preds.append((_FIELDS.index(attr[0]), op, value))
            else:
                yield f  # unsupported: Spark re-applies it


class _EventLogArrowReader(_EventLogReader):
    """Selected by ``option("arrow", "true")``: ``read`` yields ONE
    ``pyarrow.RecordBatch`` per file instead of per-row tuples — the
    Spark-4 columnar return path for Python sources. Honest
    measurement (sf0.1, 100k rows): FLAT vs the tuple path, because
    the generic worker already converts tuple iterators to Arrow
    batches and line-JSON parsing dominates both; the batch return
    matters when row materialization itself is the cost (wide rows,
    nested values) or when the source can produce columns natively.
    Kept as the API-complete variant with a parity pin."""

    _TYPES = None  # built lazily: pyarrow import stays off the module path

    def read(self, partition):
        import pyarrow as pa

        if _EventLogArrowReader._TYPES is None:
            _EventLogArrowReader._TYPES = [
                pa.int64(), pa.int64(), pa.int64(),
                pa.string(), pa.float64(), pa.string(),
            ]
        preds = self._preds
        rows = _parse_file(partition.path)
        if preds:
            rows = [
                r for r in rows
                if all(
                    r[i] is not None and op(r[i], v)
                    for (i, op, v) in preds
                )
            ]
        cols = list(zip(*rows)) if rows else [[] for _ in _FIELDS]
        yield pa.record_batch(
            [pa.array(list(c), t)
             for c, t in zip(cols, _EventLogArrowReader._TYPES)],
            names=list(_FIELDS),
        )


class _EventLogArrowPushdownReader(_EventLogArrowReader):
    """arrow + pushdown composed (separate class because defining
    ``pushFilters`` is itself an opt-in — see
    :class:`_EventLogPushdownReader`)."""

    pushFilters = _EventLogPushdownReader.pushFilters


class _EventLogWriter(DataSourceArrowWriter):
    """Batch evtlog sink with a staged, job-level atomic publish
    (ADVICE r09): each task writes to ``_staging/<uuid>.tmp`` and the
    final names carry that uuid, so (a) ``mode("append")`` can never
    collide with — and silently truncate — a prior write's files,
    (b) a failed job or abandoned speculative/retried task leaves
    only staging garbage invisible to readers (``*.evt`` filter),
    and (c) overwrite deletes the old generation only at COMMIT time,
    after the new data is fully staged.

    r14 (guide §4): ``DataSourceArrowWriter`` — the task receives
    Arrow ``RecordBatch``es instead of pickled Rows, so the
    JVM→Python hop is columnar and the per-row cost is one
    ``json.dumps`` (C) per line instead of six ``Row.__getitem__``
    calls plus row unpickling. ``to_pylist`` yields the same Python
    values (int/float/str/None) the Row path produced, so the file
    bytes are identical."""

    def __init__(self, options, overwrite: bool):
        self._dir = options.get("path")
        self._overwrite = overwrite
        if not self._dir:
            raise ValueError("evtlog write requires option 'path'")

    def write(self, batches) -> "_EvtCommit":
        import uuid

        from pyspark import TaskContext

        staging = os.path.join(self._dir, "_staging")
        os.makedirs(staging, exist_ok=True)
        pid = TaskContext.get().partitionId()
        token = f"{pid:05d}-{uuid.uuid4().hex}"
        path = os.path.join(staging, f"{token}.tmp")
        with open(path, "w", encoding="utf-8") as fh:
            for batch in batches:
                _dump_lines(
                    fh, zip(*(c.to_pylist() for c in batch.columns)))
        return _EvtCommit(path)

    def commit(self, messages) -> None:
        staged = [m for m in messages if m is not None]
        new_names = set()
        for msg in staged:
            token = os.path.splitext(os.path.basename(msg.path))[0]
            name = f"part-{token}.evt"
            new_names.add(name)
            if os.path.exists(msg.path):
                os.replace(msg.path, os.path.join(self._dir, name))
        if self._overwrite:
            for f in os.listdir(self._dir):
                if f.endswith(".evt") and f not in new_names:
                    os.remove(os.path.join(self._dir, f))

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.path):
                os.remove(msg.path)


class _EventLogPartitionedStreamReader(DataSourceStreamReader):
    """The SCALE-PATH streaming reader (``option("reader",
    "partitioned")``): the driver plans only OFFSETS (sorted-file
    positions) and one :class:`InputPartition` per file; the rows are
    read on the EXECUTORS — unlike the simple reader, no record ever
    passes through the driver, so a micro-batch's size is bounded by
    cluster width, not driver memory. This is the shape a 100 TB
    ingest uses; the simple reader stays as the minimal-API
    demonstration."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("evtlog read requires option 'path'")

    def _files(self):
        return sorted(
            f for f in os.listdir(self._dir) if f.endswith(".evt")
        )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()[start["pos"]:end["pos"]]
        return [_FilePartition(os.path.join(self._dir, f)) for f in files]

    def read(self, partition):
        # executor-side, Arrow return path (r14, guide §4): one
        # RecordBatch per file — the whole file parses in a single
        # json.loads and crosses to the JVM columnar, instead of one
        # tuple pickle per row (same Spark-4 contract as the batch
        # reader's arrow variant; never pickled, unlike the simple
        # reader's driver-prefetched batches)
        import pyarrow as pa

        rows = _parse_file(partition.path)
        cols = list(zip(*rows)) if rows else [[] for _ in _FIELDS]
        types = (pa.int64(), pa.int64(), pa.int64(),
                 pa.string(), pa.float64(), pa.string())
        yield pa.record_batch(
            [pa.array(list(c), t) for c, t in zip(cols, types)],
            names=list(_FIELDS),
        )

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean up


class _EvtCommit(WriterCommitMessage):
    def __init__(self, path: str, pid: int = -1):
        self.path = path
        self.pid = pid


class _EventLogStreamWriter(DataSourceStreamArrowWriter):
    """Streaming evtlog sink with per-micro-batch atomic publish:
    ``write`` stages each task's rows to a temp file and returns its
    path AND task partition id in the commit message; ``commit``
    renames the staged files to ``part-<batchId>-<partitionId>.evt``
    — a STABLE task identity, not an enumeration index (ADVICE r09:
    index-based names only replay identically if the replayed batch
    plans the same task order) — then sweeps any ``part-<batchId>-*``
    stragglers a differently-planned replay left behind, so a
    restart-replayed batch id is exactly-once regardless of replan;
    ``abort`` deletes the staged files so a failed batch publishes
    nothing."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("evtlog write requires option 'path'")

    def write(self, iterator) -> _EvtCommit:
        # DataSourceStreamArrowWriter (r14, guide §4): per-micro-batch
        # rows arrive as Arrow RecordBatches, not pickled Rows — same
        # columnar hop + byte-identical serialization as the batch
        # Arrow writer
        import uuid

        from pyspark import TaskContext

        staging = os.path.join(self._dir, "_staging")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"{uuid.uuid4().hex}.tmp")
        with open(path, "w", encoding="utf-8") as fh:
            for batch in iterator:
                _dump_lines(
                    fh, zip(*(c.to_pylist() for c in batch.columns)))
        return _EvtCommit(path, TaskContext.get().partitionId())

    def commit(self, messages, batchId: int) -> None:
        staged = [m for m in messages if m is not None]
        published = set()
        for msg in staged:
            name = f"part-{batchId:08d}-{msg.pid:05d}.evt"
            published.add(name)
            if os.path.exists(msg.path):
                os.replace(msg.path, os.path.join(self._dir, name))
        # a replay planned with DIFFERENT partitioning must not leave
        # the old plan's files alongside the new ones
        prefix = f"part-{batchId:08d}-"
        for f in os.listdir(self._dir):
            if f.startswith(prefix) and f.endswith(".evt") and f not in published:
                os.remove(os.path.join(self._dir, f))

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.path):
                os.remove(msg.path)


class _EventLogSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming evtlog SOURCE: the offset is the sorted list position
    of the last consumed ``.evt`` file, so each micro-batch is "the
    files that appeared since the previous batch" — the same
    file-per-batch replay contract as the engine's parquet
    `stream_table` harness, but implemented through the Python
    DataSource API. ``readBetweenOffsets`` re-reads an exact file
    range, which is what makes checkpoint recovery replay the same
    micro-batch bit-for-bit."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("evtlog read requires option 'path'")
        self._max_files = int(options.get("maxFilesPerBatch", "0"))  # 0 = all

    def _files(self):
        return sorted(
            f for f in os.listdir(self._dir) if f.endswith(".evt")
        )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, files):
        # an ITERATOR over a concrete list: Spark's prefetch wrapper
        # drives the result with next() (so a bare list fails) and
        # pickles it across processes (so a generator fails); the
        # SIMPLE reader variant prefetches on the DRIVER — fine for
        # the extension-point demonstration, and why Spark names the
        # partition-planned DataSourceStreamReader as the scale path
        out = []
        for f in files:
            out.extend(map(tuple, _parse_file(os.path.join(self._dir, f))))
        return iter(out)

    def read(self, start: dict):
        files = self._files()
        pos = start["pos"]
        batch = files[pos:]
        if self._max_files > 0:
            batch = batch[: self._max_files]
        return self._rows(batch), {"pos": pos + len(batch)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        return self._rows(files[start["pos"]:end["pos"]])

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean up


def _check_write_schema(schema) -> None:
    names = [f.name for f in schema.fields]
    if names != list(_FIELDS):
        raise ValueError(
            f"evtlog writes the fixed column order {list(_FIELDS)}, "
            f"got {names}"
        )


class EventLogDataSource(DataSource):
    """``spark.read.format("evtlog")`` / ``df.write.format("evtlog")``
    after :func:`register_eventlog`."""

    @classmethod
    def name(cls) -> str:
        return "evtlog"

    def schema(self) -> str:
        return EVENTLOG_SCHEMA

    def reader(self, schema) -> _EventLogReader:
        arrow = self.options.get("arrow", "").lower() == "true"
        push = self.options.get("pushdown", "").lower() == "true"
        cls = {
            (False, False): _EventLogReader,
            (False, True): _EventLogPushdownReader,
            (True, False): _EventLogArrowReader,
            (True, True): _EventLogArrowPushdownReader,
        }[(arrow, push)]
        return cls(self.options)

    def writer(self, schema, overwrite: bool) -> _EventLogWriter:
        _check_write_schema(schema)
        path = self.options.get("path")
        if not path:
            raise ValueError("evtlog write requires option 'path'")
        os.makedirs(path, exist_ok=True)
        return _EventLogWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> _EventLogStreamWriter:
        _check_write_schema(schema)
        return _EventLogStreamWriter(self.options)

    def streamReader(self, schema) -> _EventLogPartitionedStreamReader:
        if self.options.get("reader", "simple") == "partitioned":
            return _EventLogPartitionedStreamReader(self.options)
        # raises PySparkNotImplementedError -> Spark falls back to
        # the simpleStreamReader below
        return super().streamReader(schema)

    def simpleStreamReader(self, schema) -> _EventLogSimpleStreamReader:
        return _EventLogSimpleStreamReader(self.options)


def register_eventlog(spark) -> None:
    """Idempotent registration of the evtlog format on a session."""
    spark.dataSource.register(EventLogDataSource)
