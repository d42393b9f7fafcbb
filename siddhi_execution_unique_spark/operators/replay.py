"""The stateful tier: operators whose semantics are an ordered replay
that Catalyst cannot express declaratively.

- ``unique:deduplicate`` (reference: component/src/main/java/io/siddhi/
  extension/execution/unique/DeduplicateStreamProcessor.java:89,
  evict-then-test :155-178): per key, keep an event iff its timestamp
  is more than ``interval`` after the **last kept** event of that key
  (the anchor is the kept event — dropped duplicates do not refresh
  it, map entries keep the kept timestamp). A ``lag()``-based SQL
  formulation under-approximates when bursts chain; the exact
  semantics need the per-key greedy chain.

  Scale design: the state is keyed, so the replay distributes —
  ``repartition(key) → sortWithinPartitions(key, ts) → mapInPandas``
  with an O(rows) scan carrying state across Arrow batches inside a
  partition. One shuffle + one per-partition sort, no single-group
  bottleneck, works at any key cardinality.

- ``unique:lengthBatch`` / ``unique:firstLengthBatch`` (reference:
  UniqueLengthBatchWindowProcessor.java:106, fire at map.size()==N
  :165, replace :210-213; UniqueFirstLengthBatchWindowProcessor.java:
  73-81): a tumbling batch fires the moment ``N`` *distinct keys*
  accumulate; duplicate keys replace (or are dropped, first-variant)
  within the forming batch; the trailing partial batch never fires.

- ``unique:timeLengthBatch`` (reference: UniqueTimeLengthBatchWindow-
  Processor.java:110; length-fire :279-282, skip-until-boundary
  :261-271,288-290, flush :304-336): fires on ``T`` elapsed or ``N``
  distinct keys, whichever first; after a length-fire, events are
  **discarded** until the next time boundary.

  Batch-id assignment for these two is inherently sequential over the
  whole stream (each fire resets a distinct-key set shared by all
  keys), so the batch API replays one globally ordered SCAN — a JVM
  external sort (spills at any size) feeding a stateful
  ``mapInPandas`` whose memory is bounded by the forming batch (the
  ≤N retained rows carried across Arrow chunks via
  :class:`_CarryScan`). Throughput of the one serial stage is the
  remaining scale caveat (SURVEY.md §7); use the time/length-batch
  pure-Catalyst operators when global arrival order isn't
  semantically required.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from siddhi_execution_unique_spark.operators.time_batch import event_ms
from siddhi_execution_unique_spark.operators.validation import (
    parse_time_ms,
    require_column,
    require_keys,
    require_pos_int,
)

_TS_MS = "_ts_ms"


def _sort_cols(ts: str, tiebreak: str | None) -> list[str]:
    return [_TS_MS] + ([tiebreak] if tiebreak else [])


def deduplicate(
    df: DataFrame,
    key: str,
    time_interval: int | str,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """``unique:deduplicate`` — drop events whose key was kept within
    the last ``time_interval``; strictly-greater spacing re-admits
    (reference keeps when ``new_ts - kept_ts > interval``,
    DeduplicateStreamProcessor.java:158-171). No expired channel
    (DeduplicateTestCase.java:84-86 asserts none)."""
    keys = require_keys(key, "unique.key")
    if len(keys) != 1 or not isinstance(keys[0], str):
        raise ValueError("unique:deduplicate takes exactly one key column name")
    key = keys[0]
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    interval_ms = parse_time_ms(time_interval, "time.interval")

    out_cols = list(df.columns)
    schema = df.schema
    sort_cols = [key] + _sort_cols(ts, tiebreak)

    prepared = (
        df.withColumn(_TS_MS, event_ms(df, ts))
        .repartition(F.col(key))
        .sortWithinPartitions(*sort_cols)
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        last_key: object = _SENTINEL
        last_kept_ms = 0
        for pdf in batches:
            if pdf.empty:
                continue
            key_arr = pdf[key].to_numpy()
            ms_arr = pdf[_TS_MS].to_numpy()
            m = len(pdf)
            keep = np.zeros(m, dtype=bool)
            # per-key group boundaries (input sorted by key, ts)
            starts = np.flatnonzero(np.r_[True, key_arr[1:] != key_arr[:-1]])
            ends = np.r_[starts[1:], m]
            # Each kept event's successor is the first row strictly more
            # than `interval` later — a searchsorted jump. Python-level
            # iterations scale with KEPT events (the chain length), not
            # with input rows; dropped bursts cost nothing.
            for s, e in zip(starts, ends):
                if s == 0 and key_arr[0] == last_key:
                    # chain continues across the Arrow batch boundary
                    i = s + np.searchsorted(
                        ms_arr[s:e], last_kept_ms + interval_ms, side="right"
                    )
                else:
                    i = s
                while i < e:
                    keep[i] = True
                    last_kept_ms = ms_arr[i]
                    i = s + np.searchsorted(
                        ms_arr[s:e], last_kept_ms + interval_ms, side="right"
                    )
            last_key = key_arr[-1]
            yield pdf.loc[keep, out_cols]

    return prepared.mapInPandas(scan, schema=schema)


class _Sentinel:
    def __eq__(self, other):  # never equal to any key value
        return False

    def __ne__(self, other):
        return True


_SENTINEL = _Sentinel()

BATCH_SEQ = "batch_seq"
FIRED_AT = "fired_at_ms"
FIRE_REASON = "fire_reason"


def _length_batch_assign(key_arr, ms_arr, n: int, keep: str):
    """The sequential lengthBatch chain: retained row index per
    (batch, key) plus the fire metadata. Inherently order-dependent —
    the one part that must see the stream in arrival order.

    Measured (1M rows, 50k keys, N=50, local): this per-row dict walk
    runs 0.54 s — a fully vectorized alternative (prev/next same-key
    occurrence indices + chunked cumulative fire scan, verified
    output-identical) ran 1.8 s because the per-fire Python/numpy
    dispatch dominates at realistic fire rates, so the simple walk
    stays. The single task's real cost is the Arrow funnel bytes,
    which the narrow 3-column path bounds; the chain itself is
    ~0.5 µs/row."""
    forming: dict = {}  # key -> row index of retained event
    rows: list[int] = []
    seqs: list[int] = []
    fires: list[int] = []
    seq = 0
    for i in range(len(key_arr)):
        k = key_arr[i]
        if k in forming:
            if keep == "last":
                forming[k] = i
        else:
            forming[k] = i
            if len(forming) == n:
                fired_at = ms_arr[i]
                for idx in forming.values():
                    rows.append(idx)
                    seqs.append(seq)
                    fires.append(fired_at)
                forming.clear()
                seq += 1
    return rows, seqs, fires


class _CarryScan:
    """Cross-chunk bookkeeping for streamed replays whose retained rows
    must ride the scan itself (no unique tiebreak id to join back on).

    The operator walks one Arrow chunk at a time referring to rows by
    opaque refs; refs still pending when the chunk ends (the forming
    batch / FIFO buffer — bounded by the window length) survive the
    boundary by being sliced ONCE, vectorized, into a small carry
    frame. Memory is O(window length + one Arrow batch) at any input
    size, and the upstream JVM external sort spills — so unlike the
    retired concat-everything single-group replay there is NO
    single-task row ceiling on these paths.

    Usage per chunk: ``begin(chunk)`` → ``emit(ref, *meta)`` for every
    output row (a ref may emit more than once — e.g. an event emits on
    the current channel now and on the expired channel later) →
    ``flush(pending_refs)`` returns the chunk's output frame (emission
    order preserved) plus the pending refs remapped into the new carry.
    New-chunk refs are ``(1, row_idx)``; carry refs stay valid until
    the next ``flush``.
    """

    def __init__(self, out_cols, meta_cols):
        self.out_cols = out_cols
        self.meta_cols = meta_cols  # [(name, pandas dtype), ...]
        self.carry: pd.DataFrame | None = None
        self.chunk: pd.DataFrame | None = None
        self._emitted: list = []  # (origin, pos, order, meta tuple)

    def begin(self, chunk: pd.DataFrame) -> None:
        self.chunk = chunk
        self._emitted = []

    def emit(self, ref, *meta) -> None:
        origin, pos = ref
        self._emitted.append((origin, pos, len(self._emitted), meta))

    def flush(self, pending_refs):
        out = None
        if self._emitted:
            parts, order, metas = [], [], []
            for want in (0, 1):
                rows = [e for e in self._emitted if e[0] == want]
                if rows:
                    src = self.carry if want == 0 else self.chunk
                    parts.append(src.iloc[[e[1] for e in rows]][self.out_cols])
                    order.extend(e[2] for e in rows)
                    metas.extend(e[3] for e in rows)
            out = (
                pd.concat(parts, ignore_index=True)
                if len(parts) > 1
                else parts[0].reset_index(drop=True)
            )
            for j, (name, dtype) in enumerate(self.meta_cols):
                out[name] = pd.Series([m[j] for m in metas], dtype=dtype)
            if len(parts) > 1:  # restore emission order across origins
                out = (
                    out.assign(_eord=order)
                    .sort_values("_eord", kind="mergesort", ignore_index=True)
                    .drop(columns="_eord")
                )
        # roll still-pending rows (bounded by the window length) into
        # the next carry frame; one vectorized slice per origin
        new_refs = []
        parts = []
        pos = 0
        for want in (0, 1):
            idxs = [r[1] for r in pending_refs if r[0] == want]
            if idxs:
                src = self.carry if want == 0 else self.chunk
                parts.append(src.iloc[idxs][self.out_cols])
        remap = {}
        for want in (0, 1):
            for r in pending_refs:
                if r[0] == want:
                    remap[r] = (0, pos)
                    pos += 1
        new_refs = [remap[r] for r in pending_refs]
        self.carry = (
            pd.concat(parts, ignore_index=True)
            if len(parts) > 1
            else (parts[0].reset_index(drop=True) if parts else None)
        )
        self.chunk = None
        return out, new_refs


def _sorted_stream_replay(df: DataFrame, ts: str, tiebreak: str | None,
                          out_schema, scan):
    """Globally ordered replay WITHOUT the in-memory concat ceiling:
    ``repartition(1)`` keeps the upstream scan/projection parallel,
    the JVM sorts the single partition (UnsafeExternalSorter — spills
    to disk at any size), and ``scan`` consumes the Arrow batches in
    global order carrying its own state across them, yielding output
    incrementally. Memory is bounded by the operator's chain state
    (e.g. the N forming keys) plus one Arrow batch — unbounded input
    streams through."""
    sort_cols = _sort_cols(ts, tiebreak)
    prepared = (
        df.withColumn(_TS_MS, event_ms(df, ts))
        .repartition(1)
        .sortWithinPartitions(*sort_cols)
    )
    return prepared.mapInPandas(scan, schema=out_schema)


def length_batch(
    df: DataFrame,
    key: str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    keep: str = "last",
) -> DataFrame:
    """``unique:lengthBatch`` (``keep='last'``) / ``unique:firstLengthBatch``
    (``keep='first'``): tumbling batches of ``N`` distinct keys.

    Output: the retained event per (batch, key), plus ``batch_seq``
    (0-based fire index) and ``fired_at_ms`` (event time of the fire,
    i.e. of the Nth distinct key's arrival — the reference rewrites
    emitted timestamps to flush time,
    UniqueLengthBatchWindowProcessor.java:171-191). The trailing
    partial batch is dropped (lengthBatch(10) never fires on <10
    uniques, UniqueLengthBatchWindowTestCase.java:90-106).
    """
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    n = require_pos_int(window_length, "window.length")
    if keep not in ("last", "first"):
        raise ValueError(f"keep must be 'last' or 'first', got {keep!r}")

    if tiebreak is not None:
        # Narrow funnel: the single ordered task scans ONLY
        # (key, ts_ms, tiebreak) — the sequential chain needs nothing
        # else — and the batch assignment joins back to the full rows
        # by the unique tiebreak id in a normal distributed hash join.
        # The chain STATE is bounded (the N forming keys), so the scan
        # streams across Arrow batches with no concat: a JVM external
        # sort feeds it in global order and memory stays O(N) at any
        # input size (no single-task row ceiling on this path).
        assign_schema = StructType(
            [
                StructField(tiebreak, df.schema[tiebreak].dataType),
                StructField(BATCH_SEQ, LongType()),
                StructField(FIRED_AT, LongType()),
            ]
        )

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            forming: dict = {}  # key -> retained tiebreak value
            seq = 0
            for pdf in batches:
                if pdf.empty:
                    continue
                key_arr = pdf[key].to_numpy()
                ms_arr = pdf[_TS_MS].to_numpy()
                tb_arr = pdf[tiebreak].to_numpy()
                out_tb: list = []
                out_seq: list[int] = []
                out_fire: list[int] = []
                for i in range(len(pdf)):
                    k = key_arr[i]
                    if k in forming:
                        if keep == "last":
                            forming[k] = tb_arr[i]
                    else:
                        forming[k] = tb_arr[i]
                        if len(forming) == n:
                            fired_at = int(ms_arr[i])
                            for tb in forming.values():
                                out_tb.append(tb)
                                out_seq.append(seq)
                                out_fire.append(fired_at)
                            forming.clear()
                            seq += 1
                if out_tb:
                    yield pd.DataFrame(
                        {
                            tiebreak: pd.Series(out_tb),
                            BATCH_SEQ: pd.Series(out_seq, dtype="int64"),
                            FIRED_AT: pd.Series(out_fire, dtype="int64"),
                        }
                    )

        assignment = _sorted_stream_replay(
            df.select(key, ts, tiebreak), ts, tiebreak, assign_schema, scan
        )
        return df.join(assignment, tiebreak).select(
            *df.columns, BATCH_SEQ, FIRED_AT
        )

    # no unique id to join back on -> full rows ride the streamed
    # scan, with the <=N-1 forming rows carried across Arrow chunks
    # (bounded state; the JVM external sort upstream spills, so this
    # path has no single-task row ceiling either)
    out_cols = list(df.columns)
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(BATCH_SEQ, LongType()), StructField(FIRED_AT, LongType())]
    )

    def scan_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = _CarryScan(out_cols, [(BATCH_SEQ, "int64"), (FIRED_AT, "int64")])
        forming: dict = {}  # key -> row ref of retained event
        seq = 0
        for pdf in batches:
            if pdf.empty:
                continue
            buf.begin(pdf)
            key_arr = pdf[key].to_numpy()
            ms_arr = pdf[_TS_MS].to_numpy()
            for i in range(len(pdf)):
                k = key_arr[i]
                if k in forming:
                    if keep == "last":
                        forming[k] = (1, i)
                else:
                    forming[k] = (1, i)
                    if len(forming) == n:
                        fired_at = int(ms_arr[i])
                        for ref in forming.values():
                            buf.emit(ref, seq, fired_at)
                        forming.clear()
                        seq += 1
            out, new_refs = buf.flush(list(forming.values()))
            forming = dict(zip(forming.keys(), new_refs))
            if out is not None:
                yield out

    return _sorted_stream_replay(df, ts, tiebreak, out_schema, scan_rows)


def length_batch_expired(batched: DataFrame, group_cols=()) -> DataFrame:
    """The EXPIRED channel of ``unique:lengthBatch``, derived from a
    :func:`length_batch` result: batch ``k`` re-emits as expired when
    fire ``k+1`` happens (UniqueLengthBatchWindowProcessor.java:
    171-191), timestamps rewritten to that flush time. The inner join
    on the shifted fire log drops the last batch — no successor fire
    ever flushes it. Plan shape: a tiny (one row per batch) distinct
    + an equi-join back onto the batched rows. No broadcast hint: the
    fire log has rows/N entries, which at billions of rows is far past
    broadcast size — AQE picks broadcast when it actually fits.

    ``group_cols`` scopes the fire chain: for a ``partition with``
    result (:func:`length_batch_partitioned`) pass the partition
    attribute so each instance's ``batch_seq`` log shifts
    independently — fire k+1 OF THE SAME INSTANCE is what drains
    batch k."""
    gcols = list(group_cols)
    nxt = (
        batched.select(*gcols, BATCH_SEQ, FIRED_AT).distinct()
        .select(
            *gcols,
            (F.col(BATCH_SEQ) - 1).alias(BATCH_SEQ),
            F.col(FIRED_AT).alias("expired_at_ms"),
        )
    )
    return batched.join(nxt, gcols + [BATCH_SEQ])


def length_batch_periods(
    df: DataFrame,
    key: str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign every event its lengthBatch FORMING-PERIOD index: period
    ``p`` spans the arrivals after fire ``p-1`` up to and including
    the arrival that completes fire ``p`` (``period_seq`` == the
    ``batch_seq`` the period closes with; the trailing open period
    gets the next index and never appears in the fire log).

    This is the piece the MIXED-pair join channels need to
    reconstruct the forming unique map *as of any probe time*
    (reference ``find()`` searches ``uniqueEventMap.values()``,
    UniqueLengthBatchWindowProcessor.java:226-233): an event is in
    the map from its arrival until it is displaced by a same-key
    arrival in the same period or the period fires — both derivable
    from ``period_seq`` with one window function, so the serial chain
    walk stays minimal (the same (key, ts, tiebreak) funnel as
    :func:`length_batch`, emitting one ref per event immediately —
    zero carried state beyond the N forming keys)."""
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    n = require_pos_int(window_length, "window.length")
    if tiebreak is None:
        raise ValueError(
            "length_batch_periods needs a tiebreak id column to join the "
            "period refs back to full rows"
        )
    require_column(df, tiebreak, "tiebreak")
    assign_schema = StructType(
        [
            StructField(tiebreak, df.schema[tiebreak].dataType),
            StructField("period_seq", LongType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        forming: set = set()
        seq = 0
        for pdf in batches:
            if pdf.empty:
                continue
            key_arr = pdf[key].to_numpy()
            tb_arr = pdf[tiebreak].to_numpy()
            out_seq = np.empty(len(pdf), dtype="int64")
            for i in range(len(pdf)):
                out_seq[i] = seq
                k = key_arr[i]
                if k not in forming:
                    forming.add(k)
                    if len(forming) == n:
                        forming.clear()
                        seq += 1
            yield pd.DataFrame(
                {tiebreak: pd.Series(tb_arr), "period_seq": out_seq}
            )

    refs = _sorted_stream_replay(
        df.select(key, ts, tiebreak), ts, tiebreak, assign_schema, scan
    )
    return df.join(refs, tiebreak).select(*df.columns, "period_seq")


def length_batch_forming(
    df: DataFrame,
    key: str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    keep: str = "last",
) -> DataFrame:
    """Final FORMING contents of ``unique:lengthBatch`` — the unique
    map a window-to-window JOIN probes: the reference's
    ``find()`` searches ``uniqueEventMap.values()``
    (UniqueLengthBatchWindowProcessor.java:226-233), i.e. the current
    UNFIRED batch, never the fired log. The final-state analog is the
    per-key retained event among arrivals after the last fire (or the
    whole stream when nothing fired) — at most ``N - 1`` rows.

    Same streamed single-task funnel as :func:`length_batch` (the
    chain is order-dependent), but the scan emits only the forming
    refs at end of stream, so output is tiny regardless of input."""
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    n = require_pos_int(window_length, "window.length")
    if keep not in ("last", "first"):
        raise ValueError(f"keep must be 'last' or 'first', got {keep!r}")
    tb = tiebreak
    if tb is None:
        raise ValueError(
            "length_batch_forming needs a tiebreak id column to join the "
            "forming refs back to full rows"
        )
    assign_schema = StructType(
        [StructField(tb, df.schema[tb].dataType)]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        forming: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            key_arr = pdf[key].to_numpy()
            tb_arr = pdf[tb].to_numpy()
            for i in range(len(pdf)):
                k = key_arr[i]
                if k in forming:
                    if keep == "last":
                        forming[k] = tb_arr[i]
                else:
                    forming[k] = tb_arr[i]
                    if len(forming) == n:
                        forming.clear()
        if forming:
            yield pd.DataFrame({tb: pd.Series(list(forming.values()))})

    refs = _sorted_stream_replay(
        df.select(key, ts, tb), ts, tb, assign_schema, scan
    )
    return df.join(refs, tb).select(*df.columns)


def first_length_batch(
    df: DataFrame,
    key: str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """``unique:firstLengthBatch`` — keep-first within each N-distinct-key
    batch (reference: UniqueFirstLengthBatchWindowProcessor.java:74-81)."""
    return length_batch(df, key, window_length, ts, tiebreak, keep="first")


def time_length_batch(
    df: DataFrame,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
) -> DataFrame:
    """``unique:timeLengthBatch`` — tumbling batch fired by ``T``
    elapsed or ``N`` distinct keys, whichever first; after a
    length-fire, events are discarded until the next time boundary
    (``eventSent`` skip, UniqueTimeLengthBatchWindowProcessor.java:
    261-271,288-290).

    Event-time replay with boundary timers at ``anchor + k*T`` (anchor
    = ``start_time_ms`` or the first event's time + T alignment,
    :244-252). Output adds ``batch_seq``, ``fired_at_ms`` and
    ``fire_reason`` ('time' | 'length'). Empty time windows fire
    nothing; the trailing partial batch never fires.
    """
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    t_ms = parse_time_ms(window_time, "window.time")
    n = require_pos_int(window_length, "window.length")

    out_cols = list(df.columns)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(BATCH_SEQ, LongType()),
            StructField(FIRED_AT, LongType()),
            StructField(FIRE_REASON, StringType()),
        ]
    )
    def scan_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = _CarryScan(
            out_cols,
            [(BATCH_SEQ, "int64"), (FIRED_AT, "int64"), (FIRE_REASON, "object")],
        )
        forming: dict = {}  # key -> row ref of retained event
        seq = 0
        event_sent = False
        next_emit: int | None = None  # set from the globally-first row

        for pdf in batches:
            if pdf.empty:
                continue
            buf.begin(pdf)
            key_arr = pdf[key].to_numpy()
            ms_arr = pdf[_TS_MS].to_numpy()

            def fire(at_ms: int, reason: str) -> None:
                nonlocal seq
                if forming:
                    for ref in forming.values():
                        buf.emit(ref, seq, at_ms, reason)
                    forming.clear()
                    seq += 1

            for i in range(len(pdf)):
                ts_i = int(ms_arr[i])
                if next_emit is None:
                    if start_time_ms is not None:
                        next_emit = (
                            start_time_ms
                            + ((ts_i - start_time_ms) // t_ms + 1) * t_ms
                        )
                    else:
                        next_emit = ts_i + t_ms
                while ts_i >= next_emit:
                    if event_sent:
                        event_sent = False  # boundary clears the skip flag
                    else:
                        fire(next_emit, "time")
                    next_emit += t_ms
                if event_sent:
                    continue  # discarded until next boundary
                forming[key_arr[i]] = (1, i)
                if len(forming) == n:
                    fire(ts_i, "length")
                    event_sent = True
            out, new_refs = buf.flush(list(forming.values()))
            forming = dict(zip(forming.keys(), new_refs))
            if out is not None:
                yield out

    return _sorted_stream_replay(df, ts, tiebreak, out_schema, scan_rows)


def _time_length_replay(key: str, t_ms: int, n: int, start_time_ms, out_cols):
    """Per-instance timeLengthBatch replay over an arrival-ordered
    pandas frame (the per-partition-value instances of ``partition
    with``; the global form streams via its own :class:`_CarryScan`
    scan in :func:`time_length_batch`)."""

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        key_arr = pdf[key].to_numpy()
        ms_arr = pdf[_TS_MS].to_numpy()
        rows: list[int] = []
        seqs: list[int] = []
        fires: list[int] = []
        reasons: list[str] = []
        seq = 0
        forming: dict = {}
        event_sent = False
        if len(pdf) == 0:
            return pdf.iloc[[]][out_cols].assign(
                **{BATCH_SEQ: [], FIRED_AT: [], FIRE_REASON: []}
            )
        if start_time_ms is not None:
            first_ms = ms_arr[0]
            next_emit = (
                start_time_ms
                + ((first_ms - start_time_ms) // t_ms + 1) * t_ms
            )
        else:
            next_emit = ms_arr[0] + t_ms

        def fire(at_ms: int, reason: str) -> None:
            nonlocal seq
            if forming:
                for idx in forming.values():
                    rows.append(idx)
                    seqs.append(seq)
                    fires.append(at_ms)
                    reasons.append(reason)
                forming.clear()
                seq += 1

        for i in range(len(pdf)):
            ts_i = ms_arr[i]
            while ts_i >= next_emit:
                if event_sent:
                    event_sent = False  # boundary clears the skip flag
                else:
                    fire(next_emit, "time")
                next_emit += t_ms
            if event_sent:
                continue  # discarded until next boundary
            forming[key_arr[i]] = i
            if len(forming) == n:
                fire(ts_i, "length")
                event_sent = True
        out = pdf.iloc[rows][out_cols].copy()
        out[BATCH_SEQ] = pd.Series(seqs, index=out.index, dtype="int64")
        out[FIRED_AT] = pd.Series(fires, index=out.index, dtype="int64")
        out[FIRE_REASON] = pd.Series(reasons, index=out.index, dtype="object")
        return out

    return replay


def time_length_batch_distributed(
    df: DataFrame,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
    _keep_anchor: bool = False,
) -> DataFrame:
    """Distributed ``unique:timeLengthBatch`` — same semantics as
    :func:`time_length_batch` (cross-checked by test and by the shared
    driver oracle) built from window functions partitioned by the time
    interval, with no single-group replay.

    Why this is possible: the post-length-fire discard flag clears
    exactly at the next boundary, so intervals are INDEPENDENT. Within
    interval ``k = floor((ms - anchor)/T)``:

    - a length fire happens at the first row where the running count
      of distinct-key first occurrences reaches ``N`` (exactly one
      such row per interval — later events are discarded);
    - otherwise the interval time-fires at its boundary, but only if a
      later event actually crosses it (trailing partial never fires).

    Plan shape: one shuffle keyed on the interval (all three window
    functions share it), a per-interval fire-point aggregate (one row
    per interval — broadcast-sized at any corpus scale), and a tiny
    sequence-numbering window over distinct intervals."""
    from pyspark.sql.window import Window

    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    t_ms = parse_time_ms(window_time, "window.time")
    n = require_pos_int(window_length, "window.length")
    out_cols = list(df.columns)

    ms = event_ms(df, ts)
    if start_time_ms is None:
        edges = df.agg(F.min(ms).alias("_anchor"), F.max(ms).alias("_max_ms"))
    else:
        edges = df.agg(F.max(ms).alias("_max_ms")).withColumn(
            "_anchor", F.lit(start_time_ms).cast("long")
        )
    base = (
        df.withColumn(_TS_MS, ms)
        .crossJoin(F.broadcast(edges))
        .withColumn("_k", F.expr(f"({_TS_MS} - _anchor) div {t_ms}"))
    )
    order = [F.col(_TS_MS)] + ([F.col(tiebreak)] if tiebreak else [])
    w_first = Window.partitionBy("_k", key).orderBy(*order)
    w_run = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = F.struct(*order)
    # the fire point _L rides on an unbounded window over the same _k
    # partitioning the running count already shuffled on — no separate
    # per-interval aggregate + join
    w_k = Window.partitionBy("_k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    running = (
        base.withColumn("_isf", F.row_number().over(w_first) == 1)
        .withColumn("_nd", F.sum(F.when(F.col("_isf"), 1).otherwise(0)).over(w_run))
        .withColumn(
            "_L",
            F.min(F.when((F.col("_nd") == n) & F.col("_isf"), pos)).over(w_k),
        )
    )
    live = running.filter(
        (
            F.col("_L").isNull()
            & (F.expr(f"_anchor + (_k + 1) * {t_ms}") <= F.col("_max_ms"))
        )
        | (F.col("_L").isNotNull() & (pos <= F.col("_L")))
    )
    w_keep = Window.partitionBy("_k", key).orderBy(*[c.desc() for c in order])
    retained = live.withColumn("_rnk", F.row_number().over(w_keep)).filter(
        F.col("_rnk") == 1
    )
    # one row per fired interval — tiny at any scale
    seqs = (
        live.select("_k")
        .distinct()
        .withColumn("_seq", F.row_number().over(Window.orderBy("_k")) - 1)
    )
    return retained.join(seqs, "_k").select(
        *out_cols,
        F.col("_seq").cast("long").alias(BATCH_SEQ),
        F.when(F.col("_L").isNotNull(), F.col("_L").getField(_TS_MS))
        .otherwise(F.expr(f"_anchor + (_k + 1) * {t_ms}"))
        .cast("long")
        .alias(FIRED_AT),
        F.when(F.col("_L").isNotNull(), F.lit("length"))
        .otherwise(F.lit("time"))
        .alias(FIRE_REASON),
        *([F.col("_anchor"), F.col("_max_ms")] if _keep_anchor else []),
    )


def time_length_batch_expired(
    df: DataFrame,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
) -> DataFrame:
    """The EXPIRED channel of ``unique:timeLengthBatch``: batch ``k``
    re-emits as expired at the first FLUSH after its own fire,
    timestamps rewritten to that flush time (``sendEvents`` drains
    ``eventsToBeExpired`` on every flush,
    UniqueTimeLengthBatchWindowProcessor.java:304-318). After a TIME
    fire the scheduler's next tick (one period later) flushes even
    with no arrivals; after a LENGTH fire the first boundary only
    RESETS the skip flag — the ``eventSent`` timer branch returns
    WITHOUT calling ``sendEvents``
    (UniqueTimeLengthBatchWindowProcessor.java:261-265) — so the
    drain waits for the flush AFTER that clearing boundary. With
    ``B(k)`` = first boundary strictly after fire ``k``:

        expired_at(k) = min( fire k+1,
                             B(k) + (T if fire k was a length fire
                                     else 0) )

    The unrestricted ``lead(fired_at)`` term is safe in both cases: a
    time fire following a length-fired batch can never precede
    ``B(k)+T`` (no events accumulate during the skip phase, and the
    clearing boundary itself never fires), and a time fire following a
    time-fired batch lands exactly on its boundary term. A batch
    expires within the stream iff the event-time clock demonstrably
    reaches that flush point, i.e. ``expired_at <= max(event ts)`` —
    the same witness rule the distributed form already applies to time
    fires, so the two channels share one clock model.

    Plan shape: the distributed batched form plus a one-row-per-fired-
    batch distinct with a ``lead`` over it (tiny at any scale) joined
    back on ``batch_seq`` — AQE broadcasts it when it fits.
    """
    from pyspark.sql.window import Window

    t_ms = parse_time_ms(window_time, "window.time")
    batched = time_length_batch_distributed(
        df, key, window_time, window_length, ts=ts, tiebreak=tiebreak,
        start_time_ms=start_time_ms, _keep_anchor=True,
    )
    fires = batched.select(BATCH_SEQ, FIRED_AT).distinct()
    nxt = fires.withColumn(
        "_next_fire", F.lead(FIRED_AT).over(Window.orderBy(BATCH_SEQ))
    ).select(BATCH_SEQ, "_next_fire")
    # B(k): for a time fire (fired_at sits ON a boundary) floor+1
    # already lands one period later; for a length fire it gives the
    # clearing boundary, which only resets the skip flag — the drain
    # is one more period out
    drain_boundary = (
        F.col("_anchor")
        + (F.floor((F.col(FIRED_AT) - F.col("_anchor")) / t_ms) + 1) * t_ms
        + F.when(F.col(FIRE_REASON) == "length", F.lit(t_ms)).otherwise(F.lit(0))
    )
    return (
        batched.join(nxt, BATCH_SEQ)
        # least() skips NULLs: the last fired batch has no next fire,
        # leaving the boundary term alone
        .withColumn(
            "expired_at_ms",
            F.least(drain_boundary.cast("long"), F.col("_next_fire")),
        )
        .filter(F.col("expired_at_ms") <= F.col("_max_ms"))
        .drop("_anchor", "_max_ms", "_next_fire")
    )


def _partitioned_replay(
    df: DataFrame,
    partition_attr: str,
    ts: str,
    tiebreak: str | None,
    out_schema,
    fn,
) -> DataFrame:
    """Run an arrival-ordered replay INDEPENDENTLY per partition-attr
    value (Siddhi's ``partition with``: every value owns a window
    instance with its own state). Unlike the global ordered-scan
    funnel, this distributes: one shuffle
    keyed on the partition attribute, then each instance's chain runs
    in its own pandas group — the scale shape is bounded by the
    LARGEST partition, not the corpus."""
    sort_cols = _sort_cols(ts, tiebreak)
    prepared = df.withColumn(_TS_MS, event_ms(df, ts))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        return fn(pdf)

    return prepared.groupBy(partition_attr).applyInPandas(run, schema=out_schema)


def length_batch_partitioned(
    df: DataFrame,
    partition_attr: str,
    key: str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    keep: str = "last",
) -> DataFrame:
    """``partition with (attr of S) begin ... unique:lengthBatch(key, N)``:
    an independent N-distinct-key tumbling batch chain per partition
    value (Siddhi partitioned execution; the chain semantics per
    instance are UniqueLengthBatchWindowProcessor.java:106,165,210-213
    exactly as in :func:`length_batch`). ``batch_seq`` is 0-based per
    instance."""
    require_column(df, partition_attr, "partition attribute")
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    n = require_pos_int(window_length, "window.length")
    if keep not in ("last", "first"):
        raise ValueError(f"keep must be 'last' or 'first', got {keep!r}")

    out_cols = list(df.columns)
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(BATCH_SEQ, LongType()), StructField(FIRED_AT, LongType())]
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        rows, seqs, fires = _length_batch_assign(
            pdf[key].to_numpy(), pdf[_TS_MS].to_numpy(), n, keep
        )
        out = pdf.iloc[rows][out_cols].copy()
        out[BATCH_SEQ] = pd.Series(seqs, index=out.index, dtype="int64")
        out[FIRED_AT] = pd.Series(fires, index=out.index, dtype="int64")
        return out

    return _partitioned_replay(df, partition_attr, ts, tiebreak, out_schema, replay)


def length_batch_forming_partitioned(
    df: DataFrame,
    partition_attr: str,
    key: str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    keep: str = "last",
) -> DataFrame:
    """Per-instance FORMING contents of a partitioned
    ``unique:lengthBatch`` — the join-probe state
    (:func:`length_batch_forming`, UniqueLengthBatchWindowProcessor.
    java:226-233) with every partition value owning its own forming
    map. Distributes like :func:`length_batch_partitioned`: one
    shuffle on the partition attribute, <= N-1 output rows per
    instance."""
    require_column(df, partition_attr, "partition attribute")
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    n = require_pos_int(window_length, "window.length")
    if keep not in ("last", "first"):
        raise ValueError(f"keep must be 'last' or 'first', got {keep!r}")
    out_cols = list(df.columns)
    out_schema = StructType(list(df.schema.fields))

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        forming: dict = {}
        key_arr = pdf[key].to_numpy()
        for i in range(len(key_arr)):
            k = key_arr[i]
            if k in forming:
                if keep == "last":
                    forming[k] = i
            else:
                forming[k] = i
                if len(forming) == n:
                    forming.clear()
        return pdf.iloc[list(forming.values())][out_cols].copy()

    return _partitioned_replay(df, partition_attr, ts, tiebreak, out_schema, replay)


def time_length_batch_partitioned(
    df: DataFrame,
    partition_attr: str,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
) -> DataFrame:
    """Partitioned ``unique:timeLengthBatch``: every partition value
    runs its own fire chain with its own anchor (without ``start.time``
    each instance anchors at its OWN first event + T, mirroring the
    per-instance ``WindowState`` the reference allocates per partition
    key)."""
    require_column(df, partition_attr, "partition attribute")
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    t_ms = parse_time_ms(window_time, "window.time")
    n = require_pos_int(window_length, "window.length")

    out_cols = list(df.columns)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(BATCH_SEQ, LongType()),
            StructField(FIRED_AT, LongType()),
            StructField(FIRE_REASON, StringType()),
        ]
    )
    fn = _time_length_replay(key, t_ms, n, start_time_ms, out_cols)
    return _partitioned_replay(df, partition_attr, ts, tiebreak, out_schema, fn)


def time_length_batch_expired_partitioned(
    df: DataFrame,
    partition_attr: str,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
) -> DataFrame:
    """Per-instance EXPIRED channel of a partitioned
    ``unique:timeLengthBatch``: the :func:`time_length_batch_expired`
    drain rule applied independently per partition value — each
    instance has its own anchor (its first event unless ``start.time``
    fixes the grid), its own fire log, and its own event-time witness
    clock (the per-instance-clock convention shared with the
    partitioned ``unique:time`` edge and ``expired_channel_partitioned``).
    Batch ``k`` of instance ``p`` drains at
    ``min(p's fire k+1, B_p(k) + T·[k was a length fire])`` where
    ``B_p(k)`` is the instance's first boundary strictly after fire
    ``k``; witnessed iff ``<= max(p's event ts)``.

    Plan shape: the partitioned replay plus a per-instance
    anchor/clock aggregate and a one-row-per-(instance, batch) fire
    log with ``lead`` over it — both tiny, joined back on the
    attribute (AQE broadcasts when they fit)."""
    from pyspark.sql.window import Window

    t_ms = parse_time_ms(window_time, "window.time")
    batched = time_length_batch_partitioned(
        df, partition_attr, key, window_time, window_length,
        ts=ts, tiebreak=tiebreak, start_time_ms=start_time_ms,
    )
    ms = event_ms(df, ts)
    stats = df.groupBy(partition_attr).agg(
        F.min(ms).alias("_anchor"), F.max(ms).alias("_max_ms")
    )
    if start_time_ms is not None:
        stats = stats.withColumn("_anchor", F.lit(start_time_ms).cast("long"))
    fires = batched.select(partition_attr, BATCH_SEQ, FIRED_AT).distinct()
    nxt = fires.withColumn(
        "_next_fire",
        F.lead(FIRED_AT).over(
            Window.partitionBy(partition_attr).orderBy(BATCH_SEQ)
        ),
    ).select(partition_attr, BATCH_SEQ, "_next_fire")
    drain_boundary = (
        F.col("_anchor")
        + (F.floor((F.col(FIRED_AT) - F.col("_anchor")) / t_ms) + 1) * t_ms
        + F.when(F.col(FIRE_REASON) == "length", F.lit(t_ms)).otherwise(F.lit(0))
    )
    return (
        batched.join(nxt, [partition_attr, BATCH_SEQ])
        .join(stats, partition_attr)
        .withColumn(
            "expired_at_ms",
            F.least(drain_boundary.cast("long"), F.col("_next_fire")),
        )
        .filter(F.col("expired_at_ms") <= F.col("_max_ms"))
        .drop("_anchor", "_max_ms", "_next_fire")
    )


def length_batch_all(batched: DataFrame, group_cols=()) -> DataFrame:
    """Single-pass ALL-events channel for a :func:`length_batch`
    result: LEFT-join the shifted fire log of
    :func:`length_batch_expired` and explode each row into its
    channel tags — the expensive batched chain runs once instead of
    once per union branch (Spark does not reuse exchanges across a
    union)."""
    gcols = list(group_cols)
    nxt = (
        batched.select(*gcols, BATCH_SEQ, FIRED_AT).distinct()
        .select(
            *gcols,
            (F.col(BATCH_SEQ) - 1).alias(BATCH_SEQ),
            F.col(FIRED_AT).alias("expired_at_ms"),
        )
    )
    return (
        batched.join(nxt, gcols + [BATCH_SEQ], "left")
        .withColumn(
            "channel",
            F.explode(
                F.when(
                    F.col("expired_at_ms").isNotNull(),
                    F.array(F.lit("current"), F.lit("expired")),
                ).otherwise(F.array(F.lit("current")))
            ),
        )
        .withColumn(
            "expired_at_ms",
            F.when(F.col("channel") == "expired", F.col("expired_at_ms"))
            .cast("long"),
        )
    )


def time_length_batch_all(
    df: DataFrame,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
) -> DataFrame:
    """Single-pass ALL-events channel of ``unique:timeLengthBatch``:
    ONE distributed batched computation joined with the tiny
    next-fire log, each row exploding into its channel tags — the
    union form ran the interval-partitioned aggregation once per
    branch (no exchange reuse across a union). Drain rule and witness
    filter are :func:`time_length_batch_expired`'s exactly."""
    from pyspark.sql.window import Window

    t_ms = parse_time_ms(window_time, "window.time")
    batched = time_length_batch_distributed(
        df, key, window_time, window_length, ts=ts, tiebreak=tiebreak,
        start_time_ms=start_time_ms, _keep_anchor=True,
    )
    fires = batched.select(BATCH_SEQ, FIRED_AT).distinct()
    nxt = fires.withColumn(
        "_next_fire", F.lead(FIRED_AT).over(Window.orderBy(BATCH_SEQ))
    ).select(BATCH_SEQ, "_next_fire")
    drain_boundary = (
        F.col("_anchor")
        + (F.floor((F.col(FIRED_AT) - F.col("_anchor")) / t_ms) + 1) * t_ms
        + F.when(F.col(FIRE_REASON) == "length", F.lit(t_ms)).otherwise(F.lit(0))
    )
    return (
        batched.join(nxt, BATCH_SEQ)
        .withColumn(
            "_exp_at",
            F.least(drain_boundary.cast("long"), F.col("_next_fire")),
        )
        .withColumn(
            "channel",
            F.explode(
                F.when(
                    F.col("_exp_at") <= F.col("_max_ms"),
                    F.array(F.lit("current"), F.lit("expired")),
                ).otherwise(F.array(F.lit("current")))
            ),
        )
        .withColumn(
            "expired_at_ms",
            F.when(F.col("channel") == "expired", F.col("_exp_at"))
            .cast("long"),
        )
        .drop("_anchor", "_max_ms", "_next_fire", "_exp_at")
    )


def time_length_batch_all_partitioned(
    df: DataFrame,
    partition_attr: str,
    key: str,
    window_time: int | str,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
    start_time_ms: int | None = None,
) -> DataFrame:
    """Single-pass ALL-events channel of a PARTITIONED
    ``unique:timeLengthBatch`` — per-instance anchors, fire chains,
    and witness clocks exactly as
    :func:`time_length_batch_expired_partitioned`."""
    from pyspark.sql.window import Window

    t_ms = parse_time_ms(window_time, "window.time")
    batched = time_length_batch_partitioned(
        df, partition_attr, key, window_time, window_length,
        ts=ts, tiebreak=tiebreak, start_time_ms=start_time_ms,
    )
    ms = event_ms(df, ts)
    stats = df.groupBy(partition_attr).agg(
        F.min(ms).alias("_anchor"), F.max(ms).alias("_max_ms")
    )
    if start_time_ms is not None:
        stats = stats.withColumn("_anchor", F.lit(start_time_ms).cast("long"))
    fires = batched.select(partition_attr, BATCH_SEQ, FIRED_AT).distinct()
    nxt = fires.withColumn(
        "_next_fire",
        F.lead(FIRED_AT).over(
            Window.partitionBy(partition_attr).orderBy(BATCH_SEQ)
        ),
    ).select(partition_attr, BATCH_SEQ, "_next_fire")
    drain_boundary = (
        F.col("_anchor")
        + (F.floor((F.col(FIRED_AT) - F.col("_anchor")) / t_ms) + 1) * t_ms
        + F.when(F.col(FIRE_REASON) == "length", F.lit(t_ms)).otherwise(F.lit(0))
    )
    return (
        batched.join(nxt, [partition_attr, BATCH_SEQ])
        .join(stats, partition_attr)
        .withColumn(
            "_exp_at",
            F.least(drain_boundary.cast("long"), F.col("_next_fire")),
        )
        .withColumn(
            "channel",
            F.explode(
                F.when(
                    F.col("_exp_at") <= F.col("_max_ms"),
                    F.array(F.lit("current"), F.lit("expired")),
                ).otherwise(F.array(F.lit("current")))
            ),
        )
        .withColumn(
            "expired_at_ms",
            F.when(F.col("channel") == "expired", F.col("_exp_at"))
            .cast("long"),
        )
        .drop("_anchor", "_max_ms", "_next_fire", "_exp_at")
    )
