"""Structured Streaming twins of the uniqueness operators (SURVEY.md
§7 phase 3).

The reference is a CEP engine: events arrive one at a time, state
lives in per-key maps, timers flush windows
(UniqueTimeWindowProcessor.java:118-125). Structured Streaming's
micro-batch model maps onto this directly:

- state maps            → streaming state store, hash-partitioned by key
- ``persist()/restore`` → checkpointLocation (exactly-once resume)
- scheduler / TIMER     → watermarks + state timeouts
- current vs expired    → output modes (append / update)

Each twin is the idiomatic Spark formulation; where Spark's primitive
diverges from the reference's exact semantics (noted per function),
the exact variant runs through ``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from siddhi_execution_unique_spark.operators.validation import (
    key_cols,
    parse_time_ms,
    require_column,
    require_keys,
)


def first_stream(df: DataFrame, keys) -> DataFrame:
    """Streaming ``unique:first``: exact — Spark's streaming
    ``dropDuplicates`` keeps the first arrival per key forever
    (reference: UniqueFirstWindowProcessor.java:129-132). Append mode.

    State grows with distinct keys, like the reference (its documented
    OOM caveat, README.md:27); bound it with
    :func:`deduplicate_stream` when the key space is unbounded."""
    keys = require_keys(keys)
    return df.dropDuplicates([k if isinstance(k, str) else k._jc.toString() for k in keys])


def ever_stream(df: DataFrame, keys, ts: str = "ts") -> DataFrame:
    """Streaming ``unique:ever``: latest event per key, re-emitted on
    every replacement — exactly the reference's update-per-arrival
    behavior (UniqueEverWindowProcessor.java:153-166) in **update**
    output mode via a keyed ``max_by`` aggregation."""
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*key_cols(keys))
        .agg(F.max_by(payload, F.col(ts)).alias("_retained"))
        .select("_retained.*")
    )


def deduplicate_stream(
    df: DataFrame, keys, time_interval: int | str, ts: str = "ts"
) -> DataFrame:
    """Streaming ``unique:deduplicate`` via watermarked dedup: a key
    is dropped while a prior arrival is inside the watermark window
    and re-admitted after. Append mode; state is evicted by the
    watermark — bounded, unlike ``first_stream``.

    Divergence from the reference (DeduplicateStreamProcessor.java:
    158-171): Spark anchors eviction to the watermark (observed max
    event time - delay) rather than per-event spacing, so re-admission
    timing can differ by up to one micro-batch; use
    :func:`deduplicate_exact_stream` for the exact anchored chain."""
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    interval_ms = parse_time_ms(time_interval, "time.interval")
    key_names = [k if isinstance(k, str) else k._jc.toString() for k in keys]
    return df.withWatermark(ts, f"{interval_ms} milliseconds").dropDuplicatesWithinWatermark(
        key_names
    )


_DEDUP_STATE = StructType([StructField("last_kept_ms", LongType())])


def deduplicate_exact_stream(
    df: DataFrame, key: str, time_interval: int | str, ts: str = "ts"
) -> DataFrame:
    """Exact streaming ``unique:deduplicate``: per-key anchored chain
    (keep iff ``ts - last_kept_ts > interval``, anchor only advances
    on *kept* events) in ``applyInPandasWithState``. State is one long
    per key, hash-partitioned — distributes to any key cardinality.

    Events are processed in event-time order within each micro-batch;
    cross-batch disorder beyond that is the stream's own ordering
    contract (the reference assumes arrival order too)."""
    require_column(df, key, "unique.key")
    require_column(df, ts, "ts")
    interval_ms = parse_time_ms(time_interval, "time.interval")
    out_schema = df.schema
    ts_is_timestamp = str(df.schema[ts].dataType) in ("TimestampType()", "TimestampNTZType()")

    def fn(
        key_tuple: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last_kept_ms,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts, kind="mergesort")
            if ts_is_timestamp:
                ms = (pdf[ts].astype("int64") // 1_000_000).to_numpy()
            else:
                ms = pdf[ts].to_numpy()
            keep = [False] * len(pdf)
            for i, m in enumerate(ms):
                if last_kept_ms is None or m - last_kept_ms > interval_ms:
                    last_kept_ms = int(m)
                    keep[i] = True
            out = pdf.loc[keep]
            if not out.empty:
                yield out
        if last_kept_ms is not None:
            state.update((int(last_kept_ms),))

    return df.groupBy(key).applyInPandasWithState(
        fn, out_schema, _DEDUP_STATE, "append", GroupStateTimeout.NoTimeout
    )


def tumbling_batch_stream(
    df: DataFrame,
    keys,
    window_time: int | str,
    ts: str = "ts",
    keep: str = "last",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming ``unique:timeBatch`` / ``unique:firstTimeBatch`` /
    ``unique:externalTimeBatch``: event-time tumbling window + keyed
    retain-one aggregation, watermark-driven flush. Append mode — a
    batch emits once its window closes (the streaming analog of the
    reference's boundary fire, UniqueTimeBatchWindowProcessor.java:
    235-266). The reference's ``time.out`` idle flush maps to the
    watermark delay."""
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    window_ms = parse_time_ms(window_time, "window.time")
    if keep not in ("last", "first"):
        raise ValueError(f"keep must be 'last' or 'first', got {keep!r}")
    payload = F.struct(*[F.col(c) for c in df.columns])
    agg = (
        F.max_by(payload, F.col(ts)) if keep == "last" else F.min_by(payload, F.col(ts))
    )
    win = F.window(ts, f"{window_ms} milliseconds")
    return (
        df.withWatermark(ts, watermark_delay)
        .groupBy(win, *key_cols(keys))
        .agg(agg.alias("_retained"))
        .select(
            F.unix_millis(F.col("window.start")).alias("batch_start_ms"),
            F.unix_millis(F.col("window.end")).alias("batch_end_ms"),
            "_retained.*",
        )
    )
