"""``unique:time`` — sliding time window of length ``T`` with unique
keys: an event expires ``T`` after arrival, or immediately when its key
is replaced by a newer arrival (reference: component/src/main/java/io/
siddhi/extension/execution/unique/UniqueTimeWindowProcessor.java:108,
put+schedule :176-188, expiry/replace loop :191-212).

Batch semantics are the window's **final contents**: events within the
trailing ``T`` of the maximum event time, reduced to the latest event
per key. The trailing-edge anchor is a broadcast scalar aggregate (one
tiny extra stage); the per-key reduction reuses the single-shuffle
``max_by`` shape from :mod:`..keyed`. Emission-log (per-arrival delta)
semantics only exist in streaming — see
:mod:`siddhi_execution_unique_spark.streaming`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siddhi_execution_unique_spark.operators.keyed import ever
from siddhi_execution_unique_spark.operators.time_batch import event_ms
from siddhi_execution_unique_spark.operators.validation import (
    parse_time_ms,
    require_column,
    require_keys,
    stage_keys,
)


def time_window(
    df: DataFrame,
    keys,
    window_time: int | str,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Final contents of ``unique:time``: latest event per key among
    events with ``ts > max(ts) - T``."""
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    window_ms = parse_time_ms(window_time, "window.time")
    ms = event_ms(df, ts)
    edge = df.agg(F.max(ms).alias("_max_ms"))
    live = (
        df.crossJoin(F.broadcast(edge))
        .filter(ms > F.col("_max_ms") - F.lit(window_ms))
        .drop("_max_ms")
    )
    return ever(live, keys, ts=ts, tiebreak=tiebreak)


def time_window_expired(
    df: DataFrame,
    keys,
    window_time: int | str,
    ts: str = "ts",
    *,
    tiebreak: str,  # required: addresses the retained row uniquely
) -> DataFrame:
    """The EXPIRED channel of ``unique:time`` over a finite run: every
    event that has left the window — expired by the ``T`` timer
    (UniqueTimeWindowProcessor.java:176-188) or replaced by a newer
    same-key arrival (:191-212). Over a full replay that is the exact
    complement of the final contents, computed as a left-anti equi-join
    on ``(keys, ts, tiebreak)`` — one extra shuffle, no per-key sort,
    AQE-splittable on hot keys (same design as ``keyed.ever_expired``)."""
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    require_column(df, tiebreak, "tiebreak")
    staged, key_names, generated = stage_keys(df, keys)
    retained = time_window(staged, key_names, window_time, ts=ts, tiebreak=tiebreak)
    on = key_names + [ts, tiebreak]
    out = staged.join(retained.select(*on), on, "left_anti")
    return out.drop(*generated) if generated else out
