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
