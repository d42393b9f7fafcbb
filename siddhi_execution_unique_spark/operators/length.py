"""``unique:length`` — sliding buffer of the last ``N`` unique keys
(reference: component/src/main/java/io/siddhi/extension/execution/
unique/UniqueLengthWindowProcessor.java:99; replace :148-157, FIFO
evict :158-166).

In the reference, a duplicate key *moves to the back* of the FIFO (the
old event is removed from the expired chunk and the new clone appended,
:153-157), so the window contents are exactly: the latest event per
key, ranked by that latest event's time, top ``N``. That is what
:func:`length_window` computes — ``max_by`` per key (one shuffle), then
a global top-N, which Spark executes as TakeOrderedAndProject (per-
partition heaps + merge, no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siddhi_execution_unique_spark.operators.keyed import ever
from siddhi_execution_unique_spark.operators.validation import (
    require_column,
    require_keys,
    require_pos_int,
)


def length_window(
    df: DataFrame,
    keys,
    window_length: int,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Final contents of ``unique:length``: the ``N`` most recent
    distinct keys' latest events."""
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    n = require_pos_int(window_length, "window.length")
    latest = ever(df, keys, ts=ts, tiebreak=tiebreak)
    order = [F.col(ts).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    return latest.orderBy(*order).limit(n)
