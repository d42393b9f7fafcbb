"""Siddhi-name dispatch: address every operator by the name a
`siddhi-execution-unique` user already knows (``unique:ever``,
``unique:timeBatch``, ...), so switching means changing the import,
not relearning the surface.

Batch::

    from siddhi_execution_unique_spark.api import window, stream_processor
    out = window(df, "unique:ever", "user_id", ts="ts", tiebreak="event_id")
    out = window(df, "unique:timeBatch", "user_id", window_time="1 hour", ts="ts")
    out = stream_processor(df, "unique:deduplicate", "user_id",
                           time_interval="1 sec", ts="ts")

Streaming (Structured Streaming twins)::

    from siddhi_execution_unique_spark.api import streaming_window
    out = streaming_window(sdf, "unique:first", "user_id")

Parameter names follow the Siddhi docs (`window.time` -> window_time,
`window.length` -> window_length, `start.time` -> start_time_ms,
`time.out` -> idle_timeout); time constants accept the same sugar the
reference does ("1 sec", "500 milliseconds").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from siddhi_execution_unique_spark import operators as ops
from siddhi_execution_unique_spark import streaming as stw

_WINDOWS = {
    "ever": ops.ever,
    "first": ops.first,
    "length": ops.length_window,
    "lengthBatch": ops.length_batch,
    "firstLengthBatch": ops.first_length_batch,
    "time": ops.time_window,
    "timeBatch": ops.time_batch,
    "firstTimeBatch": ops.first_time_batch,
    "timeLengthBatch": ops.time_length_batch_distributed,
    "externalTimeBatch": ops.external_time_batch,
}

_STREAM_PROCESSORS = {
    "deduplicate": ops.deduplicate,
}

def _keep_first(fn):
    def wrapped(df, *args, **kwargs):
        kwargs.setdefault("keep", "first")
        return fn(df, *args, **kwargs)

    return wrapped


_STREAMING = {
    "ever": stw.ever_stream,
    "first": stw.first_stream,
    "length": stw.length_window_stream,
    "lengthBatch": stw.length_batch_stream,
    "firstLengthBatch": _keep_first(stw.length_batch_stream),
    "time": stw.time_window_stream,
    "timeBatch": stw.tumbling_batch_stream,
    "firstTimeBatch": _keep_first(stw.tumbling_batch_stream),
    "timeLengthBatch": stw.time_length_batch_stream,
    "externalTimeBatch": stw.external_time_batch_stream,
    "deduplicate": stw.deduplicate_exact_stream,
    # opt-in PROCESSING-TIME tier (r13): wall-clock arrival stamping
    # + true TIMER idle flushes (ProcessingTimeTimeout) — the
    # reference's default clock; non-deterministic, replay-clock
    # pytest-pinned rather than oracle-checked
    "time:processing": stw.time_window_proc_stream,
    "deduplicate:processing": stw.deduplicate_proc_stream,
}


def _strip(name: str) -> str:
    return name.split(":", 1)[1] if name.startswith("unique:") else name


def _lookup(table: dict, name: str, kind: str):
    key = _strip(name)
    if key not in table:
        raise ValueError(
            f"unknown {kind} {name!r}; expected one of "
            f"{sorted('unique:' + k for k in table)}"
        )
    return table[key]


def window(df: DataFrame, name: str, *args, **kwargs) -> DataFrame:
    """Batch form of a ``unique:*`` window by its Siddhi name."""
    return _lookup(_WINDOWS, name, "window")(df, *args, **kwargs)


def stream_processor(df: DataFrame, name: str, *args, **kwargs) -> DataFrame:
    """Batch form of a ``unique:*`` stream processor by its Siddhi name."""
    return _lookup(_STREAM_PROCESSORS, name, "stream processor")(df, *args, **kwargs)


def streaming_window(df: DataFrame, name: str, *args, **kwargs) -> DataFrame:
    """Structured Streaming twin of a ``unique:*`` operator by name."""
    return _lookup(_STREAMING, name, "streaming window")(df, *args, **kwargs)
