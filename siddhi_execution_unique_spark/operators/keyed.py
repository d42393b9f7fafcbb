"""``unique:ever`` and ``unique:first`` — retain one event per key over
all history.

Reference semantics:
- ``unique:ever`` keeps the **latest** event per key; a replaced event
  is re-emitted on the expired channel (reference:
  component/src/main/java/io/siddhi/extension/execution/unique/
  UniqueEverWindowProcessor.java:122,153-166; multi-key :216-222).
- ``unique:first`` keeps the **first** event per key and silently drops
  later duplicates; it never emits expired events (reference:
  UniqueFirstWindowProcessor.java:99,129-132).

Spark-first design: one keyed aggregation — ``groupBy(keys).agg(
max_by(struct(*cols), struct(ts, tiebreak)))``. This is a single
shuffle with map-side partial aggregation (each task keeps one row per
key before the exchange), so shuffle volume is bounded by distinct-key
cardinality per partition — exactly the distribution-friendly shape of
the reference's key-addressed hash map, minus the single-JVM limit.
Physically Spark picks SortAggregate for struct-valued ``max_by``
(variable-width agg buffer), but the sort is per input partition and
the partial combine still happens before the exchange; a
window-function formulation (``row_number() over (partition by key
order by ts desc) = 1``) would instead shuffle EVERY row and sort full
key partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from siddhi_execution_unique_spark.operators.validation import (
    key_cols,
    require_column,
    require_keys,
    stage_keys,
)


def _retain_one_per_key(
    df: DataFrame,
    keys: list[str | Column],
    ts: str,
    tiebreak: str | None,
    keep: str,
) -> DataFrame:
    require_column(df, ts, "ts")
    if tiebreak is not None:
        require_column(df, tiebreak, "tiebreak")
    order_cols = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    order = F.struct(*order_cols) if len(order_cols) > 1 else order_cols[0]
    payload = F.struct(*[F.col(c) for c in df.columns])
    agg = F.max_by(payload, order) if keep == "last" else F.min_by(payload, order)
    grouped = df.groupBy(*key_cols(keys)).agg(agg.alias("_retained"))
    # For plain-name keys, output the GROUPING column (identical value
    # by construction) instead of the struct field: `_retained.key` is
    # a fresh attribute Catalyst cannot link to the aggregation's hash
    # distribution, so every downstream keyed join/agg would re-shuffle
    # — on a bucketed source this is the difference between a
    # zero-exchange co-located join and an avoidable exchange.
    simple = {k for k in keys if isinstance(k, str) and k in df.columns}
    return grouped.select(
        *[
            (F.col(c) if c in simple else F.col(f"_retained.{c}")).alias(c)
            for c in df.columns
        ]
    )


def ever(
    df: DataFrame,
    keys: str | Column | list[str | Column],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest event per unique key over all history (``unique:ever``).

    ``keys`` may be one or many column names/expressions; the reference
    concatenates multi-key string forms into one map key
    (UniqueEverWindowProcessor.java:216-222) — a composite groupBy key
    is semantically identical and keeps the native column types.

    ``ts`` orders events (event-time stand-in for the reference's
    arrival order); ``tiebreak`` (e.g. ``event_id``) makes equal-``ts``
    replays deterministic.

    For the replaced-events (expired) channel, see :func:`ever_expired`.
    """
    keys = require_keys(keys)
    return _retain_one_per_key(df, keys, ts, tiebreak, keep="last")


def first(
    df: DataFrame,
    keys: str | Column | list[str | Column],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """First event per unique key over all history (``unique:first``)."""
    keys = require_keys(keys)
    return _retain_one_per_key(df, keys, ts, tiebreak, keep="first")


def ever_expired(
    df: DataFrame,
    keys: str | Column | list[str | Column],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """The expired channel of ``unique:ever``: every event that was
    later replaced by a newer event with the same key (reference emits
    the old event as EXPIRED on replacement,
    UniqueEverWindowProcessor.java:153-166).

    Implemented as an anti-selection: all rows minus the retained row
    per key. With a ``tiebreak`` column the retained row is uniquely
    addressed by ``(keys, ts, tiebreak)``, so this is a left-anti
    equi-join against the (one-row-per-key) retained set — partial-agg
    shuffle + join, no per-key sort, and a heavy-hitter key is handled
    by AQE's skew-join split rather than serializing one task. Without
    a tiebreak the retained choice among equal-``ts`` rows is
    positional, so a window ``row_number`` fallback preserves the
    exact complement.
    """
    keys = require_keys(keys)
    require_column(df, ts, "ts")
    if tiebreak is not None:
        require_column(df, tiebreak, "tiebreak")
        staged, key_names, generated = stage_keys(df, keys)
        retained = _retain_one_per_key(staged, key_names, ts, tiebreak, keep="last")
        on = key_names + [ts, tiebreak]
        out = staged.join(retained.select(*on), on, "left_anti")
        return out.drop(*generated) if generated else out
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols(keys)).orderBy(F.col(ts).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )
