"""Gap-based sessionization of event streams — the event-log prep
step a behavioral-training pipeline runs before feature extraction.
(Beyond-reference scope — SURVEY.md §7 phase 4; the reference has no
session windows at all, SURVEY.md §2b "explicitly absent".)

A session is a maximal run of one user's events where consecutive
gaps are <= ``gap_ms``. Session assignment is the textbook
distributable form: a lag-comparison flag plus a running sum, both
window functions PARTITIONED BY user — no state beyond one partition,
no global order, skew bounded by the busiest single user. One shuffle
on user_id serves both windows and the final per-session aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_ms: int,
    user: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """One row per session: (user, session_seq, start/end epoch-millis,
    n_events, n_event_types). ``session_seq`` numbers a user's sessions
    in time order from 1."""
    if gap_ms <= 0:
        raise ValueError(f"gap_ms must be > 0, got {gap_ms}")
    w = Window.partitionBy(user).orderBy(ts, tiebreak)
    ms = F.unix_millis(F.col(ts))
    flagged = events.withColumn(
        "_new_session",
        F.when(
            (ms - F.lag(ms).over(w) > gap_ms) | F.lag(ms).over(w).isNull(), 1
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(user, "session_seq").agg(
        F.min(ms).alias("session_start_ms"),
        F.max(ms).alias("session_end_ms"),
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


def sessionize_oracle(gap_ms: int) -> str:
    return f"""
        WITH flagged AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {gap_ms}
                      OR lag(epoch_ms(ts)) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
          SELECT *, CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq,
               min(ts_ms) AS session_start_ms,
               max(ts_ms) AS session_end_ms,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_event_types
        FROM numbered
        GROUP BY user_id, session_seq
    """


def session_window_native(
    events: DataFrame,
    gap_ms: int,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Gap sessions via Spark's NATIVE ``session_window`` aggregate —
    the Catalyst-managed sibling of :func:`sessionize`. The engine
    merges overlapping per-event windows ``[ts, ts+gap)`` itself (and
    in streaming mode manages their state + watermark eviction), so
    this form needs no window functions at all: ONE
    groupBy(user, session_window) aggregation, one shuffle.

    Boundary semantics differ from :func:`sessionize` by design and
    are pinned by the oracle: the native window BREAKS at
    ``diff >= gap`` (windows merge only when they overlap), while the
    lag-form breaks at ``diff > gap``; and the native session end is
    ``last_ts + gap``, not ``last_ts``. Output: (user,
    session_start_ms, session_end_ms, n_events, n_event_types)."""
    if gap_ms <= 0:
        raise ValueError(f"gap_ms must be > 0, got {gap_ms}")
    if gap_ms % 1000:
        raise ValueError(f"gap_ms must be whole seconds, got {gap_ms}")
    sw = F.session_window(F.col(ts), f"{gap_ms // 1000} seconds")
    return (
        events.groupBy(F.col(user), sw.alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        .select(
            user,
            F.unix_millis("sw.start").alias("session_start_ms"),
            F.unix_millis("sw.end").alias("session_end_ms"),
            "n_events",
            "n_event_types",
        )
    )


def session_window_native_oracle(gap_ms: int) -> str:
    """Gaps-and-islands mirror of the NATIVE semantics: break at
    ``diff >= gap``, session end = last event + gap."""
    return f"""
        WITH flagged AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= {gap_ms}
                      OR lag(epoch_ms(ts)) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
          SELECT *, sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_seq
          FROM flagged
        )
        SELECT user_id,
               min(ts_ms) AS session_start_ms,
               max(ts_ms) + {gap_ms} AS session_end_ms,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_event_types
        FROM numbered
        GROUP BY user_id, session_seq
    """
