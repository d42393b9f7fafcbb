"""As-of (point-in-time) join — the classic time-series operator Spark
lacks as a built-in. For every left row, attach the latest right row
with the same key and ``right.ts <= left.ts``.
(Beyond-reference scope — SURVEY.md §7 phase 4; the reference's
closest analogue is the per-key "latest state" that ``unique:ever``
maintains, UniqueEverWindowProcessor.java:84-93 — an as-of join is
that lookup evaluated at each left row's own timestamp.)

Spark-first design — the sorted-merge encoding: UNION the two sides
with a side tag, hash-partition by key, sort within each partition by
(ts, side, right payload), and carry the last non-null right payload
forward with one running window. That is ONE shuffle on the join key
and a partition-local sort — no range-join candidate explosion, no
per-key driver loop — so it scales exactly like any keyed aggregation
(the 1000-executor plan is hash exchange + sort + window, all
codegen). A right row at the same timestamp as a left row sorts
FIRST (side 0 < 1), so "at or before" is inclusive; ties among right
rows at the same timestamp resolve to the greatest payload tuple
(deterministic — the window takes the LAST of the ascending struct
order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of left join. All ``left`` columns are preserved;
    every non-key ``right`` column (and its timestamp) is appended
    under ``right_prefix``, NULL when the key has no right row at or
    before the left timestamp."""
    keys = [on] if isinstance(on, str) else list(on)
    for frame, label in ((left, "left"), (right, "right")):
        missing = [c for c in keys + [ts] if c not in frame.columns]
        if missing:
            raise ValueError(f"asof_join: {label} frame lacks column(s) {missing}")
    payload = [c for c in right.columns if c not in keys and c != ts]
    if not payload:
        raise ValueError("asof_join: right frame has no payload columns")
    r_struct = F.struct(
        F.col(ts).alias(f"{right_prefix}{ts}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
    )
    r = right.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    r_type = r.schema["__r"].dataType
    l = left.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_type).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l.unionByName(r)
        .withColumn("__asof", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select("__l.*", "__asof.*")
    )


def purchases_with_last_click(events: DataFrame) -> DataFrame:
    """Driver entry: for each ``purchase`` event, the same user's most
    recent ``click`` at or before it. Output: (purchase_id, user_id,
    ts_ms, click_id, gap_ms) — click columns -1 when the user had not
    clicked yet (a sentinel, not NULL: NULL→NaN makes the pandas
    value-compare and the driver hash unstable)."""
    ev = events.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "event_type"
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_ms"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_ms", F.col("event_id").alias("click_id")
    )
    j = asof_join(left, right, on="user_id", ts="ts_ms")
    return j.select(
        "purchase_id",
        "user_id",
        "ts_ms",
        F.coalesce(F.col("r_click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("ts_ms") - F.col("r_ts_ms"), F.lit(-1)).alias("gap_ms"),
    )


def purchases_with_last_click_oracle() -> str:
    """Window-formulated oracle (NOT DuckDB's native ASOF JOIN, whose
    pick among equal-timestamp right rows is unspecified): rank each
    purchase's candidate clicks by (ts DESC, click_id DESC) and keep
    rank 1 — the same "greatest (ts, payload)" rule the Spark side
    implements."""
    return """
        WITH p AS (
          SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS ts_ms
          FROM events WHERE event_type = 'purchase'
        ),
        c AS (
          SELECT event_id AS click_id, user_id, epoch_ms(ts) AS ts_ms
          FROM events WHERE event_type = 'click'
        )
        SELECT purchase_id, user_id, ts_ms, click_id, gap_ms FROM (
          SELECT p.purchase_id, p.user_id, p.ts_ms,
                 COALESCE(c.click_id, -1) AS click_id,
                 COALESCE(p.ts_ms - c.ts_ms, -1) AS gap_ms,
                 row_number() OVER (PARTITION BY p.purchase_id
                                    ORDER BY c.ts_ms DESC, c.click_id DESC) AS rn
          FROM p LEFT JOIN c
            ON c.user_id = p.user_id AND c.ts_ms <= p.ts_ms
        ) WHERE rn = 1
    """


# ---------------------------------------------------------------------
# Banded range join: aggregate right rows inside a trailing interval

HOUR_MS = 3_600_000


def clicks_before_purchase(events: DataFrame, window_ms: int = HOUR_MS) -> DataFrame:
    """Range join, the bucket-banded way: for each ``purchase``, the
    count and value sum of the same user's ``click`` events in
    ``(ts - window_ms, ts]``. Output: (purchase_id, user_id, ts_ms,
    n_clicks_1h, click_value_1h).

    A naive inequality join (``c.ts BETWEEN p.ts - w AND p.ts``) has
    no equi-key for hashing, so Spark would fall back to
    BroadcastNestedLoopJoin — quadratic. Instead both sides are
    bucketed to ``window_ms`` bands: a trailing window of width w can
    only overlap a row's own band and the one before, so each purchase
    probes exactly TWO band keys (explode of a 2-element array) and the
    join is a plain hash equi-join on (user_id, band). Candidates per
    purchase are bounded by the user's clicks in 2w of wall time —
    independent of corpus size. The exact range predicate then filters
    candidates inside the aggregation (conditional sums), and a LEFT
    join keeps zero-click purchases with count 0. The click value sum
    is fixed-point quantized (milli units) before aggregation so the
    double total is order-independent (see sketch.time_rollup).
    """
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    ev = events.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"),
        "event_type", "value",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts_ms",
        F.expr(f"ts_ms div {window_ms}").alias("band"),
    )
    probes = p.withColumn(
        "pband", F.explode(F.array(F.col("band"), F.col("band") - 1))
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts_ms").alias("c_ts"),
        F.expr(f"ts_ms div {window_ms}").alias("cband"),
        F.expr("cast(round(value * 1000) as bigint)").alias("qv"),
    )
    in_range = (F.col("c_ts") > F.col("ts_ms") - window_ms) & (
        F.col("c_ts") <= F.col("ts_ms")
    )
    return (
        probes.join(
            c,
            (F.col("user_id") == F.col("c_user")) & (F.col("pband") == F.col("cband")),
            "left",
        )
        .groupBy("purchase_id", "user_id", "ts_ms")
        .agg(
            F.coalesce(F.sum(F.when(in_range, F.lit(1))), F.lit(0)).alias(
                "n_clicks_1h"
            ),
            F.expr(
                "coalesce(sum(case when c_ts > ts_ms - {w} and c_ts <= ts_ms "
                "then qv end), 0) / cast(1000 as double)".format(w=window_ms)
            ).alias("click_value_1h"),
        )
    )


def clicks_before_purchase_oracle(window_ms: int = HOUR_MS) -> str:
    return f"""
        WITH p AS (
          SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS ts_ms
          FROM events WHERE event_type = 'purchase'
        ),
        c AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 CAST(round(value * 1000) AS BIGINT) AS qv
          FROM events WHERE event_type = 'click'
        )
        SELECT p.purchase_id, p.user_id, p.ts_ms,
               CAST(coalesce(sum(CASE WHEN c.ts_ms IS NOT NULL THEN 1 END), 0)
                    AS BIGINT) AS n_clicks_1h,
               coalesce(sum(qv), 0) / CAST(1000 AS DOUBLE) AS click_value_1h
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts_ms > p.ts_ms - {window_ms} AND c.ts_ms <= p.ts_ms
        GROUP BY 1, 2, 3
    """
