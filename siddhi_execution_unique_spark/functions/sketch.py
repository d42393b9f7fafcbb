"""Distributed sketches for cardinality and multi-resolution rollups.
(Beyond-reference scope — SURVEY.md §7 phase 4; the reference's
per-key distinct tracking — UniqueEverWindowProcessor.java:84-93 —
is exact and unbounded; these are the bounded-memory estimates a
100 TB pipeline uses for the same questions.)

KMV (k-minimum-values, Bar-Yossef et al. 2002) instead of HLL:
Spark's ``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_count_distinct`` (their HLL) use different hash functions and
register layouts, so their estimates can never hash-compare. KMV with
a shared md5-derived hash is bit-reproducible on BOTH engines — a
sketch whose estimate has an exact oracle. It is also mergeable
(the union's sketch is the k smallest of the merged value sets), which
is what makes it a partial-aggregation-friendly distributed sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

P = 1_000_000_007
KMV_K = 32

_HASH_SPARK = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"
    f" % {P}"
)
_HASH_DUCK = (
    "CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    f" % {P}"
)


def kmv_distinct(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """KMV distinct-user estimate per event_type, alongside the exact
    count so the entry doubles as an accuracy report. Output:
    (event_type, n_exact, kmv_estimate).

    Estimator: hash every user to a uniform point in [0, 1); the k-th
    smallest distinct hash u_k of a set of n uniform points sits at
    ~k/n, so n ≈ (k-1)/u_k (the unbiased form). When fewer than k
    distinct values exist the sketch IS the value set and the count is
    exact.

    Scale shape: the corpus-sized stage is the DISTINCT (one partially
    aggregating shuffle on (event_type, hash) — map-side combine caps
    each partition's output at its distinct-key count). The row_number
    window then runs on distinct users only; at 100 TB you'd swap it
    for a per-partition k-smallest heap + merge (same two-phase shape
    the sketch's mergeability guarantees exists)."""
    if k < 2:
        raise ValueError(f"KMV needs k >= 2, got {k}")
    hashes = (
        events.select("event_type", F.expr(_HASH_SPARK).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_exact"),
            F.max(F.when(F.col("rn") <= k, F.col("hv"))).alias("kth"),
        )
        .select(
            "event_type",
            "n_exact",
            F.when(F.col("n_exact") < k, F.col("n_exact").cast("double"))
            .otherwise(F.expr(f"round(({k} - 1) * cast({P} as double) / kth, 3)"))
            .alias("kmv_estimate"),
        )
    )


def kmv_distinct_oracle(k: int = KMV_K) -> str:
    return f"""
        WITH h AS (
          SELECT DISTINCT event_type, {_HASH_DUCK} AS hv FROM events
        ),
        ranked AS (
          SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
          FROM h
        )
        SELECT event_type, count(*) AS n_exact,
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                    ELSE round(({k} - 1) * CAST({P} AS DOUBLE)
                               / max(CASE WHEN rn <= {k} THEN hv END), 3)
               END AS kmv_estimate
        FROM ranked GROUP BY event_type
    """


HOUR_MS = 3_600_000
DAY_MS = 86_400_000


def time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style multi-resolution rollup: event counts and
    value sums per (event_type, day, hour) with ROLLUP subtotals
    (hour → day → event_type → grand total) in ONE aggregation pass.
    Rolled-up grain columns are folded to -1 so every row is
    self-describing. Output: (event_type, day_ms, hour_ms, n_events,
    value_sum).

    ``value`` is a double; a double sum's value depends on partition
    merge order, so the sum is fixed-point quantized per row (milli
    units, exact bigint adds — same determinism pattern as
    ``similarity.cell_centroids``) and scaled back once at the end.
    The rollup itself is Spark's native partial-aggregating ROLLUP:
    map-side combine emits at most (cells × 4 grouping sets) rows per
    partition regardless of corpus size."""
    bucketed = events.select(
        "event_type",
        F.expr(f"(unix_millis(ts) div {DAY_MS}) * {DAY_MS}").alias("day_ms"),
        F.expr(f"(unix_millis(ts) div {HOUR_MS}) * {HOUR_MS}").alias("hour_ms"),
        F.expr("cast(round(value * 1000) as bigint)").alias("qv"),
    )
    rolled = bucketed.rollup("event_type", "day_ms", "hour_ms").agg(
        F.count("*").alias("n_events"), F.sum("qv").alias("qsum")
    )
    return rolled.select(
        F.expr("coalesce(event_type, '<all>')").alias("event_type"),
        F.expr("coalesce(day_ms, -1)").alias("day_ms"),
        F.expr("coalesce(hour_ms, -1)").alias("hour_ms"),
        "n_events",
        # cast: both engines parse a bare `1000.0` literal as DECIMAL,
        # whose division rounds differently from IEEE doubles
        F.expr("qsum / cast(1000 as double)").alias("value_sum"),
    )


def time_rollup_oracle() -> str:
    return f"""
        WITH bucketed AS (
          SELECT event_type,
                 (epoch_ms(ts) // {DAY_MS}) * {DAY_MS} AS day_ms,
                 (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS hour_ms,
                 CAST(round(value * 1000) AS BIGINT) AS qv
          FROM events
        ),
        rolled AS (
          SELECT event_type, day_ms, hour_ms, count(*) AS n_events,
                 CAST(sum(qv) AS BIGINT) AS qsum
          FROM bucketed GROUP BY ROLLUP (event_type, day_ms, hour_ms)
        )
        SELECT coalesce(event_type, '<all>') AS event_type,
               coalesce(day_ms, -1) AS day_ms,
               coalesce(hour_ms, -1) AS hour_ms,
               n_events,
               qsum / CAST(1000 AS DOUBLE) AS value_sum
        FROM rolled
    """
