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


KMV_SPLITS = 32


def kmv_distinct(events: DataFrame, k: int = KMV_K, n_splits: int = KMV_SPLITS) -> DataFrame:
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
    each partition's output at its distinct-key count). The k-smallest
    selection is then TWO-PHASE, exploiting KMV's mergeability: the
    distinct hashes salt into ``n_splits`` deterministic slices
    (``hv % n_splits``), a window ranks WITHIN each (type, salt) slice
    — partitions bounded by distinct/n_splits, never all of one
    event_type in a task — and the exact k-smallest of the union of
    the k·n_splits survivors is a second window over that tiny set.
    ``n_exact`` rides the same salted shuffle as a per-slice count
    summed over the O(types × n_splits)-row aggregate, so no stage
    ever sorts or counts a whole event_type in one task."""
    if k < 2:
        raise ValueError(f"KMV needs k >= 2, got {k}")
    if n_splits < 1:
        raise ValueError(f"KMV needs n_splits >= 1, got {n_splits}")
    hashes = (
        events.select("event_type", F.expr(_HASH_SPARK).alias("hv"))
        .distinct()
        .withColumn("salt", F.col("hv") % n_splits)
    )
    # phase 1: k-smallest + count per salt slice (both windows share
    # the (event_type, salt) partitioning -> one exchange)
    w_rank = Window.partitionBy("event_type", "salt").orderBy("hv")
    w_cnt = Window.partitionBy("event_type", "salt")
    local = (
        hashes.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("scnt", F.count("*").over(w_cnt))
        .filter(F.col("rn") <= k)
    )
    counts = (
        local.filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.sum("scnt").alias("n_exact"))
    )
    # phase 2: exact k-smallest of the merged survivors (<= k*n_splits
    # rows per type)
    w_merge = Window.partitionBy("event_type").orderBy("hv")
    kth = (
        local.select("event_type", "hv")
        .withColumn("mrn", F.row_number().over(w_merge))
        .filter(F.col("mrn") <= k)
        .groupBy("event_type")
        .agg(F.max("hv").alias("kth"))
    )
    return (
        counts.join(F.broadcast(kth), "event_type")
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


def running_distinct_count(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Per event, how many distinct ``key`` values its ``group`` has
    seen so far — a running COUNT(DISTINCT) in (ts, tiebreak) arrival
    order. Output: (tiebreak, group, n_distinct_users_so_far).

    Scale shape: a running aggregate over a LOW-cardinality group is
    the classic single-task trap — ``Window.partitionBy(group)`` pulls
    every row of a popular group through one sort task. This is the
    two-phase range-bucket prefix sum instead (the same shape as
    ``curation.pack_training_shards``):

    (1) first-occurrence flags come from a window keyed on
        (group, key) — high-cardinality partitions, no skew;
    (2) events range-bucket on the event-time axis (bucket bounds from
        ONE 1-row min/max aggregate, broadcast — ts order is preserved
        across buckets because the bucket id is monotone in ts); the
        running sum is a window on (group, bucket) — parallelism
        n_groups × n_buckets — and each bucket's starting offset is a
        prefix sum over the O(n_groups × n_buckets)-row per-bucket
        totals, broadcast back.

    No window in the plan partitions on ``group`` alone, so the plan
    survives a group whose rows don't fit one task."""
    if n_buckets < 1:
        raise ValueError(f"running_distinct_count needs n_buckets >= 1, got {n_buckets}")
    base = events.select(
        F.col(tiebreak), F.col(group), F.col(key), F.unix_millis(ts).alias("_tms")
    )
    w_first = Window.partitionBy(group, key).orderBy("_tms", tiebreak)
    flagged = base.withColumn(
        "_isf", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    )
    bounds = base.agg(
        F.min("_tms").alias("_t0"), F.max("_tms").alias("_t1")
    )
    bucketed = flagged.join(F.broadcast(bounds)).withColumn(
        "_bkt",
        ((F.col("_tms") - F.col("_t0")) * n_buckets
         / (F.col("_t1") - F.col("_t0") + 1)).cast("long"),
    )
    w_in = (
        Window.partitionBy(group, "_bkt")
        .orderBy("_tms", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("_cum", F.sum("_isf").over(w_in))
    totals = bucketed.groupBy(group, "_bkt").agg(F.sum("_isf").alias("_btot"))
    w_off = (
        Window.partitionBy(group)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
    ).select(group, "_bkt", "_boff")
    return within.join(F.broadcast(offsets), [group, "_bkt"]).select(
        tiebreak,
        group,
        (F.col("_boff") + F.col("_cum")).alias("n_distinct_users_so_far"),
    )


def trailing_distinct_users(
    events: DataFrame,
    window_ms: int = HOUR_MS,
    group: str = "event_type",
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per event: how many distinct ``key`` values its ``group`` saw in
    the trailing ``window_ms`` (inclusive of the event itself) — the
    sliding-window cardinality companion to
    :func:`running_distinct_count`'s global prefix. Output:
    (tiebreak, group, n_distinct_trailing).

    Scale shape: the trailing window is a RANGE predicate, which naive
    Spark plans as a nested-loop inequality join. Banding makes it an
    equi-join (same trick as ``asof.clicks_before_purchase``): sources
    post to their own ``window_ms`` band and the next one, targets
    probe their band — any target's trailing window lies inside those
    two source bands — and the residual range check is a post-join
    filter. Candidates are bounded by per-(group, band) density × 2,
    never corpus²; the distinct-then-count runs as two map-side
    combined aggregations keyed by the event id."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be > 0, got {window_ms}")
    base = events.select(
        F.col(tiebreak), F.col(group), F.col(key),
        F.unix_millis(ts).alias("_tms"),
    )
    targets = base.select(
        tiebreak, group,
        F.col("_tms").alias("_t"),
        F.expr(f"_tms div {window_ms}").alias("_band"),
    )
    sources = base.select(
        group, key,
        F.col("_tms").alias("_o"),
        F.explode(
            F.expr(f"array(_tms div {window_ms}, _tms div {window_ms} + 1)")
        ).alias("_band"),
    )
    return (
        targets.join(sources, [group, "_band"])
        .filter(F.expr(f"_o > _t - {window_ms} AND _o <= _t"))
        .groupBy(tiebreak, group)
        .agg(F.countDistinct(key).alias("n_distinct_trailing"))
    )


def trailing_distinct_users_oracle(window_ms: int = HOUR_MS) -> str:
    return f"""
        SELECT e.event_id, e.event_type,
               count(DISTINCT o.user_id) AS n_distinct_trailing
        FROM events e JOIN events o
          ON o.event_type = e.event_type
         AND epoch_ms(o.ts) > epoch_ms(e.ts) - {window_ms}
         AND epoch_ms(o.ts) <= epoch_ms(e.ts)
        GROUP BY 1, 2
    """


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


# ------------------------------------------------------------------ HLL

HLL_P = 8
HLL_M = 1 << HLL_P          # 256 registers
_HLL_CAP = 52               # rho <= 53; numerator = 2^(CAP - min(rho,CAP))
# alpha_m for m=256 (Flajolet et al. 2007), precomputed so both
# engines see one double literal (bare decimals parse as DECIMAL)
_HLL_ALPHA = 0.7182725932495458

# 60-bit md5-derived hash shared by both engines (same trick as KMV,
# without the modulus): register = low 8 bits, rho runs on the
# remaining 52
_HLL_HASH_SPARK = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"
)
_HLL_HASH_DUCK = (
    "CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)


def hll_distinct(events: DataFrame) -> DataFrame:
    """HyperLogLog distinct-user estimate per event_type, next to the
    exact count — the constant-memory cardinality sketch every
    planet-scale pipeline runs (Flajolet et al. 2007, the same
    algorithm behind Spark's ``approx_count_distinct``). Built from
    first principles on a SHARED md5-derived 60-bit hash so the sketch
    is bit-reproducible on both engines — Spark's and DuckDB's native
    HLLs use different hashes/registers and can never cross-verify
    (the same reason ``kmv_distinct`` exists).

    Register state: index = low ``HLL_P`` bits, rho = leading-zeros+1
    of the remaining 52 bits, computed integer-exactly as
    ``53 - length(bin(w))`` (``bin`` strips leading zeros in both
    engines). The harmonic sum rides as an EXACT bigint numerator
    ``sum(2^(52 - rho))`` (max 256·2^52 = 2^60, no overflow), so the
    only doubles are one division and the final estimate — IEEE-exact
    on identical operands in both engines. The small-range correction
    (linear counting when E <= 2.5m and empty registers exist) uses
    ``ln`` on one of just 256 possible rationals m/V, quantized to
    round(3) — far below any libm last-ulp divergence.

    Scale shape: one partially-aggregating shuffle on (event_type,
    register) — map-side combine caps each partition's output at
    types × 256 rows — then a types-keyed fold of 256-row groups.
    Registers merge by MAX, which is why the sketch distributes: the
    same two stages compute the union sketch of any number of shards.
    ``n_exact`` (for the accuracy report) is the one corpus-sized
    DISTINCT, which the estimate path never needs at 100 TB."""
    regs = (
        events.select(
            "event_type", F.expr(_HLL_HASH_SPARK).alias("hv")
        )
        .select(
            "event_type",
            (F.col("hv") % HLL_M).alias("reg"),
            F.expr(f"hv div {HLL_M}").alias("w"),
        )
        .select(
            "event_type", "reg",
            F.expr("case when w > 0 then 53 - length(bin(w)) else 53 end").alias("rho"),
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("mx"))
    )
    folded = regs.groupBy("event_type").agg(
        F.count("*").alias("n_hit"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_HLL_CAP} - least(mx, {_HLL_CAP}))")
        ).alias("hit_num"),
    )
    exact = (
        events.select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_exact"))
    )
    two_cap = float(1 << _HLL_CAP)
    est_raw = (
        f"cast('{_HLL_ALPHA!r}' as double) * {HLL_M} * {HLL_M} * cast({two_cap!r} as double)"
        f" / (hit_num + cast({HLL_M} - n_hit as bigint) * cast({two_cap!r} as double))"
    )
    return folded.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        F.col("n_hit").alias("n_registers_hit"),
        F.expr(
            f"round(case when ({est_raw}) <= 2.5 * {HLL_M} and n_hit < {HLL_M} "
            f"then {HLL_M} * ln(cast({HLL_M} as double) / ({HLL_M} - n_hit)) "
            f"else ({est_raw}) end, 3)"
        ).alias("hll_estimate"),
    )


def hll_distinct_oracle() -> str:
    two_cap = float(1 << _HLL_CAP)
    est_raw = (
        f"CAST('{_HLL_ALPHA!r}' AS DOUBLE) * {HLL_M} * {HLL_M} * CAST({two_cap!r} AS DOUBLE)"
        f" / (hit_num + CAST({HLL_M} - n_hit AS BIGINT) * CAST({two_cap!r} AS DOUBLE))"
    )
    return f"""
        WITH h AS (
          SELECT event_type, {_HLL_HASH_DUCK} AS hv FROM events
        ),
        regs AS (
          SELECT event_type, hv % {HLL_M} AS reg,
                 max(CASE WHEN hv // {HLL_M} > 0
                          THEN 53 - length(bin(hv // {HLL_M}))
                          ELSE 53 END) AS mx
          FROM h GROUP BY event_type, hv % {HLL_M}
        ),
        folded AS (
          SELECT event_type, count(*) AS n_hit,
                 CAST(sum(1::BIGINT << ({_HLL_CAP} - least(mx, {_HLL_CAP}))) AS BIGINT)
                   AS hit_num
          FROM regs GROUP BY event_type
        ),
        exact AS (
          SELECT event_type, count(*) AS n_exact
          FROM (SELECT DISTINCT event_type, user_id FROM events)
          GROUP BY event_type
        )
        SELECT f.event_type, e.n_exact, f.n_hit AS n_registers_hit,
               round(CASE WHEN ({est_raw}) <= 2.5 * {HLL_M} AND f.n_hit < {HLL_M}
                          THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - f.n_hit))
                          ELSE ({est_raw}) END, 3) AS hll_estimate
        FROM folded f JOIN exact e ON f.event_type = e.event_type
    """


CM_D = 4          # count-min hash rows
CM_W = 512        # count-min cells per row
CM_TOP = 20       # heavy-hitter report size

_CM_HASH_SPARK = (
    "cast(conv(substring(md5(concat('cm', cast(i as string), ':',"
    " cast(user_id as string))), 1, 15), 16, 10) as bigint)"
    f" % {CM_W}"
)
_CM_HASH_DUCK = (
    "CAST(('0x' || substring(md5('cm' || CAST(i AS VARCHAR) || ':'"
    " || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    f" % {CM_W}"
)


def countmin_heavy_hitters(
    events: DataFrame, d: int = CM_D, w: int = CM_W, top: int = CM_TOP
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over per-user
    event counts, reported for the exact top-``top`` heaviest users so
    the entry doubles as an accuracy report. Output: (user_id,
    n_exact, cm_estimate, overcount) — overcount >= 0 always (count-min
    errs only upward), all exact integers, shared md5 hashes so both
    engines build the identical d x w cell table.

    Scale shape: the sketch is ONE partially-aggregating shuffle on
    (hash_row, cell) — each event emits ``d`` cell increments
    map-side, and map-side combine caps every partition's output at
    d*w (= 2048) rows no matter how many events it read; cells from
    any number of shards/executors merge by SUM, which is the whole
    point of the sketch at 100 TB (a mergeable fixed-size frequency
    table where the exact per-key agg would carry billions of keys).
    Estimates probe the d*w-row table with a broadcast candidate set:
    min over the candidate's d cells. The exact counts ride a keyed
    hash agg + TakeOrdered(top) — distributed partial top-k, no
    global window (plan-test-pinned)."""
    if d < 1 or w < 1:
        raise ValueError(f"countmin needs d >= 1 and w >= 1, got d={d}, w={w}")
    if top < 1:
        raise ValueError(f"countmin needs top >= 1, got {top}")
    rows = F.explode(F.expr(f"sequence(0, {d - 1})")).alias("i")
    cells = (
        events.select("user_id", rows)
        .select("i", F.expr(_CM_HASH_SPARK).alias("cell"))
        .groupBy("i", "cell")
        .agg(F.count("*").alias("c"))
    )
    exact = events.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    cand = exact.orderBy(F.col("n_exact").desc(), F.col("user_id")).limit(top)
    probes = cand.select("user_id", "n_exact", rows).select(
        "user_id", "n_exact", "i", F.expr(_CM_HASH_SPARK).alias("cell")
    )
    return (
        probes.join(cells, ["i", "cell"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "user_id", "n_exact", "cm_estimate",
            (F.col("cm_estimate") - F.col("n_exact")).alias("overcount"),
        )
    )


def countmin_heavy_hitters_oracle(
    d: int = CM_D, w: int = CM_W, top: int = CM_TOP
) -> str:
    return f"""
        WITH ids AS (SELECT unnest(generate_series(0, {d - 1})) AS i),
        cells AS (
          SELECT i, {_CM_HASH_DUCK} AS cell, count(*) AS c
          FROM events CROSS JOIN ids
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id
        ),
        cand AS (
          SELECT user_id, n_exact FROM exact
          ORDER BY n_exact DESC, user_id LIMIT {top}
        ),
        probes AS (
          SELECT user_id, n_exact, i, {_CM_HASH_DUCK} AS cell
          FROM cand CROSS JOIN ids
        ),
        est AS (
          SELECT p.user_id, p.n_exact, min(c.c) AS cm_estimate
          FROM probes p JOIN cells c ON p.i = c.i AND p.cell = c.cell
          GROUP BY p.user_id, p.n_exact
        )
        SELECT user_id, n_exact, cm_estimate,
               cm_estimate - n_exact AS overcount
        FROM est
    """


BLOOM_M = 32768   # filter bits (~11 bits/key on the sf0.01 build side)
BLOOM_K = 3       # hashes per key
_BLOOM_PRIORITY = "1-URGENT"


def _bloom_hash_spark(col: str, i: int, m: int) -> str:
    return (
        f"cast(conv(substring(md5(concat('bf', '{i}', ':',"
        f" cast({col} as string))), 1, 15), 16, 10) as bigint) % {m}"
    )


def _bloom_hash_duck(col: str, i: int, m: int) -> str:
    return (
        f"CAST(('0x' || substring(md5('bf' || '{i}' || ':'"
        f" || CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) % {m}"
    )


def bloom_prefilter_join(
    orders: DataFrame,
    lineitem: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Deterministic Bloom runtime-filter semi-join — the pushed-down
    build-side filter every 100 TB join planner injects (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` does exactly
    this, but its filter is opaque; this one is md5-derived so DuckDB
    reconstructs the identical bit set and the false-positive count
    has an exact oracle). Build side: urgent orders' keys; probe
    side: lineitem. Output: ONE summary row (n_probe, n_bloom_pass,
    n_true_match, n_false_pos, fp_micro) — fp_micro is the realized
    false-positive rate over true negatives in exact millionths.

    Scale shape: the filter state is <= min(k*|build|, m) distinct
    set-bit rows — BOUNDED BY m (= {m}) regardless of build size —
    and ships as a broadcast. The probe side then passes through k
    broadcast LEFT SEMI joins (one per hash), entirely map-side: the
    corpus-sized lineitem scan is never shuffled, which is the whole
    point of a runtime prefilter (rows that cannot match die before
    the expensive join). No false negatives by construction; the
    false-positive rows are exactly what the real join would discard
    later, and the summary quantifies them."""
    if m < 1 or k < 1:
        raise ValueError(f"bloom needs m >= 1 and k >= 1, got m={m}, k={k}")
    build = orders.filter(
        F.col("o_orderpriority") == _BLOOM_PRIORITY
    ).select("o_orderkey")
    bits = (
        build.select(
            F.explode(
                F.array(*[
                    F.expr(_bloom_hash_spark("o_orderkey", i, m)) for i in range(k)
                ])
            ).alias("bit")
        )
        .distinct()
    )
    # hash i+1 is PROJECTED AFTER semi-join i (not all k up front), so
    # rows the filter kills at hash i never pay the md5 for the later
    # hashes — the point of a short-circuiting prefilter chain
    passed = lineitem.select("l_orderkey")
    for i in range(k):
        passed = passed.withColumn(
            f"h{i}", F.expr(_bloom_hash_spark("l_orderkey", i, m))
        ).join(
            F.broadcast(bits.select(F.col("bit").alias(f"h{i}"))),
            f"h{i}",
            "left_semi",
        )
    n_pass = passed.agg(F.count("*").alias("n_bloom_pass"))
    # n_probe and n_true_match share ONE lineitem scan (guide §2.4):
    # o_orderkey is unique on the build side, so the broadcast left
    # join preserves probe row count and count(_hit) counts matches
    probe_true = (
        lineitem.select("l_orderkey")
        .join(
            F.broadcast(build.withColumn("_hit", F.lit(1))),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n_probe"),
            F.count("_hit").alias("n_true_match"),
        )
    )
    return (
        probe_true.crossJoin(n_pass)
        .select(
            "n_probe", "n_bloom_pass", "n_true_match",
            (F.col("n_bloom_pass") - F.col("n_true_match")).alias("n_false_pos"),
            F.expr(
                "case when n_probe > n_true_match then"
                " (1000000 * (n_bloom_pass - n_true_match))"
                " div (n_probe - n_true_match)"
                " else cast(0 as bigint) end"
            ).alias("fp_micro"),
        )
    )


def bloom_prefilter_join_oracle(m: int = BLOOM_M, k: int = BLOOM_K) -> str:
    pass_cond = " AND ".join(
        f"({_bloom_hash_duck('l.l_orderkey', i, m)}) IN (SELECT bit FROM bits)"
        for i in range(k)
    )
    bit_exprs = " UNION ALL ".join(
        f"SELECT {_bloom_hash_duck('o_orderkey', i, m)} AS bit FROM build"
        for i in range(k)
    )
    return f"""
        WITH build AS (
          SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '{_BLOOM_PRIORITY}'
        ),
        bits AS (SELECT DISTINCT bit FROM ({bit_exprs})),
        counts AS (
          SELECT
            (SELECT count(*) FROM lineitem) AS n_probe,
            (SELECT count(*) FROM lineitem l WHERE {pass_cond}) AS n_bloom_pass,
            (SELECT count(*) FROM lineitem l
              WHERE l.l_orderkey IN (SELECT o_orderkey FROM build)) AS n_true_match
        )
        SELECT n_probe, n_bloom_pass, n_true_match,
               n_bloom_pass - n_true_match AS n_false_pos,
               CASE WHEN n_probe > n_true_match THEN
                 (1000000 * (n_bloom_pass - n_true_match))
                   // (n_probe - n_true_match)
               ELSE CAST(0 AS BIGINT) END AS fp_micro
        FROM counts
    """


# ------------------------------------------------------- sampled quantiles

QSAMPLE_DENOM = 16  # deterministic 1/16 hash sample


def hash_sample_quantiles(events: DataFrame, denom: int = QSAMPLE_DENOM) -> DataFrame:
    """Mergeable quantile estimates per event_type from a
    DETERMINISTIC uniform hash sample: keep the events whose 64-bit
    md5-derived hash of ``event_id`` falls in one residue class
    (rate 1/``denom``), then take exact rank-order statistics of the
    sample. Because membership is a pure function of the row, every
    partition samples independently and the union of partial samples
    IS the global sample — the merge property a 100 TB rollup needs
    (contrast reservoir sampling, whose merge is weighted and
    order-sensitive). Sample size concentrates at n/denom (Chernoff),
    so rank error is O(sqrt(denom/n)) quantile-uniform.

    The corpus-sized work is the sample filter at the scan (predicate
    on a codegen md5 expression — no shuffle) plus ONE per-type sort
    of the ~n/denom sample; ranks select elements (never midpoint
    averages), so the outputs are actual data values, engine-exact.
    Quantile ranks use integer ceil division mirrored in the oracle.
    Output: (event_type, n_sample, p50, p90, p99)."""
    h = (
        "cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) "
        f"as bigint) % {denom}"
    )
    sample = events.filter(F.expr(f"({h}) = 0")).select("event_type", "value", "event_id")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        sample.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").alias("n_sample"),
            F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("value"))).alias("p50"),
            F.max(F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("value"))).alias("p90"),
            F.max(F.when(F.expr("rn = (99 * n + 99) div 100"), F.col("value"))).alias("p99"),
        )
        .select("event_type", F.expr("cast(n_sample as bigint)").alias("n_sample"),
                "p50", "p90", "p99")
    )


def hash_sample_quantiles_oracle(denom: int = QSAMPLE_DENOM) -> str:
    h = (
        "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {denom}"
    )
    return f"""
        WITH sample AS (
          SELECT event_type, value, event_id FROM events WHERE ({h}) = 0
        ),
        ranked AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM sample
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_sample,
               max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
               max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
               max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
        FROM ranked GROUP BY event_type
    """


# ------------------------------------------------- bottom-k quantiles

BK_K = 128

_BK_HASH_SPARK = (
    "cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) "
    f"as bigint) % {P}"
)
_BK_HASH_DUCK = (
    "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    f" % {P}"
)


def bottomk_sample_quantiles(events: DataFrame, k: int = BK_K) -> DataFrame:
    """Quantile estimates per event_type from a BOTTOM-K row-hash
    sample: the k rows with the smallest md5-derived hash of
    ``event_id`` form a uniform fixed-size sample of the group — the
    bounded-state sibling of :func:`hash_sample_quantiles` (whose
    residue sample grows with n). Bottom-k merges like KMV: the
    bottom-k of a union is the bottom-k of the parts' bottom-ks, so
    per-partition partial sketches (and the streaming twin's state)
    fold without bias, and state is k rows per group FOREVER.

    This batch form expresses the selection as one per-type
    row_number window (a per-group sort); on a cluster the
    partial-merge property is what you exploit — per-partition
    bottom-k then merge, exactly what the streaming twin does. Ranks
    select actual values via integer ceil division, mirrored in the
    oracle. Output: (event_type, n_sample, p50, p90, p99)."""
    sample = (
        events.select(
            "event_type", "value", "event_id",
            F.expr(_BK_HASH_SPARK).alias("h"),
        )
        .withColumn(
            "hrn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h", "event_id")
            ),
        )
        .filter(F.col("hrn") <= k)
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        sample.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").alias("n_sample"),
            F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("value"))).alias("p50"),
            F.max(F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("value"))).alias("p90"),
            F.max(F.when(F.expr("rn = (99 * n + 99) div 100"), F.col("value"))).alias("p99"),
        )
        .select("event_type", F.expr("cast(n_sample as bigint)").alias("n_sample"),
                "p50", "p90", "p99")
    )


def bottomk_sample_quantiles_oracle(k: int = BK_K) -> str:
    return f"""
        WITH sample AS (
          SELECT event_type, value, event_id
          FROM (
            SELECT event_type, value, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY {_BK_HASH_DUCK}, event_id) AS hrn
            FROM events
          ) t WHERE hrn <= {k}
        ),
        ranked AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM sample
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_sample,
               max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
               max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
               max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
        FROM ranked GROUP BY event_type
    """
