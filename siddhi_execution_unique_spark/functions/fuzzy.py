"""Fuzzy string matching (approximate join / entity resolution):
n-gram-blocked edit-distance lookup — the "did you mean" / record-
linkage operator a training-data pipeline uses to reconcile noisy
titles, author names, or URLs against a canonical catalog.
(Beyond-reference scope — SURVEY.md §7 phase 4; the reference's
``unique:ever`` keeps one row per EXACT key, UniqueEverWindowProcessor
.java:84-93 — fuzzy matching is the relaxation to nearest key within
an edit-distance budget.)

Scale design — the same inverted-index shape as the char-n-gram
Jaccard verifier (`dedup.py:char_ngram_jaccard_pairs`): probes and
catalog both explode into character 4-grams, candidates come from a
gram-keyed equi-join (posting lists — fully parallel, skew-handled by
AQE, never a CartesianProduct/BroadcastNestedLoopJoin), a shared-gram
count prunes to pairs with >= MIN_SHARED grams in common, and only
that candidate set pays the O(len^2) ``levenshtein`` — which both
Spark and DuckDB implement as classic unit-cost edit distance, so the
scores are integer-exact across engines. A deletion of one character
destroys at most GRAM=4 grams, so every true match within
MAX_DIST=2 of a name >= ~10 chars retains >= MIN_SHARED=2 shared
grams — blocking loses no recall at the configured threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GRAM = 4
MIN_SHARED = 2
MAX_DIST = 2
PROBE_MOD = 29

# one deterministic single-character deletion per probe: position
# keyed off the id so the corruption is reproducible in both engines
_CORRUPT_SPARK = (
    "concat(substring(name, 1, cast(name_id % (length(name) - 2) as int) + 1), "
    "substring(name, cast(name_id % (length(name) - 2) as int) + 3, length(name)))"
)
_CORRUPT_DUCK = (
    "substring(name, 1, CAST(name_id % (length(name) - 2) AS INT) + 1) || "
    "substring(name, CAST(name_id % (length(name) - 2) AS INT) + 3, length(name))"
)


def _grams(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    return df.select(
        id_col, s_col,
        F.explode(
            F.expr(f"sequence(1, length({s_col}) - {GRAM - 1})")
        ).alias("i"),
    ).select(
        id_col, s_col,
        F.expr(f"substring({s_col}, i, {GRAM})").alias("gram"),
    ).dropDuplicates([id_col, "gram"])


def fuzzy_match_names(part: DataFrame) -> DataFrame:
    """Resolve deterministically-corrupted probe names (one character
    deleted from every ``PROBE_MOD``-th part name) back against the
    full catalog: for each probe, the best catalog row within
    ``MAX_DIST`` edits — ``(probe_id, match_id, edit_dist,
    n_shared_grams)``, best = lowest (dist, match_id).

    The probe corpus is built FROM the catalog so the entry needs no
    side input and ground truth is known: a probe's own source row is
    at distance 1. The catalog first collapses to its DISTINCT names
    (each carrying ``repr_id`` = min row id) — matching runs against
    the name dictionary, not the row corpus, so heavy name duplication
    never multiplies the candidate set; ranking by (dist, repr_id) is
    identical to ranking row-level candidates by (dist, name_id).
    Candidate generation never compares a probe against the whole
    dictionary — only against names sharing >= MIN_SHARED 4-grams,
    via one gram-keyed shuffle join over the posting lists. The final
    per-probe top-1 is a window over probe_id — cardinality = n_probes
    (high, grows with the catalog) with candidate-set-sized
    partitions, the scale-safe kind."""
    rows = part.select(
        F.col("p_partkey").alias("name_id"),
        F.lower(F.trim(F.col("p_name"))).alias("name"),
    ).filter(F.length("name") >= GRAM + 2)
    names = rows.groupBy("name").agg(F.min("name_id").alias("name_id"))
    probes = (
        rows.filter(F.col("name_id") % PROBE_MOD == 0)
        .select(
            F.col("name_id").alias("probe_id"),
            F.expr(_CORRUPT_SPARK).alias("probe_name"),
        )
    )
    cat_g = _grams(names, "name_id", "name")
    probe_g = _grams(probes, "probe_id", "probe_name")
    cand = (
        probe_g.join(cat_g, "gram")
        .groupBy("probe_id", "probe_name", "name_id", "name")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= MIN_SHARED)
    )
    scored = cand.withColumn(
        "edit_dist", F.levenshtein("probe_name", "name")
    ).filter(F.col("edit_dist") <= MAX_DIST)
    w = Window.partitionBy("probe_id").orderBy("edit_dist", "name_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "probe_id",
            F.col("name_id").alias("match_id"),
            "edit_dist",
            "n_shared_grams",
        )
    )


def fuzzy_match_names_oracle() -> str:
    return f"""
        WITH rows_t AS (
          SELECT p_partkey AS name_id, lower(trim(p_name)) AS name
          FROM part
          WHERE length(lower(trim(p_name))) >= {GRAM + 2}
        ),
        names_t AS (
          SELECT name, min(name_id) AS name_id FROM rows_t GROUP BY name
        ),
        probes AS (
          SELECT name_id AS probe_id, {_CORRUPT_DUCK} AS probe_name
          FROM rows_t WHERE name_id % {PROBE_MOD} = 0
        ),
        cat_g AS (
          SELECT name_id, name, unnest(list_distinct(list_transform(
                   generate_series(1, length(name) - {GRAM - 1}),
                   i -> substring(name, i, {GRAM})))) AS gram
          FROM names_t
        ),
        probe_g AS (
          SELECT probe_id, probe_name, unnest(list_distinct(list_transform(
                   generate_series(1, length(probe_name) - {GRAM - 1}),
                   i -> substring(probe_name, i, {GRAM})))) AS gram
          FROM probes
        ),
        cand AS (
          SELECT p.probe_id, p.probe_name, c.name_id, c.name,
                 count(*) AS n_shared_grams
          FROM probe_g p JOIN cat_g c ON p.gram = c.gram
          GROUP BY p.probe_id, p.probe_name, c.name_id, c.name
          HAVING count(*) >= {MIN_SHARED}
        ),
        scored AS (
          SELECT probe_id, name_id, n_shared_grams,
                 levenshtein(probe_name, name) AS edit_dist
          FROM cand
          WHERE levenshtein(probe_name, name) <= {MAX_DIST}
        )
        SELECT probe_id, name_id AS match_id, edit_dist, n_shared_grams
        FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                          ORDER BY edit_dist, name_id) AS rn
              FROM scored) t
        WHERE rn = 1
    """
