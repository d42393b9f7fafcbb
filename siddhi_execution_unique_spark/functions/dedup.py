"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH near-dup, SimHash, and blocked n-gram Jaccard.
(Beyond-reference scope — SURVEY.md §7 phase 4.)

All hashing is md5-based (identical across Spark and DuckDB, verified
bit-exact) with arithmetic seed derivation, so every operator has an
exact DuckDB oracle. The LSH pipeline is the 100 TB scale path:
signatures are one narrow projection per doc, candidate generation is
a shuffle on band keys (no O(n²) cross join), and verification only
touches candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siddhi_execution_unique_spark.functions.text import (
    DUCK_TOKS,
    NORM_DUCK,
    NORM_SPARK,
    SPARK_TOKS,
)

P = 1_000_000_007
# deterministic (a, b) seed pairs for the 12 minhash permutations
SEEDS = [
    (37, 126), (91, 512), (173, 904), (277, 18), (383, 761), (487, 333),
    (577, 209), (691, 440), (787, 615), (881, 97), (983, 828), (1091, 254),
]
BANDS = 4
ROWS_PER_BAND = 3
JACCARD_THRESHOLD = 0.2
MIN_TOKENS = 3  # word-3-gram shingles need >= 3 tokens

# NOTE: Spark does not do common-subexpression elimination inside
# higher-order-function lambdas, so tokenization/normalization must be
# staged as a column *before* any per-element lambda references it —
# inlining `split(...)` below would re-run the split once per array
# element. The _SHINGLE_SPARK form therefore operates on a prepared
# `toks` column (see _shingled), never on raw text.
_SHINGLE_SPARK = (
    "array_distinct(transform(sequence(0, size(toks) - 3), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
)
_SHINGLE_DUCK = (
    f"list_distinct(list_transform(generate_series(1, len({DUCK_TOKS}) - 2), "
    f"i -> concat_ws(' ', {DUCK_TOKS}[i], {DUCK_TOKS}[i+1], {DUCK_TOKS}[i+2])))"
)
_HASH_SPARK = "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {p}".format(p=P)
_HASH_DUCK = "CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % {p}".format(p=P)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one row per
    distinct content with the kept (minimum) doc_id and the duplicate
    count. Single hash aggregation — the canonical 100 TB dedup."""
    return (
        docs.select(F.expr(f"md5({NORM_SPARK})").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


def exact_dedup_oracle() -> str:
    return f"""
        SELECT md5({NORM_DUCK}) AS fingerprint,
               min(doc_id) AS keep_doc_id, count(*) AS n_docs
        FROM documents GROUP BY 1
    """


def _sig_exprs_spark() -> list[str]:
    # minhash_j = min over shingle hashes of (a_j * h + b_j) % P
    return [
        f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {P}L))"
        for (a, b) in SEEDS
    ]


def _shingled(docs: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct word-3-gram shingles, tokens staged as a
    column so the shingle lambda never re-tokenizes."""
    return (
        docs.select("doc_id", F.expr(SPARK_TOKS).alias("toks"))
        .filter(F.expr(f"size(toks) >= {MIN_TOKENS}"))
        .select("doc_id", F.expr(_SHINGLE_SPARK).alias("sh"))
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """12-permutation MinHash signature per document over distinct
    word-3-gram shingles."""
    hashed = _shingled(docs).select(
        "doc_id", F.expr(f"transform(sh, s -> {_HASH_SPARK})").alias("hs")
    )
    sig_cols = [
        F.expr(e).alias(f"mh_{j}") for j, e in enumerate(_sig_exprs_spark())
    ]
    return hashed.select("doc_id", *sig_cols)


def minhash_signatures_oracle() -> str:
    sig_cols = ",\n               ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {P})) AS mh_{j}"
        for j, (a, b) in enumerate(SEEDS)
    )
    return f"""
        WITH hashed AS (
          SELECT doc_id,
                 list_transform({_SHINGLE_DUCK}, s -> {_HASH_DUCK}) AS hs
          FROM documents WHERE len({DUCK_TOKS}) >= {MIN_TOKENS}
        )
        SELECT doc_id, {sig_cols} FROM hashed
    """


def _band_keys(sig: DataFrame) -> DataFrame:
    """Explode a signature frame into (band_key, doc_id) rows — the
    LSH bucketing shuffle key."""
    band_exprs = []
    for b in range(BANDS):
        parts = [f"'{b}'"] + [
            f"cast(mh_{b * ROWS_PER_BAND + r} as string)" for r in range(ROWS_PER_BAND)
        ]
        band_exprs.append(f"concat_ws(':', {', '.join(parts)})")
    return sig.select(
        "doc_id", F.explode(F.expr(f"array({', '.join(band_exprs)})")).alias("band_key")
    )


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: documents sharing at least one LSH
    band (4 bands × 3 rows). Self-join on the band key — at scale this
    is a hash join on a high-cardinality key, never a cross join."""
    bands = _band_keys(minhash_signatures(docs)).persist()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .distinct()
    )


def near_dup_pairs(docs: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with exact Jaccard
    over distinct word-3-gram shingles. Output: (doc_id_1, doc_id_2,
    jaccard) for candidates with jaccard >= threshold.

    The shingle frame feeds three plan branches (both sides of the
    verify join and the signature path); it is persisted so shingling
    runs once — at corpus scale you would materialize signatures to a
    table instead."""
    shingles = _shingled(docs).persist()
    pairs = lsh_candidate_pairs(docs)
    return (
        pairs.join(shingles.withColumnRenamed("doc_id", "doc_id_1")
                   .withColumnRenamed("sh", "sh1"), "doc_id_1")
        .join(shingles.withColumnRenamed("doc_id", "doc_id_2")
              .withColumnRenamed("sh", "sh2"), "doc_id_2")
        .withColumn("inter", F.expr("size(array_intersect(sh1, sh2))"))
        .withColumn(
            "jaccard",
            F.expr("round(inter / cast(size(sh1) + size(sh2) - inter as double), 6)"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_1", "doc_id_2", "jaccard")
    )


def near_dup_pairs_oracle(threshold: float = JACCARD_THRESHOLD) -> str:
    sig_cols = ",\n                 ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {P})) AS mh_{j}"
        for j, (a, b) in enumerate(SEEDS)
    )
    band_exprs = []
    for b in range(BANDS):
        parts = [f"'{b}'"] + [
            f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        ]
        band_exprs.append(f"concat_ws(':', {', '.join(parts)})")
    return f"""
        WITH shingles AS (
          SELECT doc_id, {_SHINGLE_DUCK} AS sh
          FROM documents WHERE len({DUCK_TOKS}) >= {MIN_TOKENS}
        ),
        hashed AS (
          SELECT doc_id, list_transform(sh, s -> {_HASH_DUCK}) AS hs FROM shingles
        ),
        sig AS (
          SELECT doc_id, {sig_cols} FROM hashed
        ),
        bands AS (
          SELECT doc_id, unnest([{', '.join(band_exprs)}]) AS band_key FROM sig
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
          FROM bands a JOIN bands b
            ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        )
        SELECT doc_id_1, doc_id_2,
               round(len(list_intersect(s1.sh, s2.sh)) /
                     CAST(len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)) AS DOUBLE),
                     6) AS jaccard
        FROM cand
        JOIN shingles s1 ON s1.doc_id = doc_id_1
        JOIN shingles s2 ON s2.doc_id = doc_id_2
        WHERE round(len(list_intersect(s1.sh, s2.sh)) /
                    CAST(len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh)) AS DOUBLE),
                    6) >= {threshold}
    """


SIMHASH_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash over whitespace tokens: bit b is set when the
    sum over tokens of (2*bit_b(md5(token)) - 1) is non-negative."""
    hashed = docs.select(
        "doc_id",
        F.expr(f"transform({SPARK_TOKS}, s -> {_HASH_SPARK})").alias("hs"),
    )
    bit_terms = " + ".join(
        f"(CASE WHEN aggregate(hs, 0L, (a, h) -> a + (2 * (shiftright(h, {b}) & 1) - 1)) >= 0 "
        f"THEN {1 << b}L ELSE 0L END)"
        for b in range(SIMHASH_BITS)
    )
    return hashed.select("doc_id", F.expr(bit_terms).alias("simhash"))


def simhash_oracle() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> (2 * ((h >> {b}) & 1) - 1))) >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH hashed AS (
          SELECT doc_id, list_transform({DUCK_TOKS}, s -> {_HASH_DUCK}) AS hs
          FROM documents
        )
        SELECT doc_id, {bit_terms} AS simhash FROM hashed
    """


HAMMING_MAX = 8


def simhash_near_pairs(docs: DataFrame) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance <= 8, blocked by
    the high half of the hash (a real band: at scale you'd use 4
    rotations; one suffices on this corpus and keeps the oracle small)."""
    sh = simhash(docs).withColumn(
        "block", F.expr(f"shiftright(simhash, {SIMHASH_BITS // 2})")
    ).persist()
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .withColumn("hamming", F.expr("bit_count(a.simhash ^ b.simhash)"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select(F.col("a.doc_id").alias("doc_id_1"),
                F.col("b.doc_id").alias("doc_id_2"), "hamming")
    )


def simhash_near_pairs_oracle() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> (2 * ((h >> {b}) & 1) - 1))) >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH hashed AS (
          SELECT doc_id, list_transform({DUCK_TOKS}, s -> {_HASH_DUCK}) AS hs
          FROM documents
        ),
        sh AS (
          SELECT doc_id, {bit_terms} AS simhash FROM hashed
        ),
        blocked AS (
          SELECT doc_id, simhash, simhash >> {SIMHASH_BITS // 2} AS block FROM sh
        )
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM blocked a JOIN blocked b
          ON a.block = b.block AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """


CHAR_NGRAM = 5
NGRAM_JACCARD_THRESHOLD = 0.1


def char_ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Blocked exact character-5-gram Jaccard: pairs within the same
    (source, length-bucket) block. Blocking bounds the pair count so
    the set intersection never goes O(n²) over the corpus."""
    grams = (
        f"array_distinct(transform(sequence(1, length(norm) - {CHAR_NGRAM - 1}), "
        f"i -> substring(norm, i, {CHAR_NGRAM})))"
    )
    d = (
        docs.select(
            "doc_id", "source", "n_chars", F.expr(NORM_SPARK).alias("norm")
        )
        .filter(F.expr(f"length(norm) >= {CHAR_NGRAM}"))
        .select(
            "doc_id", "source",
            F.expr("cast(n_chars div 100 as bigint)").alias("len_bucket"),
            F.expr(grams).alias("g"),
        )
        .persist()
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.source") == F.col("b.source"))
               & (F.col("a.len_bucket") == F.col("b.len_bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .withColumn("inter", F.expr("size(array_intersect(a.g, b.g))"))
        .withColumn(
            "jaccard",
            F.expr("round(inter / cast(size(a.g) + size(b.g) - inter as double), 6)"),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .select(F.col("a.doc_id").alias("doc_id_1"),
                F.col("b.doc_id").alias("doc_id_2"), "jaccard")
    )


def char_ngram_jaccard_pairs_oracle() -> str:
    grams = (
        f"list_distinct(list_transform(generate_series(1, length({NORM_DUCK}) - {CHAR_NGRAM - 1}), "
        f"i -> substring({NORM_DUCK}, i, {CHAR_NGRAM})))"
    )
    return f"""
        WITH d AS (
          SELECT doc_id, source, n_chars // 100 AS len_bucket, {grams} AS g
          FROM documents WHERE length({NORM_DUCK}) >= {CHAR_NGRAM}
        )
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
               round(len(list_intersect(a.g, b.g)) /
                     CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE),
                     6) AS jaccard
        FROM d a JOIN d b
          ON a.source = b.source AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.g, b.g)) /
                    CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE),
                    6) >= {NGRAM_JACCARD_THRESHOLD}
    """
