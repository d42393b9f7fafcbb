"""Corpus-level curation operators for training-data pipelines:
repetition signals, vocabulary statistics, deterministic stratified
sampling, per-domain quality quotas, and benchmark-contamination
checks. (Beyond-reference scope — SURVEY.md §7 phase 4; the reference
engine has no corpus-level operators at all, SURVEY.md §2b.)

Everything is built from JVM-side expressions over row-shaped
intermediates (explode → hash aggregation / window rank) — no Python
UDFs, no array lambdas in hot paths (see the CodegenFallback note in
``dedup.py``). Sampling is HASH-deterministic (md5 of the key), not
RNG-based, so the same rows are selected on any cluster, any
partitioning, any retry — the property a reproducible data pipeline
actually needs, and the reason every operator here has an exact
DuckDB oracle.

Scale notes (100 TB): per-doc aggregations shuffle once on doc_id;
the vocabulary top-k is a map-side partially-aggregated count +
TakeOrdered (per-partition heaps, no global sort); stratified/quota
ranks partition by the stratum key so no single task sees more than
one stratum; the contamination join is a shuffle equi-join on the
shingle hash with the benchmark side deduplicated first (at most one
match per probe row — no fanout) and deliberately NOT broadcast: the
benchmark shingle set is O(benchmark corpus), not O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from siddhi_execution_unique_spark.functions.dedup import (
    MIN_TOKENS,
    _SHINGLE_DUCK,
    _distinct_shingles,
)
from siddhi_execution_unique_spark.functions.text import (
    DUCK_TOKS,
    SPARK_TOKS,
    checkpointed as _checkpointed,
)


# ------------------------------------------------------------ repetition

def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals (the Gopher-style filters for
    boilerplate / degenerate text): duplicate-token fraction, most-
    frequent-token fraction, duplicate-2-gram fraction.

    Token and 2-gram occurrences are produced as rows and collapsed by
    two chained hash aggregations — (doc, term) counts, then per-doc
    moments — so the whole plan is scan → explode → two codegen agg
    passes per granularity, joined back on doc_id.
    """
    toks = docs.select("doc_id", F.expr(SPARK_TOKS).alias("toks"))

    tok_rows = toks.select("doc_id", F.explode("toks").alias("x"))
    tok_counts = tok_rows.groupBy("doc_id", "x").agg(F.count("*").alias("c"))
    per_doc_tok = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct_tokens"),
        F.max("c").alias("top_c"),
    )

    gram_rows = toks.filter(F.expr("size(toks) >= 2")).select(
        "doc_id", "toks",
        F.explode(F.expr("sequence(0, size(toks) - 2)")).alias("i"),
    ).select("doc_id", F.expr("concat_ws(' ', toks[i], toks[i+1])").alias("g"))
    gram_counts = gram_rows.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    per_doc_gram = gram_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct_grams"),
    )

    return per_doc_tok.join(per_doc_gram, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.expr(
            "round((n_tokens - n_distinct_tokens) / cast(n_tokens as double), 6)"
        ).alias("dup_token_frac"),
        F.expr("round(top_c / cast(n_tokens as double), 6)").alias("top_token_frac"),
        F.expr(
            "round(coalesce((n_grams - n_distinct_grams) / cast(n_grams as double),"
            " 0.0), 6)"
        ).alias("dup_2gram_frac"),
    )


def repetition_stats_oracle() -> str:
    toks = DUCK_TOKS
    grams = (
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> concat_ws(' ', {toks}[i], {toks}[i+1]))"
    )
    return f"""
        WITH tc AS (
          SELECT doc_id, x, count(*) AS c
          FROM (SELECT doc_id, unnest({toks}) AS x FROM documents) t
          GROUP BY 1, 2
        ),
        td AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 count(*) AS n_distinct_tokens, CAST(max(c) AS BIGINT) AS top_c
          FROM tc GROUP BY 1
        ),
        gc AS (
          SELECT doc_id, g, count(*) AS c
          FROM (SELECT doc_id, unnest({grams}) AS g
                FROM documents WHERE len({toks}) >= 2) t
          GROUP BY 1, 2
        ),
        gd AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                 count(*) AS n_distinct_grams
          FROM gc GROUP BY 1
        )
        SELECT td.doc_id, td.n_tokens,
               round((td.n_tokens - td.n_distinct_tokens)
                     / CAST(td.n_tokens AS DOUBLE), 6) AS dup_token_frac,
               round(td.top_c / CAST(td.n_tokens AS DOUBLE), 6) AS top_token_frac,
               round(coalesce((gd.n_grams - gd.n_distinct_grams)
                     / CAST(gd.n_grams AS DOUBLE), 0.0), 6) AS dup_2gram_frac
        FROM td LEFT JOIN gd ON td.doc_id = gd.doc_id
    """


# ------------------------------------------------------------ vocabulary

def vocab_top_tokens(docs: DataFrame, k: int = 50) -> DataFrame:
    """Global vocabulary statistics: the ``k`` most frequent tokens
    with occurrence and document-frequency counts.

    The count aggregates map-side (partial hash agg per partition)
    before one shuffle on the token; the top-k is ``orderBy.limit`` =
    TakeOrderedAndProject — per-partition heaps of k rows, no global
    sort. Deterministic tie-break on the token string."""
    rows = docs.select("doc_id", F.explode(F.expr(SPARK_TOKS)).alias("token"))
    counts = rows.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)


def vocab_top_tokens_oracle(k: int = 50) -> str:
    return f"""
        SELECT token, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest({DUCK_TOKS}) AS token FROM documents) t
        GROUP BY token
        ORDER BY n_occurrences DESC, token ASC
        LIMIT {k}
    """


# ------------------------------------------------------------- sampling

def stratified_sample(docs: DataFrame, per_stratum: int = 20,
                      stratum: str = "source") -> DataFrame:
    """Deterministic stratified sample: ``per_stratum`` documents per
    stratum, selected by md5-hash rank of the doc_id.

    Hash-rank sampling is the distributed replacement for reservoir
    sampling — same uniform marginal, but deterministic and
    retry-stable (a reservoir depends on encounter order, which a
    cluster does not guarantee). One shuffle on the stratum key; the
    rank window never crosses strata, so skew is bounded by the
    largest stratum, not the corpus."""
    if per_stratum <= 0:
        raise ValueError(f"per_stratum must be > 0, got {per_stratum}")
    w = Window.partitionBy(stratum).orderBy(
        F.expr("md5(cast(doc_id as string))"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", stratum)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= per_stratum)
    )


def stratified_sample_oracle(per_stratum: int = 20, stratum: str = "source") -> str:
    return f"""
        SELECT doc_id, {stratum}, sample_rank
        FROM (SELECT doc_id, {stratum},
                     row_number() OVER (PARTITION BY {stratum}
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ) AS sample_rank
              FROM documents) t
        WHERE sample_rank <= {per_stratum}
    """


def domain_quota(docs: DataFrame, quality: DataFrame, quota: int = 5) -> DataFrame:
    """Per-domain quality quota: keep the top ``quota`` documents per
    source by quality score — the mixing step of corpus assembly
    (cap each domain's contribution, best-first).

    ``quality`` is the output of :func:`text.quality_score`; composing
    the two stays one Catalyst plan (shared scan, id equi-join, one
    rank window partitioned by source)."""
    if quota <= 0:
        raise ValueError(f"quota must be > 0, got {quota}")
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source")
        .join(quality.select("doc_id", "quality"), "doc_id")
        .withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= quota)
    )


def domain_quota_oracle(quality_oracle: str, quota: int = 5) -> str:
    return f"""
        WITH q AS ({quality_oracle})
        SELECT doc_id, source, quality, quota_rank
        FROM (SELECT d.doc_id, d.source, q.quality,
                     row_number() OVER (PARTITION BY d.source
                       ORDER BY q.quality DESC, d.doc_id ASC) AS quota_rank
              FROM documents d JOIN q ON d.doc_id = q.doc_id) t
        WHERE quota_rank <= {quota}
    """


# -------------------------------------------------------- contamination

CONTAMINATION_FRAC = 0.5


def contamination_check(docs: DataFrame, benchmark_source: str = "src0",
                        flag_frac: float = CONTAMINATION_FRAC) -> DataFrame:
    """Benchmark-contamination check: for every document outside the
    benchmark source, the fraction of its distinct word-3-gram
    shingles that also occur anywhere in the benchmark set, plus a
    contaminated flag at ``flag_frac``.

    The benchmark side is reduced to DISTINCT shingles before the
    join, so each probe shingle matches at most one row (no fanout)
    and the join is a plain shuffle equi-join on the shingle — NOT
    broadcast, because the benchmark shingle set grows with the
    benchmark corpus. Per-doc totals are one hash aggregation on
    doc_id."""
    if not 0.0 < flag_frac <= 1.0:
        raise ValueError(f"flag_frac must be in (0, 1], got {flag_frac}")
    bench_sh = (
        _distinct_shingles(docs.filter(F.col("source") == benchmark_source))
        .select("sh").distinct().withColumn("_hit", F.lit(1))
    )
    cand_sh = _distinct_shingles(docs.filter(F.col("source") != benchmark_source))
    marked = cand_sh.join(bench_sh, "sh", "left")
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_overlap"),
    ).select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.expr("round(n_overlap / cast(n_shingles as double), 6)").alias(
            "contamination_frac"
        ),
        F.expr(
            f"n_overlap / cast(n_shingles as double) >= {flag_frac}"
        ).alias("contaminated"),
    )


def contamination_check_oracle(benchmark_source: str = "src0",
                               flag_frac: float = CONTAMINATION_FRAC) -> str:
    return f"""
        WITH b AS (
          SELECT DISTINCT sh
          FROM (SELECT unnest({_SHINGLE_DUCK}) AS sh
                FROM documents
                WHERE source = '{benchmark_source}'
                  AND len({DUCK_TOKS}) >= {MIN_TOKENS}) t
        ),
        c AS (
          SELECT doc_id, unnest({_SHINGLE_DUCK}) AS sh
          FROM documents
          WHERE source <> '{benchmark_source}' AND len({DUCK_TOKS}) >= {MIN_TOKENS}
        )
        SELECT c.doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_overlap,
               round(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS contamination_frac,
               (sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) >= {flag_frac}) AS contaminated
        FROM c LEFT JOIN b ON c.sh = b.sh
        GROUP BY c.doc_id
    """


# ------------------------------------------------------------- mixture

def mixture_stats(docs: DataFrame) -> DataFrame:
    """Corpus mixture manifest: document and token counts per
    (lang, source) cell with ROLLUP subtotals — the numbers a mixture-
    weighting step consumes. ``token_share`` is each cell's fraction
    of the corpus's tokens.

    The corpus-sized work is ONE hash aggregation to (lang, source)
    cells; the rollup and the share window then run on O(#cells) rows
    (hundreds), where an unpartitioned window is free. Rollup nulls
    are folded to '<all>' so subtotal rows are self-describing."""
    cells = docs.select(
        "doc_id", "lang", "source", F.expr(f"size({SPARK_TOKS})").alias("n_toks")
    ).groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    rolled = cells.rollup("lang", "source").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return rolled.select(
        F.expr("coalesce(lang, '<all>')").alias("lang"),
        F.expr("coalesce(source, '<all>')").alias("source"),
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens")
            / F.max(F.when(F.col("lang").isNull(), F.col("n_tokens"))).over(total),
            6,
        ).alias("token_share"),
    )


def mixture_stats_oracle() -> str:
    return f"""
        WITH cells AS (
          SELECT lang, source, count(*) AS n_docs,
                 CAST(sum(len({DUCK_TOKS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1, 2
        ),
        rolled AS (
          SELECT lang, source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM cells GROUP BY ROLLUP (lang, source)
        )
        SELECT coalesce(lang, '<all>') AS lang,
               coalesce(source, '<all>') AS source,
               n_docs, n_tokens,
               round(n_tokens / CAST((SELECT max(CASE WHEN lang IS NULL
                     THEN n_tokens END) FROM rolled) AS DOUBLE), 6) AS token_share
        FROM rolled
    """


# ------------------------------------------------------------ redaction

# conservative patterns valid in both Java regex and RE2 (no
# lookaround, no backrefs) so Spark and DuckDB redact identically
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d[\d -]{7,}\d"),
)


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII scrub: count and redact emails / IPv4 addresses / intl
    phone numbers, emitting per-kind counts and the md5 of the
    redacted text (the narrow proof-of-work a manifest stores; the
    redacted corpus itself would be written back to parquet).

    Pure codegen ``regexp_count`` + chained ``regexp_replace`` —
    per-row regex over the text column, embarrassingly parallel,
    no shuffle at all."""
    # Spark SQL string literals consume one level of backslashes;
    # DuckDB's do not — escape per engine from the shared patterns
    redacted = "text"
    for kind, pat in _PII_PATTERNS:
        spat = pat.replace("\\", "\\\\")
        redacted = f"regexp_replace({redacted}, '{spat}', '<{kind}>')"
    counts = [
        F.expr(f"regexp_count(text, '{pat_sp}')").alias(f"n_{kind}")
        for kind, pat in _PII_PATTERNS
        for pat_sp in [pat.replace("\\", "\\\\")]
    ]
    return docs.select(
        "doc_id", *counts, F.expr(f"md5({redacted})").alias("redacted_md5")
    )


def pii_redact_oracle() -> str:
    redacted = "text"
    for kind, pat in _PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '<{kind}>', 'g')"
    counts = ",\n               ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat in _PII_PATTERNS
    )
    return f"""
        SELECT doc_id,
               {counts},
               md5({redacted}) AS redacted_md5
        FROM documents
    """


# ------------------------------------------------------------ percentiles


def quality_percentiles(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) length distribution: exact discrete p10/p50/
    p90 of ``n_chars`` plus the stratum size — the numbers a curation
    step reads to SET its min/max-length filter thresholds per
    stratum instead of guessing one global cutoff.

    Percentile definition: smallest value whose cumulative count
    reaches ``ceil(p * n)`` (type-1 / inverse-ECDF) — all-integer
    arithmetic, so both engines agree bit-for-bit (interpolating
    definitions ride on IEEE ops whose order differs between engines).

    Scale shape (100 TB): the corpus-sized pass is ONE hash
    aggregation to (lang, source, n_chars) histogram cells with
    map-side combine; the cumulative window then runs over DISTINCT
    values per stratum (thousands of rows, not billions), so no task
    ever sorts a stratum's documents. This is the two-pass
    histogram-percentile pattern, not a per-stratum global sort."""
    hist = docs.groupBy("lang", "source", "n_chars").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("lang", "source").orderBy("n_chars")
    tot = Window.partitionBy("lang", "source")
    cum = (
        hist.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(tot))
    )
    def pick(num: int, den: int, name: str):
        rank = F.expr(f"(n * {num} + {den - 1}) div {den}")
        return F.min(F.when(F.col("cum") >= rank, F.col("n_chars"))).alias(name)
    return cum.groupBy("lang", "source").agg(
        F.max("n").alias("n_docs"),
        pick(1, 10, "p10_chars"),
        pick(1, 2, "p50_chars"),
        pick(9, 10, "p90_chars"),
    )


def quality_percentiles_oracle() -> str:
    return """
        WITH hist AS (
          SELECT lang, source, n_chars, count(*) AS c
          FROM documents GROUP BY 1, 2, 3
        ),
        cum AS (
          SELECT lang, source, n_chars,
                 sum(c) OVER (PARTITION BY lang, source ORDER BY n_chars
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY lang, source) AS n
          FROM hist
        )
        SELECT lang, source,
               CAST(max(n) AS BIGINT) AS n_docs,
               min(CASE WHEN cum >= (n * 1 + 9) // 10 THEN n_chars END) AS p10_chars,
               min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN n_chars END) AS p50_chars,
               min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN n_chars END) AS p90_chars
        FROM cum GROUP BY lang, source
    """


# ------------------------------------------------------------ shard packing


def pack_training_shards(
    docs: DataFrame, budget_tokens: int = 20_000, n_buckets: int = 64
) -> DataFrame:
    """Deterministic shuffle-and-pack: assign every document a
    training-shard id so each shard holds ~``budget_tokens``
    whitespace tokens, with documents in a deterministic
    pseudo-random order (md5 hash rank — the reproducible stand-in
    for the training-data shuffle).

    Scale shape — the two-phase prefix-sum pattern distributed ranking
    uses at 100 TB, NOT a global sort: documents hash into
    ``n_buckets``; a running token sum within each bucket (window
    partitioned by the bucket, skew bounded by corpus/n_buckets) plus
    per-bucket totals prefix-summed over the O(n_buckets)-row
    aggregate give every document its global token offset in the
    shuffled order; the shard id is then integer division by the
    budget. The only corpus-sized shuffle keys on the bucket id, and
    no window ever crosses a bucket.

    Output: (doc_id, bucket, shard_id, start_offset, n_toks) — all
    bigint, so the oracle hash is exact."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    base = docs.select(
        "doc_id",
        F.expr("md5(cast(doc_id as string))").alias("h"),
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) "
            f"as bigint) % {n_buckets}"
        ).alias("bucket"),
        F.expr(f"cast(size({SPARK_TOKS}) as bigint)").alias("n_toks"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("cum_incl", F.sum("n_toks").over(w_in))
    totals = base.groupBy("bucket").agg(F.sum("n_toks").alias("btot"))
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "boff", F.coalesce(F.sum("btot").over(w_off), F.lit(0))
    ).select("bucket", "boff")
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "bucket",
            F.expr(f"(boff + cum_incl - n_toks) div {budget_tokens}").alias("shard_id"),
            (F.col("boff") + F.col("cum_incl") - F.col("n_toks")).alias("start_offset"),
            "n_toks",
        )
    )


def pack_training_shards_oracle(
    budget_tokens: int = 20_000, n_buckets: int = 64
) -> str:
    return f"""
        WITH base AS (
          SELECT doc_id,
                 md5(CAST(doc_id AS VARCHAR)) AS h,
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % {n_buckets} AS bucket,
                 CAST(len({DUCK_TOKS}) AS BIGINT) AS n_toks
          FROM documents
        ),
        within AS (
          SELECT doc_id, bucket, n_toks,
                 sum(n_toks) OVER (PARTITION BY bucket ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_incl
          FROM base
        ),
        offsets AS (
          SELECT bucket,
                 COALESCE(sum(btot) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
          FROM (SELECT bucket, sum(n_toks) AS btot FROM base GROUP BY bucket)
        )
        SELECT w.doc_id, w.bucket,
               CAST((o.boff + w.cum_incl - w.n_toks) // {budget_tokens}
                    AS BIGINT) AS shard_id,
               CAST(o.boff + w.cum_incl - w.n_toks AS BIGINT) AS start_offset,
               w.n_toks
        FROM within w JOIN offsets o USING (bucket)
    """


# ------------------------------------------------- training-chunk split

CHUNK_TOKENS = 32   # tokens per training chunk
CHUNK_STRIDE = 24   # chunk start stride (CHUNK_TOKENS - STRIDE = overlap)


def chunk_documents(docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Fixed-token training-sequence chunking with overlap: each
    document is split into chunks of ``chunk_tokens`` whitespace
    tokens whose starts advance by ``stride`` (so consecutive chunks
    overlap by ``chunk_tokens - stride``); the final chunk is the
    shorter tail. One output row per chunk: (doc_id, chunk_id,
    n_chunk_tokens, chunk_hash) — ``chunk_hash`` is md5 of the chunk
    text, the id a packing/shuffling stage downstream consumes, so
    rows stay narrow (the chunk text itself never shuffles).

    Scale shape: pure narrow projection — tokenize once per doc,
    ``explode(sequence)`` over chunk starts, codegen'd ``slice`` +
    ``array_join`` + ``md5``; no join, no aggregation, no window. The
    output inherits the input partitioning, so a 100 TB corpus chunks
    map-side with zero shuffle."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}"
        )
    toks = docs.select("doc_id", F.expr(SPARK_TOKS).alias("toks"))
    return toks.select(
        "doc_id", "toks",
        F.explode(
            F.expr(f"sequence(0, cast(floor((size(toks) - 1) / {stride}) as int))")
        ).alias("chunk_id"),
    ).select(
        "doc_id", "chunk_id",
        F.expr(
            f"least({chunk_tokens}, size(toks) - chunk_id * {stride})"
        ).alias("n_chunk_tokens"),
        F.expr(
            f"md5(array_join(slice(toks, chunk_id * {stride} + 1, {chunk_tokens}), ' '))"
        ).alias("chunk_hash"),
    )


def chunk_documents_oracle(chunk_tokens: int = CHUNK_TOKENS,
                           stride: int = CHUNK_STRIDE) -> str:
    return f"""
        SELECT doc_id, chunk_id,
               least({chunk_tokens}, len(toks) - chunk_id * {stride})
                 AS n_chunk_tokens,
               md5(array_to_string(
                 toks[(chunk_id * {stride} + 1):(chunk_id * {stride} + {chunk_tokens})],
                 ' ')) AS chunk_hash
        FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
             unnest(generate_series(
               0, CAST(floor((len(toks) - 1) / {stride}) AS INT))) AS t(chunk_id)
    """


# -------------------------------------------- temperature resampling

# doc-hash uniform fraction in [0, 1): first 13 md5 hex digits over
# 16^13 — bit-identical across engines (one double division of exact
# integers; no RNG, so the same docs survive on any cluster/retry)
_UFRAC_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as double)"
    " / cast(4503599627370496 as double)"
)
_UFRAC_DUCK = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)"
    " / CAST(4503599627370496 AS DOUBLE)"
)


def temperature_resample(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-corpus
    reweighting step, e.g. mBERT/XLM-R exponentiated smoothing): each
    (lang, source) cell's keep probability is
    ``(min_cell_share / cell_share) ** alpha`` — the smallest cell
    keeps everything, over-represented cells are deterministically
    downsampled toward a flatter mixture. A document survives when its
    md5-hash fraction < its cell's keep probability (hash-deterministic,
    not RNG — reproducible across clusters, partitionings, retries).

    ``alpha`` must be 0.5 (sqrt) or 1.0 (linear): general ``pow`` is a
    transcendental whose libm rounding differs across engines, while
    sqrt and division are IEEE correctly-rounded — the oracle stays
    bit-exact.

    Output: (doc_id, lang, source, keep_prob, kept), one row per doc.

    Scale shape: ONE corpus-sized hash aggregation to O(#cells) rows;
    shares and the min-share run on the tiny cell table (unpartitioned
    window is free there); the per-doc verdict is an equi-join of docs
    against the cell table on (lang, source) — not broadcast-hinted
    (the cell table grows with the domain/language inventory; AQE
    localizes it while it fits)."""
    if alpha not in (0.5, 1.0):
        raise ValueError(f"alpha must be 0.5 or 1.0, got {alpha}")
    toks = docs.select(
        "doc_id", "lang", "source", F.expr(f"size({SPARK_TOKS})").alias("n_toks")
    )
    cells = toks.groupBy("lang", "source").agg(F.sum("n_toks").alias("cell_toks"))
    total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ratio = "min_toks / cast(cell_toks as double)"
    prob = f"sqrt({ratio})" if alpha == 0.5 else ratio
    weighted = cells.select(
        "lang", "source",
        F.min("cell_toks").over(total).alias("min_toks"),
        "cell_toks",
    ).select("lang", "source", F.expr(prob).alias("keep_prob"))
    return (
        toks.join(weighted, ["lang", "source"])
        .select(
            "doc_id", "lang", "source",
            F.expr("round(keep_prob, 6)").alias("keep_prob"),
            F.expr(f"{_UFRAC_SPARK} < keep_prob").alias("kept"),
        )
    )


def temperature_resample_oracle(alpha: float = 0.5) -> str:
    ratio = "min_toks / CAST(cell_toks AS DOUBLE)"
    prob = f"sqrt({ratio})" if alpha == 0.5 else ratio
    return f"""
        WITH cells AS (
          SELECT lang, source, CAST(sum(len({DUCK_TOKS})) AS BIGINT) AS cell_toks
          FROM documents GROUP BY 1, 2
        ),
        weighted AS (
          SELECT lang, source, {prob} AS keep_prob
          FROM (SELECT lang, source, cell_toks,
                       min(cell_toks) OVER () AS min_toks
                FROM cells)
        )
        SELECT d.doc_id, d.lang, d.source,
               round(w.keep_prob, 6) AS keep_prob,
               ({_UFRAC_DUCK} < w.keep_prob) AS kept
        FROM documents d JOIN weighted w
          ON d.lang = w.lang AND d.source = w.source
    """


# --------------------------------------- token-budget quality selection

BUDGET_TOKENS = 800  # per-source token budget; binds at every test SF


def select_token_budget(docs: DataFrame, quality: DataFrame,
                        budget_tokens: int = BUDGET_TOKENS) -> DataFrame:
    """Budgeted quality selection: per source, keep the highest-quality
    documents (quality desc, doc_id tiebreak) while the source's
    cumulative token count stays within ``budget_tokens`` — the greedy
    fill a fixed-size training-mix slot runs. A document is kept iff
    the cumulative tokens up to AND INCLUDING it fit the budget.

    Output: (doc_id, source, quality, n_toks, kept), one row per doc.

    Scale shape — the same two-phase histogram trick as
    :func:`quality_percentiles` / :func:`pack_training_shards`: a naive
    per-source running sum would sort whole sources in single window
    partitions (source cardinality is tiny, so that's a handful of
    corpus-sized tasks). Instead quality is quantized to integer
    millibins; per-(source, bin) token totals are ONE map-side-combined
    hash aggregation; the strictly-better-bins prefix runs on the tiny
    O(#sources x 1001) bin table; and the only corpus-sized window
    partitions by (source, bin) — thousands of small partitions, no
    single task ever sees a whole source. floor is monotone in quality,
    so bin-prefix + within-bin cumsum == the per-source global cumsum
    the (simpler, unscalable) oracle computes."""
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    base = (
        docs.select("doc_id", "source", F.expr(f"size({SPARK_TOKS})").alias("n_toks"))
        .join(quality.select("doc_id", "quality"), "doc_id")
        .withColumn("bin", F.expr("cast(floor(quality * 1000) as int)"))
    )
    bins = base.groupBy("source", "bin").agg(F.sum("n_toks").alias("bin_toks"))
    w_bins = (
        Window.partitionBy("source")
        .orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = bins.select(
        "source", "bin",
        F.coalesce(F.sum("bin_toks").over(w_bins), F.lit(0)).alias("cum_before"),
    )
    w_in_bin = (
        Window.partitionBy("source", "bin")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(cum, ["source", "bin"])
        .withColumn("cum_in_bin", F.sum("n_toks").over(w_in_bin))
        .select(
            "doc_id", "source", "quality", "n_toks",
            F.expr(f"cum_before + cum_in_bin <= {budget_tokens}").alias("kept"),
        )
    )


def select_token_budget_oracle(quality_oracle: str,
                               budget_tokens: int = BUDGET_TOKENS) -> str:
    """Single per-source running sum — correct but unscalable; the
    Spark side's bin-prefix decomposition must agree exactly."""
    return f"""
        WITH q AS ({quality_oracle})
        SELECT d.doc_id, d.source, q.quality,
               CAST(len({DUCK_TOKS}) AS BIGINT) AS n_toks,
               (sum(len({DUCK_TOKS}))
                  OVER (PARTITION BY d.source
                        ORDER BY q.quality DESC, d.doc_id
                        ROWS UNBOUNDED PRECEDING) <= {budget_tokens}) AS kept
        FROM documents d JOIN q ON d.doc_id = q.doc_id
    """


# ---------------------------------------------- BPE merge-pair counts

def bpe_merge_pairs(docs: DataFrame, k: int = 50) -> DataFrame:
    """The first step of BPE/WordPiece vocabulary training at corpus
    scale: global frequencies of ADJACENT token pairs, top-``k`` by
    count (the pair a BPE trainer would merge first, then the
    runners-up). Output: (left, right, n_pairs, n_docs).

    Same scale shape as :func:`vocab_top_tokens`: adjacent pairs are
    produced as rows by ``explode(sequence)`` + array indexing (codegen,
    no lambdas), counted in ONE map-side-combined hash aggregation
    keyed by the pair, and the top-k is ``orderBy.limit`` =
    TakeOrderedAndProject (per-partition k-row heaps, never a global
    sort). A full BPE train iterates this; each iteration is this same
    single aggregation over re-segmented tokens."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select("doc_id", F.expr(SPARK_TOKS).alias("toks")).filter(
        F.expr("size(toks) >= 2")
    )
    pairs = toks.select(
        "doc_id", "toks",
        F.explode(F.expr("sequence(0, size(toks) - 2)")).alias("i"),
    ).select(
        "doc_id",
        F.expr("toks[i]").alias("left"),
        F.expr("toks[i+1]").alias("right"),
    )
    counts = pairs.groupBy("left", "right").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(
        F.desc("n_pairs"), F.asc("left"), F.asc("right")
    ).limit(k)


def bpe_merge_pairs_oracle(k: int = 50) -> str:
    return f"""
        WITH pairs AS (
          SELECT doc_id, toks[i] AS left, toks[i+1] AS right
          FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
               unnest(generate_series(1, len(toks) - 1)) AS t(i)
          WHERE len(toks) >= 2
        )
        SELECT "left", "right", count(*) AS n_pairs,
               count(DISTINCT doc_id) AS n_docs
        FROM pairs
        GROUP BY 1, 2
        ORDER BY n_pairs DESC, "left" ASC, "right" ASC
        LIMIT {k}
    """


def bpe_train(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Iterative BPE vocabulary training over word-level units:
    ``n_merges`` rounds of (count adjacent pairs → merge the most
    frequent pair greedily left-to-right, non-overlapping → recount).
    Closes the loop :func:`bpe_merge_pairs` computes ONE round of, the
    way ``connected_components`` did for clustering. Output: the
    learned merge table, one row per round —
    (merge_round, left, right, n_pairs).

    Scale shape per round: token sequences stay as ARRAYS in place —
    no full-corpus shuffle anywhere. Pair counting is
    ``explode(sequence) + array indexing`` (codegen, no lambdas) into
    ONE map-side-combined hash aggregation whose shuffle volume is
    distinct pairs, and the 1-row TakeOrdered best pair broadcasts
    back; the greedy re-segmentation is one Arrow-vectorized
    ``mapInPandas`` pass, partition-local and embarrassingly parallel
    (the PQ-encode discipline — an earlier row-based window lowering
    cost 5 doc-partitioned sorts per round, 8 full-corpus shuffles
    total, and measured 5× slower). Exact-BPE greedy semantics: pair
    counts include overlapping occurrences (Sennrich ``get_stats``);
    merges consume left-to-right, so in a run of consecutive matches
    (only possible when left == right) alternating positions merge —
    the numpy pass loops only over match positions, never tokens.
    Inter-round state is ``localCheckpoint()``ed (the
    connected-components discipline: truncate lineage, never re-run
    the previous round's chain). Ties break
    (n desc, left asc, right asc) — deterministic, oracle-comparable.

    Round-14 pass accounting (guide §2.3/§2.4): the merge pass also
    EMITS each partition's partial pair counts for the next round
    (tagged rows in the same checkpoint), so a round is ONE corpus
    pass instead of two — n+1 full passes total instead of 2n+1 —
    and the next round's count aggregation shuffles per-partition
    distinct pairs, not per-position rows. The winning pair is a
    1-row constant collected to the driver (the bounded-model
    discipline of the ANN codebooks) instead of a broadcast-exchange
    crossJoin, and the merge table itself is rebuilt from those n
    collected rows — the old output union re-aggregated every
    round's pair counts a second time. ``bpe_train`` also skips the
    final resegmentation pass entirely (only ``bpe_encode`` needs
    the post-round-n token state)."""
    rows, _ = _bpe_fit(docs, n_merges, final_state=False)
    return docs.sparkSession.createDataFrame(
        rows, "merge_round int, left string, right string, n_pairs long")


def _bpe_fit(docs: DataFrame, n_merges: int, final_state: bool = True):
    """Shared BPE iteration: returns (per-round best-merge rows, final
    token state). :func:`bpe_train` reports the merge table (and skips
    the last resegmentation with ``final_state=False``);
    :func:`bpe_encode` aggregates the final segmentation."""
    import numpy as np
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    # n_raw (the pre-merge token count) rides along from round 0 — one
    # int64 per row — so bpe_encode's compression ratio needs neither a
    # second full-corpus re-tokenize (SPARK_TOKS is a regexp pass) nor
    # a doc_id shuffle join at the end (guide §2.4)
    cur = docs.select(
        "doc_id", F.expr(SPARK_TOKS).alias("toks")
    ).withColumn("n_raw", F.expr("size(toks)"))
    cur = _checkpointed(cur)
    out_schema = cur.schema
    fused_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in out_schema.fields]
        + [StructField("_cl", StringType(), True),
           StructField("_cr", StringType(), True),
           StructField("_cn", LongType(), True)]
    )

    def resegment(bl, br, emit_counts):
        """One merge pass: greedy left-to-right non-overlapping merge
        of the collected best pair (a plain closure constant — no join
        attaches it), optionally emitting the partition's partial
        adjacent-pair counts for the NEXT round as tagged rows
        (doc_id NULL) in the same output."""

        def fn(frames):
            import pandas as pd

            left_parts, right_parts = [], []
            for pdf in frames:
                if pdf.empty:
                    continue
                merged_col = []
                for toks in pdf["toks"]:
                    t = np.asarray(toks, dtype=object)
                    if t.size >= 2:
                        idx = np.flatnonzero((t[:-1] == bl) & (t[1:] == br))
                    else:
                        idx = ()
                    if len(idx) == 0:
                        merged = toks
                    else:
                        take, prev_end = [], -1
                        for i in idx:  # greedy left-to-right, matches only
                            if i <= prev_end:
                                continue
                            take.append(i)
                            prev_end = i + 1
                        take = np.asarray(take, dtype=np.int64)
                        t[take] = [t[i] + " " + t[i + 1] for i in take]
                        keep = np.ones(t.size, dtype=bool)
                        keep[take + 1] = False
                        merged = list(t[keep])
                    merged_col.append(merged)
                    if emit_counts and len(merged) >= 2:
                        m = (merged if isinstance(merged, np.ndarray)
                             else np.asarray(merged, dtype=object))
                        left_parts.append(m[:-1])
                        right_parts.append(m[1:])
                res = pdf[["doc_id"]].copy()
                res["toks"] = merged_col
                res["n_raw"] = pdf["n_raw"]
                if emit_counts:
                    res["_cl"] = None
                    res["_cr"] = None
                    res["_cn"] = None
                yield res
            if emit_counts and left_parts:
                pc = (
                    pd.DataFrame({
                        "_cl": np.concatenate(left_parts),
                        "_cr": np.concatenate(right_parts),
                    })
                    .groupby(["_cl", "_cr"], sort=False)
                    .size()
                    .reset_index(name="_cn")
                )
                pc.insert(0, "doc_id", None)
                pc.insert(1, "toks", None)
                pc.insert(2, "n_raw", None)
                yield pc

        return fn

    best_rows: list[tuple] = []
    counts = None  # None -> derive round-1 counts from the token state
    exhausted = False
    for rnd in range(1, n_merges + 1):
        if exhausted:
            continue
        if counts is None:
            cdf = (
                cur.filter(F.expr("size(toks) >= 2"))
                .select(
                    "toks",
                    F.explode(
                        F.expr("sequence(0, size(toks) - 2)")).alias("i"),
                )
                .select(
                    F.expr("toks[i]").alias("_cl"),
                    F.expr("toks[i+1]").alias("_cr"),
                )
                .groupBy("_cl", "_cr")
                .agg(F.count("*").alias("_cn"))
            )
        else:
            cdf = counts.groupBy("_cl", "_cr").agg(
                F.sum("_cn").alias("_cn"))
        top = (
            cdf.orderBy(F.desc("_cn"), F.asc("_cl"), F.asc("_cr"))
            .limit(1).collect()
        )
        if not top:
            # no adjacent pair left anywhere: the legacy crossJoin
            # against an empty best emptied the token state — keep
            # that contract (later rounds emit nothing)
            exhausted = True
            cur = spark.createDataFrame([], out_schema)
            continue
        bl, br, bn = top[0]["_cl"], top[0]["_cr"], top[0]["_cn"]
        best_rows.append((rnd, bl, br, int(bn)))
        last = rnd == n_merges
        if last and not final_state:
            break
        # lazy checkpoint: the NEXT round's 1-row count collect is the
        # first action and materializes the pass as a side effect —
        # an eager checkpoint here would spend a whole extra job per
        # round just to store the same rows
        nxt = cur.mapInPandas(
            resegment(bl, br, emit_counts=not last),
            out_schema if last else fused_schema,
        )
        nxt = _checkpointed(nxt, eager=False)
        if last:
            cur = nxt
        else:
            cur = nxt.filter(F.col("doc_id").isNotNull()).select(
                "doc_id", "toks", "n_raw")
            counts = nxt.filter(F.col("doc_id").isNull()).select(
                "_cl", "_cr", "_cn")
    return best_rows, cur


def bpe_encode(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Apply the learned BPE merges back to the corpus — the other
    half of the tokenizer-training story (:func:`bpe_train` learns the
    merge table; this re-tokenizes with it). Output per document with
    at least one token: (doc_id, n_tokens, n_distinct_tokens,
    compression) where compression = merged-token count / raw-token
    count as an IEEE double (exact division of exact ints —
    engine-identical, no transcendentals).

    Scale shape is :func:`bpe_train`'s: the per-round pair count is
    one map-side-combined hash agg (shuffle volume = distinct pairs),
    re-segmentation is a partition-local Arrow pass, and the final
    per-doc aggregation is array algebra in place (`size`,
    `array_distinct`) — tokens never leave their partition.

    Registered and certified as driver entry ``vocab_bpe_encode``
    (r12, hash-green against the DuckDB replay oracle)."""
    _, cur = _bpe_fit(docs, n_merges)
    # n_raw was carried through the merge rounds (one int64 per row):
    # the old shape re-tokenized the whole corpus and shuffle-joined it
    # back on doc_id just to divide by the raw token count
    return (
        cur.filter("n_raw >= 1")
        .select(
            "doc_id",
            F.expr("size(toks)").alias("n_tokens"),
            F.expr("size(array_distinct(toks))").alias("n_distinct_tokens"),
            F.expr("size(toks) / cast(n_raw as double)").alias("compression"),
        )
    )


def bpe_train_oracle(n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_train`: the identical per-round
    algebra (lead-pairs count → deterministic top-1 → island-parity
    greedy merge → re-number), unrolled ``n_merges`` times as a CTE
    chain — each round's state table t{r} feeds the next. Every
    CTE is MATERIALIZED: each round references its predecessors
    more than once, and DuckDB's default inlining would expand the
    chain exponentially (~4^n document scans — observed as an FD
    exhaustion at n=8)."""
    parts, results = _bpe_oracle_parts(n_merges)
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(results)


def bpe_encode_oracle(n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_encode`: the same unrolled CTE chain
    as :func:`bpe_train_oracle`, with the final round's segmentation
    t{n} aggregated per document instead of the merge table."""
    parts, _ = _bpe_oracle_parts(n_merges)
    return (
        "WITH " + ",\n".join(parts) + f""",
raw AS MATERIALIZED (
  SELECT doc_id, count(*) AS n_raw FROM t0 GROUP BY doc_id)
SELECT t.doc_id,
       count(*) AS n_tokens,
       count(DISTINCT t.tok) AS n_distinct_tokens,
       count(*) / CAST(any_value(raw.n_raw) AS DOUBLE) AS compression
FROM t{n_merges} t JOIN raw USING (doc_id)
GROUP BY t.doc_id"""
    )


def _bpe_oracle_parts(n_merges: int):
    parts = [f"""t0 AS MATERIALIZED (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents) d,
       unnest(generate_series(1, len(toks))) AS u(i)
)"""]
    results = []
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT doc_id, pos, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM t{r - 1})""")
        parts.append(f"""b{r} AS MATERIALIZED (
  SELECT tok AS l, nxt AS r, count(*) AS n
  FROM p{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY n DESC, l ASC, r ASC LIMIT 1)""")
        parts.append(f"""g{r} AS MATERIALIZED (
  SELECT p.*, (p.tok = b.l AND p.nxt = b.r) AS mt,
         sum(CASE WHEN p.tok = b.l AND p.nxt = b.r THEN 1 ELSE 0 END)
           OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS mc
  FROM p{r} p, b{r} b)""")
        parts.append(f"""k{r} AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY doc_id, pos - mc ORDER BY pos) AS rni
    FROM g{r} WHERE mt) WHERE rni % 2 = 1)""")
        parts.append(f"""t{r} AS MATERIALIZED (
  SELECT g.doc_id,
         row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS pos,
         CASE WHEN k.pos IS NOT NULL THEN g.tok || ' ' || g.nxt
              ELSE g.tok END AS tok
  FROM g{r} g
  LEFT JOIN k{r} k ON k.doc_id = g.doc_id AND k.pos = g.pos
  LEFT JOIN k{r} c ON c.doc_id = g.doc_id AND c.pos = g.pos - 1
  WHERE c.pos IS NULL)""")
        results.append(
            f'SELECT {r} AS merge_round, l AS "left", r AS "right",\n'
            f"       CAST(n AS BIGINT) AS n_pairs FROM b{r}"
        )
    return parts, results


# ------------------------------------------- source-overlap diagnostic

def source_overlap_matrix(docs: DataFrame) -> DataFrame:
    """Corpus-provenance diagnostic: for every ordered source pair
    (a < b), how many DISTINCT word-3-gram shingles the two sources
    share — the matrix that locates cross-source duplication /
    contamination before any pairwise doc comparison runs.

    Scale shape: the corpus reduces to DISTINCT (source, shingle) rows
    (one hash aggregation); the pair counts come from a self equi-join
    ON THE SHINGLE (posting-list join — fanout per shingle is bounded
    by the number of sources it appears in, <= n_sources, never by
    document count) and one final hash aggregation to the
    O(n_sources²) matrix."""
    sh = (
        _distinct_shingles(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "sh").distinct()
    )
    other = sh.select(F.col("source").alias("source_b"), F.col("sh").alias("sh_b"))
    return (
        sh.join(other, (F.col("sh") == F.col("sh_b"))
                & (F.col("source") < F.col("source_b")))
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(F.count("*").alias("n_shared_shingles"))
    )


def source_overlap_matrix_oracle() -> str:
    return f"""
        WITH sh AS (
          SELECT DISTINCT source, sh
          FROM (SELECT doc_id, source, unnest({_SHINGLE_DUCK}) AS sh
                FROM documents WHERE len({DUCK_TOKS}) >= {MIN_TOKENS}) t
        )
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_shared_shingles
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2
    """


SPLIT_VAL_PCT = 10
SPLIT_TEST_PCT = 10


def train_val_test_split(
    docs: DataFrame,
    val_pct: int = SPLIT_VAL_PCT,
    test_pct: int = SPLIT_TEST_PCT,
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training pipeline needs to be REPRODUCIBLE and re-runnable: bucket
    = md5(doc_id) mod 100, so a document's split never changes when
    the corpus grows (new docs land in their own buckets; existing
    assignments are stable — the property random splits lack). Emits
    the per-(source, split) manifest: (source, split, n_docs,
    n_chars_total), the small frame a training job actually consumes.

    Scale shape: one narrow projection (hash, bucket, split label) and
    one partially-aggregated hash agg on (source, split) — map output
    bounded by sources × 3. The md5-mod bucket is the same shared-hash
    idiom as every sampler here, so Spark and DuckDB agree bucket by
    bucket."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct >= 100:
        raise ValueError(
            f"need val_pct, test_pct >= 0 with val+test < 100, "
            f"got {val_pct}/{test_pct}"
        )
    bucket = (
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"
        " % 100"
    )
    split = (
        f"case when {bucket} < {test_pct} then 'test' "
        f"when {bucket} < {test_pct + val_pct} then 'val' "
        f"else 'train' end"
    )
    return (
        docs.select("source", F.expr(split).alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )


def train_val_test_split_oracle(
    val_pct: int = SPLIT_VAL_PCT, test_pct: int = SPLIT_TEST_PCT
) -> str:
    bucket = (
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        " % 100"
    )
    return f"""
        SELECT source,
               CASE WHEN {bucket} < {test_pct} THEN 'test'
                    WHEN {bucket} < {test_pct + val_pct} THEN 'val'
                    ELSE 'train' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        FROM documents
        GROUP BY 1, 2
    """


ZORDER_BITS = 10       # bits per dimension
ZORDER_FILE_SHIFT = 14 # keep the top 6 z-bits -> 64 files


def _z_interleave_spark(x: str, y: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"shiftleft(shiftright({x}, {b}) & 1, {2 * b + 1})")
        terms.append(f"shiftleft(shiftright({y}, {b}) & 1, {2 * b})")
    return " + ".join(terms)


def _z_interleave_duck(x: str, y: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


def zorder_layout(events: DataFrame, bits: int = ZORDER_BITS,
                  file_shift: int = ZORDER_FILE_SHIFT) -> DataFrame:
    """Z-order (Morton-curve) file layout for multidimensional scan
    pruning — what Delta's ``OPTIMIZE ZORDER BY`` / Iceberg's sort
    orders do for 100 TB tables: interleave the bits of two filter
    dimensions so every output file covers a BOUNDED range in BOTH,
    and a predicate on either dimension prunes most files from the
    scan. Dimensions here: user bucket (``user_id % 2^bits``) and
    corpus hour (``floor(epoch_ms/3600000) % 2^bits``). Output: one
    row per z-file — (file_id, n_rows, min_ub, max_ub, min_hb,
    max_hb, ub_span, hb_span) — the min/max column stats a lakehouse
    manifest would store, demonstrating per-file span bounds on both
    dimensions (a time-sorted layout would show ub_span = full range
    in every file).

    Scale shape: the z-value is pure codegen bit arithmetic (20
    shift-and-mask terms, no UDF); the per-file stats are ONE
    map-side-combined hash agg keyed on file_id. At scale the same
    z-value feeds ``repartitionByRange(z)`` + sortWithinPartitions as
    the actual write path; this entry computes the manifest the
    pruning argument rests on. Integer-exact end to end."""
    if bits < 1 or bits > 20:
        raise ValueError(f"zorder_layout needs 1 <= bits <= 20, got {bits}")
    if file_shift < 0 or file_shift >= 2 * bits:
        raise ValueError(
            f"zorder_layout needs 0 <= file_shift < {2 * bits}, got {file_shift}"
        )
    mod = 1 << bits
    z = _z_interleave_spark("ub", "hb", bits)
    return (
        events.select(
            F.expr(f"user_id % {mod}").alias("ub"),
            F.expr(f"(unix_millis(ts) div 3600000) % {mod}").alias("hb"),
        )
        .select("ub", "hb", F.expr(f"({z}) div {1 << file_shift}").alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ub").alias("min_ub"), F.max("ub").alias("max_ub"),
            F.min("hb").alias("min_hb"), F.max("hb").alias("max_hb"),
        )
        .select(
            "file_id", "n_rows", "min_ub", "max_ub", "min_hb", "max_hb",
            (F.col("max_ub") - F.col("min_ub") + 1).alias("ub_span"),
            (F.col("max_hb") - F.col("min_hb") + 1).alias("hb_span"),
        )
    )


def zorder_layout_oracle(bits: int = ZORDER_BITS,
                         file_shift: int = ZORDER_FILE_SHIFT) -> str:
    mod = 1 << bits
    z = _z_interleave_duck("ub", "hb", bits)
    return f"""
        WITH dims AS (
          SELECT user_id % {mod} AS ub,
                 (CAST(epoch_ms(ts) AS BIGINT) // 3600000) % {mod} AS hb
          FROM events
        ),
        zed AS (
          SELECT ub, hb, ({z}) // {1 << file_shift} AS file_id FROM dims
        ),
        stats AS (
          SELECT file_id, count(*) AS n_rows,
                 min(ub) AS min_ub, max(ub) AS max_ub,
                 min(hb) AS min_hb, max(hb) AS max_hb
          FROM zed GROUP BY file_id
        )
        SELECT file_id, n_rows, min_ub, max_ub, min_hb, max_hb,
               max_ub - min_ub + 1 AS ub_span,
               max_hb - min_hb + 1 AS hb_span
        FROM stats
    """


PRIORITY_SAMPLE_K = 50
_PS_P = 1_000_003  # prime for the md5-uniform; u in (0, 1]


def priority_sample(docs: DataFrame, k: int = PRIORITY_SAMPLE_K) -> DataFrame:
    """Deterministic weighted sampling without replacement via
    priority sampling (Duffield, Lund & Thorup, JACM 2007): each doc
    draws a reproducible md5-uniform u in (0,1] and gets priority
    w/u with weight w = n_chars; the top-``k`` priorities ARE the
    weighted sample. Longer documents are proportionally more likely
    to be drawn, and the same corpus always yields the same sample —
    the reproducibility a training-data pipeline needs for ablations.
    Output: (doc_id, w, prio_micro) — the priority in exact integer
    millionths (one IEEE division on exact int64s, then floor).

    Scale shape: priorities are pure codegen arithmetic over one
    corpus scan; the selection is ``orderBy(...).limit(k)`` =
    TakeOrderedAndProject — each task keeps a k-row heap, the driver
    merges P heaps, and NOTHING global is sorted (the reason this
    beats both ORDER-BY-rand sampling and per-stratum windows at
    100 TB). No transcendentals: exponential-jump sampling (A-ES)
    needs ln(u), which libm renders differently per engine — w/u
    ranking gives the same inclusion law without leaving the
    correctly-rounded IEEE +,*,/ set."""
    if k < 1:
        raise ValueError(f"priority_sample needs k >= 1, got {k}")
    prio = (
        f"cast(floor(cast(n_chars as double)"
        f" / ((cast(conv(substring(md5(concat('ps:', cast(doc_id as string))),"
        f" 1, 15), 16, 10) as bigint) % {_PS_P} + 1)"
        f" / cast({_PS_P} as double)) * 1000000) as bigint)"
    )
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("w"),
            F.expr(prio).alias("prio_micro"),
        )
        .orderBy(F.col("prio_micro").desc(), F.col("doc_id"))
        .limit(k)
    )


def priority_sample_oracle(k: int = PRIORITY_SAMPLE_K) -> str:
    prio = (
        f"CAST(floor(CAST(n_chars AS DOUBLE)"
        f" / ((CAST(('0x' || substring(md5('ps:' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % {_PS_P} + 1)"
        f" / CAST({_PS_P} AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    return f"""
        SELECT doc_id, n_chars AS w, {prio} AS prio_micro
        FROM documents
        ORDER BY prio_micro DESC, doc_id
        LIMIT {k}
    """


PROFILE_COLS = ("user_id", "event_type", "value", "props")


def data_profile(events: DataFrame, cols: tuple = PROFILE_COLS) -> DataFrame:
    """Per-column data-quality profile — the Deequ/dbt-test shape a
    pipeline runs before trusting a new drop: one row per profiled
    column with null count, distinct count, and lexicographic min/max
    of the string form. Output: (col_name, n_rows, n_null,
    n_distinct, min_repr, max_repr).

    Scale shape: ONE corpus scan — the row melts to |cols| narrow
    (col_name, value-string) rows map-side (a Generate, no shuffle),
    and the whole profile is a single hash aggregation keyed on
    col_name (the distinct count rides Spark's two-stage
    count-distinct expansion over the (col_name, value) pair, bounded
    by per-column distinct cardinality). Adding a column adds fanout
    rows, never a second scan — profiling 500 columns of a 100 TB
    table still reads it once.

    Cross-engine note: doubles profile via their string form, and both
    engines print shortest-roundtrip decimal (parity-proven at sf0.1);
    values forcing scientific notation could format differently —
    a corpus with such columns should profile round()ed copies."""
    if not cols:
        raise ValueError("data_profile needs at least one column")
    for c in cols:
        if c not in events.columns:
            raise ValueError(f"data_profile: no such column {c!r}")
    melted = events.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in cols
            ])
        ).alias("m")
    ).select("m.col_name", "m.v")
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("bigint")).alias("n_null"),
        F.count_distinct(F.col("v")).alias("n_distinct"),
        F.coalesce(F.min("v"), F.lit("")).alias("min_repr"),
        F.coalesce(F.max("v"), F.lit("")).alias("max_repr"),
    )


def data_profile_oracle(cols: tuple = PROFILE_COLS) -> str:
    selects = [
        f"""
        SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN CAST({c} AS VARCHAR) IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               count(DISTINCT CAST({c} AS VARCHAR)) AS n_distinct,
               COALESCE(min(CAST({c} AS VARCHAR)), '') AS min_repr,
               COALESCE(max(CAST({c} AS VARCHAR)), '') AS max_repr
        FROM events
        """
        for c in cols
    ]
    return " UNION ALL ".join(selects)


JOIN_HEALTH_TOP = 10


def join_key_health(
    events: DataFrame, orders: DataFrame, top: int = JOIN_HEALTH_TOP
) -> DataFrame:
    """Join-key health report BEFORE running a join — the skew/fanout
    precheck a 100 TB join planner needs (one hot key turns a shuffle
    join into one straggler task; this report is how you decide to
    salt, broadcast, or filter first). Probes events.user_id ⋈
    orders.o_custkey: the ``top`` keys by join fanout (n_left ×
    n_right), each with both side counts and the key's share of the
    total join output in exact basis points. Output: (key, n_left,
    n_right, pair_rows, total_join_rows, share_bp).

    Scale shape: two map-side-combined keyed aggs (bounded by distinct
    keys), an inner equi-join of the two COUNT TABLES (never the fact
    tables), one broadcast 1-row total, and TakeOrdered for the top
    slice — the whole report costs two aggregate shuffles regardless
    of fact-table size."""
    if top < 1:
        raise ValueError(f"join_key_health needs top >= 1, got {top}")
    lc = events.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").alias("n_left")
    )
    rc = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n_right")
    )
    pairs = lc.join(rc, "key").select(
        "key", "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("pair_rows"),
    )
    total = pairs.agg(F.sum("pair_rows").alias("total_join_rows"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "key", "n_left", "n_right", "pair_rows", "total_join_rows",
            F.expr("(10000 * pair_rows) div total_join_rows").alias("share_bp"),
        )
        .orderBy(F.col("pair_rows").desc(), F.col("key"))
        .limit(top)
    )


def join_key_health_oracle(top: int = JOIN_HEALTH_TOP) -> str:
    return f"""
        WITH lc AS (
          SELECT user_id AS key, count(*) AS n_left FROM events GROUP BY user_id
        ),
        rc AS (
          SELECT o_custkey AS key, count(*) AS n_right FROM orders GROUP BY o_custkey
        ),
        pairs AS (
          SELECT lc.key, n_left, n_right, n_left * n_right AS pair_rows
          FROM lc JOIN rc ON lc.key = rc.key
        ),
        tot AS (SELECT CAST(sum(pair_rows) AS BIGINT) AS total_join_rows FROM pairs)
        SELECT key, n_left, n_right, pair_rows, total_join_rows,
               (10000 * pair_rows) // total_join_rows AS share_bp
        FROM pairs CROSS JOIN tot
        ORDER BY pair_rows DESC, key
        LIMIT {top}
    """


TOPK_SALT = 16


def vocab_top_per_lang(docs: DataFrame, k: int = 20,
                       n_salt: int = TOPK_SALT) -> DataFrame:
    """Per-GROUP top-k (the ``k`` most frequent tokens per language) —
    the shape global ``vocab_top_tokens`` can't give and the naive
    encoding gets wrong at scale: ``row_number() OVER (PARTITION BY
    lang)`` sorts each language's ENTIRE vocabulary in one task
    (languages are low-cardinality — the anti-pattern
    ``running_distinct_users`` was rewritten to avoid). This is the
    salted two-phase selection instead: token counts salt into
    ``n_salt`` deterministic slices per language, a window ranks
    within each (lang, salt) slice — partitions bounded by
    vocab/n_salt — and the true top-k is a second window over the
    k·n_salt per-language survivors (top-k of a union ⊆ union of
    per-slice top-ks, so no candidate is lost). Output: (lang, rank,
    token, n_occurrences).

    Scale shape: one explode + map-side-combined hash agg on (lang,
    token), then the two bounded windows; nothing ever sorts a whole
    language's vocabulary in one task."""
    if k < 1 or n_salt < 1:
        raise ValueError(f"vocab_top_per_lang needs k >= 1, n_salt >= 1; "
                         f"got k={k}, n_salt={n_salt}")
    counts = (
        docs.select("lang", F.explode(F.expr(SPARK_TOKS)).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    sliced = counts.withColumn(
        "salt",
        F.expr(
            f"cast(conv(substring(md5(token), 1, 8), 16, 10) as bigint) % {n_salt}"
        ),
    )
    w1 = Window.partitionBy("lang", "salt").orderBy(
        F.desc("n_occurrences"), F.asc("token")
    )
    survivors = sliced.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= k
    )
    w2 = Window.partitionBy("lang").orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("lang", "rank", "token", "n_occurrences")
    )


def vocab_top_per_lang_oracle(k: int = 20) -> str:
    return f"""
        WITH counts AS (
          SELECT lang, token, count(*) AS n_occurrences
          FROM (SELECT lang, unnest({DUCK_TOKS}) AS token FROM documents) t
          GROUP BY lang, token
        )
        SELECT lang, rank, token, n_occurrences FROM (
          SELECT lang, token, n_occurrences,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_occurrences DESC, token ASC) AS rank
          FROM counts
        ) WHERE rank <= {k}
    """
