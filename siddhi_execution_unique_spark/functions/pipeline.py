"""Composed corpus-curation pipeline: the end-to-end shape a training
-data run takes — quality filter → exact dedup (keep the minimum doc_id
per content fingerprint) → language tag. (Beyond-reference scope —
SURVEY.md §7 phase 4; demonstrates that the scalar-function tier
composes into one Catalyst plan.)

One declarative DataFrame graph: Catalyst shares the documents scan,
prunes to the referenced columns, and the only shuffles are the two
hash aggregations (per-doc quality/lang scores, per-fingerprint min)
plus id equi-joins — every piece is the 100 TB-safe shape its
component operator already proved out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siddhi_execution_unique_spark.functions.text import (
    _in_list_sql,
    checkpointed as _checkpointed,
    STOPWORDS,
    SPARK_TOKS,
    NORM_SPARK,
    fingerprint_oracle,
    lang_id_oracle,
    quality_score_oracle,
)

# keeps ~half the synthetic corpus (the gate must actually gate:
# min(quality) is 0.5 on this generator, so 0.5 would pass everything)
QUALITY_THRESHOLD = 0.65


def corpus_curation(docs: DataFrame, threshold: float = QUALITY_THRESHOLD) -> DataFrame:
    """Curated-corpus manifest: documents passing the quality gate,
    exact-deduplicated by normalized-text fingerprint (keep the
    minimum doc_id among passing duplicates), tagged with the
    predicted language. Output: (doc_id, pred_lang, quality).

    The quality and language scores FUSE into one explode + one
    codegen hash-agg pass (7 conditional sums over the same token
    rows) instead of composing ``quality_score`` + ``lang_id`` and
    re-tokenizing; the fingerprint rides along as a grouping key so
    the whole manifest is one scan of ``documents``. The DuckDB oracle
    composes the per-operator fragments — results are identical, only
    the plan is fused."""
    staged = docs.select(
        "doc_id",
        "text",
        F.expr(f"md5({NORM_SPARK})").alias("fingerprint"),
        F.expr("cast(length(text) as double)").alias("n_chars_d"),
        F.expr(r"regexp_count(text, '[^A-Za-z0-9\\s]')").alias("punct_n"),
    )
    tok = staged.select(
        "doc_id", "fingerprint", "n_chars_d", "punct_n",
        F.explode(F.expr(SPARK_TOKS)).alias("x"),
    )
    agg = tok.groupBy("doc_id", "fingerprint", "n_chars_d", "punct_n").agg(
        F.count("*").alias("n_toks"),
        F.sum(F.expr("CASE WHEN length(x) <= 2 THEN 1 ELSE 0 END")).alias("short_n"),
        *[
            F.sum(F.expr(_in_list_sql("x", words))).alias(f"score_{lang}")
            for lang, words in STOPWORDS.items()
        ],
    )
    lang_case = (
        "CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en' "
        "WHEN score_es >= score_de AND score_es >= score_fr THEN 'es' "
        "WHEN score_de >= score_fr THEN 'de' ELSE 'fr' END"
    )
    scored = agg.select(
        "doc_id",
        "fingerprint",
        F.expr(
            "round(0.5 * least(score_en / cast(n_toks as double) * 5.0, 1.0)"
            " + 0.3 * (1.0 - punct_n / n_chars_d)"
            " + 0.2 * (1.0 - short_n / cast(n_toks as double)), 6)"
        ).alias("quality"),
        F.expr(lang_case).alias("pred_lang"),
    )
    keep = (
        scored.filter(F.col("quality") >= threshold)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return keep.join(scored, "doc_id").select("doc_id", "pred_lang", "quality")


def corpus_curation_oracle(threshold: float = QUALITY_THRESHOLD) -> str:
    return f"""
        WITH q AS (
          SELECT doc_id, quality FROM ({quality_score_oracle()})
        ),
        fp AS (
          {fingerprint_oracle()}
        ),
        keep AS (
          SELECT min(doc_id) AS doc_id
          FROM fp JOIN q USING (doc_id)
          WHERE quality >= {threshold}
          GROUP BY fingerprint
        ),
        lang AS (
          SELECT doc_id, pred_lang FROM ({lang_id_oracle()})
        )
        SELECT k.doc_id, lang.pred_lang, q.quality
        FROM keep k JOIN q USING (doc_id) JOIN lang USING (doc_id)
    """


def curation_stream(docs_stream: DataFrame,
                    threshold: float = QUALITY_THRESHOLD) -> DataFrame:
    """Streaming twin of :func:`corpus_curation`: score each arriving
    document row-locally, gate on quality, and keep the FIRST document
    per content fingerprint — ``dropDuplicates`` keyed state, i.e. the
    reference's ``unique:first`` shape applied to the dedup key
    (UniqueFirstWindowProcessor.java:129-132), running incrementally
    in append mode.

    Batch/stream divergence is confined to WHERE the scores are
    computed, not what they are: the batch form fuses an explode into
    one corpus-wide hash-agg pass (the 100 TB path); a stream cannot
    re-aggregate per micro-batch without a second stateful operator,
    so the same sums run as per-row ``filter()`` array expressions.
    Interpreted-lambda cost is per arriving event and tiny next to the
    state-store lookup; equivalence with the batch scorer is pinned by
    ``tests/test_streaming.py``. First-wins matches min-doc_id when
    ingest order follows doc_id (single-file replay); under arbitrary
    arrival interleaving the kept representative may differ — exactly
    the reference's order-dependent ``first`` semantics."""
    # stage the token array once per row, then reference it by name —
    # streaming projections don't suffer the CollapseProject-into-
    # Generate inlining hazard because nothing explodes here
    def in_list(words: tuple[str, ...]) -> str:
        quoted = ", ".join(f"'{w}'" for w in words)
        return f"size(filter(toks, x -> x IN ({quoted})))"

    s = {lang: in_list(words) for lang, words in STOPWORDS.items()}
    lang_case = (
        f"CASE WHEN {s['en']} >= {s['es']} AND {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} THEN 'en' "
        f"WHEN {s['es']} >= {s['de']} AND {s['es']} >= {s['fr']} THEN 'es' "
        f"WHEN {s['de']} >= {s['fr']} THEN 'de' ELSE 'fr' END"
    )
    quality = (
        f"round(0.5 * least({s['en']} / cast(size(toks) as double) * 5.0, 1.0)"
        " + 0.3 * (1.0 - regexp_count(text, '[^A-Za-z0-9\\\\s]') / cast(length(text) as double))"
        " + 0.2 * (1.0 - size(filter(toks, x -> length(x) <= 2)) / cast(size(toks) as double)), 6)"
    )
    scored = docs_stream.withColumn("toks", F.expr(SPARK_TOKS)).select(
        "doc_id",
        F.expr(f"md5({NORM_SPARK})").alias("fingerprint"),
        F.expr(lang_case).alias("pred_lang"),
        F.expr(quality).alias("quality"),
    )
    return (
        scored.filter(F.col("quality") >= threshold)
        .dropDuplicates(["fingerprint"])
        .select("doc_id", "pred_lang", "quality")
    )


def dedup_corpus(docs: DataFrame, threshold: float = QUALITY_THRESHOLD) -> DataFrame:
    """The full-chain curation pipeline a 100 TB training-data run
    executes: quality gate → exact dedup (corpus_curation) → MinHash
    near-dup CLUSTERING over the curated set → keep one canonical doc
    per similarity cluster → per (pred_lang, source) corpus report.
    Output: (pred_lang, source, n_docs, mean_quality).

    Every stage is a component already proven individually (curation
    manifest, LSH pairs, connected components); this entry pins that
    they COMPOSE — ids flow between stages through equi-joins only,
    and the final mean is computed on fixed-point-quantized quality
    (order-independent bigint sums, integer half-up rounding — the
    cell_centroids determinism pattern)."""
    from siddhi_execution_unique_spark.functions.dedup import near_dup_clusters

    # the curation manifest feeds THREE consumers (curated-doc set for
    # shingling, the CC edge pipeline indirectly, the final report
    # join); localCheckpoint materializes the expensive explode+agg
    # scoring once instead of once per branch (ContextCleaner reclaims
    # the blocks when the frame is dropped — unlike persist(), nothing
    # accumulates across invocations)
    manifest = _checkpointed(corpus_curation(docs, threshold))
    curated_docs = docs.join(manifest.select("doc_id"), "doc_id")
    clusters = near_dup_clusters(curated_docs)
    kept = manifest.join(
        clusters.filter(F.col("keep")).select("doc_id"), "doc_id"
    ).join(docs.select("doc_id", "source"), "doc_id")
    return (
        kept.select(
            "pred_lang",
            "source",
            F.expr("cast(round(quality * 1000000) as bigint)").alias("qq"),
        )
        .groupBy("pred_lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("qq").alias("qsum"))
        .select(
            "pred_lang",
            "source",
            "n_docs",
            F.expr(
                "((2 * qsum + n_docs) div (2 * n_docs))"
                " / cast(1000000 as double)"
            ).alias("mean_quality"),
        )
    )


def dedup_corpus_oracle(threshold: float = QUALITY_THRESHOLD) -> str:
    from siddhi_execution_unique_spark.functions.dedup import near_dup_pairs_oracle

    return f"""
        WITH RECURSIVE cur AS ({corpus_curation_oracle(threshold)}),
        curdocs AS (
          SELECT d.* FROM documents d JOIN cur USING (doc_id)
        ),
        pairs AS ({near_dup_pairs_oracle(table="curdocs")}),
        edges AS (
          SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
          UNION ALL
          SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
        ),
        reach(src, node) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        labels AS (
          SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY src
        ),
        kept AS (
          SELECT c.doc_id, c.pred_lang, d.source,
                 CAST(round(c.quality * 1000000) AS BIGINT) AS qq
          FROM cur c
          JOIN documents d ON c.doc_id = d.doc_id
          LEFT JOIN labels l ON c.doc_id = l.doc_id
          WHERE COALESCE(l.cluster_id, c.doc_id) = c.doc_id
        )
        SELECT pred_lang, source, count(*) AS n_docs,
               ((2 * CAST(sum(qq) AS BIGINT) + count(*)) // (2 * count(*)))
                 / CAST(1000000 AS DOUBLE) AS mean_quality
        FROM kept GROUP BY pred_lang, source
    """


# ---------------------------------------------------------------------
# End-to-end pretraining-chunk pipeline:
# line dedup -> quality gate on the CLEANED text -> fixed-token chunks

def pretrain_chunks(docs: DataFrame,
                    threshold: float = QUALITY_THRESHOLD) -> DataFrame:
    """The full document-to-training-sequence path a pretraining run
    takes: cross-document boilerplate lines are removed
    (:func:`~siddhi_execution_unique_spark.functions.dedup.line_dedup`),
    the quality gate scores the CLEANED text (boilerplate must not
    count toward quality), and surviving documents are split into
    overlapping fixed-token chunks
    (:func:`~siddhi_execution_unique_spark.functions.curation.chunk_documents`).
    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_hash, quality).

    Composition stays one declarative Catalyst graph: each stage is
    the already-plan-audited shape of its component operator (segment
    frequency agg + equi-join + listagg rebuild; explode + hash-agg
    scoring; shuffle-free chunk projection), chained by doc_id
    equi-joins — no new shuffle patterns appear by composing."""
    from siddhi_execution_unique_spark.functions.curation import chunk_documents
    from siddhi_execution_unique_spark.functions.dedup import line_dedup
    from siddhi_execution_unique_spark.functions.text import quality_score

    cleaned = (
        line_dedup(docs)
        .filter(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    q = quality_score(cleaned).select("doc_id", "quality")
    kept = cleaned.join(q.filter(F.col("quality") >= threshold), "doc_id")
    return chunk_documents(kept.select("doc_id", "text")).join(
        q, "doc_id"
    ).select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_hash", "quality")


def pretrain_chunks_oracle(threshold: float = QUALITY_THRESHOLD) -> str:
    from siddhi_execution_unique_spark.functions.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    from siddhi_execution_unique_spark.functions.dedup import (
        SEG_LEN,
        SEG_MIN_DOCS,
        _NSEG_DUCK,
    )
    from siddhi_execution_unique_spark.functions.text import DUCK_TOKS

    stop_sum = (
        f"list_sum(list_transform({DUCK_TOKS}, x -> "
        f"({_in_list_sql('x', STOPWORDS['en'])})))"
    )
    short_sum = (
        f"list_sum(list_transform({DUCK_TOKS}, x -> "
        f"(CASE WHEN length(x) <= 2 THEN 1 ELSE 0 END)))"
    )
    punct = r"len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))"
    return f"""
        WITH segs AS (
          SELECT doc_id, g,
                 array_to_string(toks[(g * {SEG_LEN} + 1):(g * {SEG_LEN} + {SEG_LEN})], ' ') AS seg
          FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
               unnest(generate_series(0, {_NSEG_DUCK} - 1)) AS t(g)
        ),
        boiler AS (
          SELECT seg FROM segs GROUP BY seg
          HAVING count(DISTINCT doc_id) >= {SEG_MIN_DOCS}
        ),
        cleaned AS (
          SELECT doc_id, text FROM (
            SELECT s.doc_id,
                   coalesce(string_agg(s.seg, ' ' ORDER BY s.g)
                            FILTER (WHERE b.seg IS NULL), '') AS text
            FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
            GROUP BY s.doc_id
          ) WHERE text <> ''
        ),
        q AS (
          SELECT doc_id,
                 round(0.5 * least({stop_sum} / CAST(len({DUCK_TOKS}) AS DOUBLE) * 5.0, 1.0)
                       + 0.3 * (1.0 - {punct} / CAST(length(text) AS DOUBLE))
                       + 0.2 * (1.0 - {short_sum} / CAST(len({DUCK_TOKS}) AS DOUBLE)), 6)
                   AS quality
          FROM cleaned
        ),
        kept AS (
          SELECT c.doc_id, c.text, q.quality
          FROM cleaned c JOIN q USING (doc_id)
          WHERE q.quality >= {threshold}
        )
        SELECT doc_id, chunk_id,
               least({CHUNK_TOKENS}, len(toks) - chunk_id * {CHUNK_STRIDE})
                 AS n_chunk_tokens,
               md5(array_to_string(
                 toks[(chunk_id * {CHUNK_STRIDE} + 1):(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS})],
                 ' ')) AS chunk_hash,
               quality
        FROM (SELECT doc_id, {DUCK_TOKS} AS toks, quality FROM kept),
             unnest(generate_series(
               0, CAST(floor((len(toks) - 1) / {CHUNK_STRIDE}) AS INT))) AS t(chunk_id)
    """
