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
    fingerprint,
    fingerprint_oracle,
    lang_id,
    lang_id_oracle,
    quality_score,
    quality_score_oracle,
)

# keeps ~half the synthetic corpus (the gate must actually gate:
# min(quality) is 0.5 on this generator, so 0.5 would pass everything)
QUALITY_THRESHOLD = 0.65


def corpus_curation(docs: DataFrame, threshold: float = QUALITY_THRESHOLD) -> DataFrame:
    """Curated-corpus manifest: documents passing the quality gate,
    exact-deduplicated by normalized-text fingerprint (keep the
    minimum doc_id among passing duplicates), tagged with the
    predicted language. Output: (doc_id, pred_lang, quality)."""
    q = quality_score(docs).select("doc_id", "quality")
    fp = fingerprint(docs)
    keep = (
        fp.join(q, "doc_id")
        .filter(F.col("quality") >= threshold)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    lang = lang_id(docs).select("doc_id", "pred_lang")
    return keep.join(q, "doc_id").join(lang, "doc_id").select(
        "doc_id", "pred_lang", "quality"
    )


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
