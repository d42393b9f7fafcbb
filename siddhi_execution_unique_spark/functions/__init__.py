"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing (SURVEY.md §7 phase 4)."""

from siddhi_execution_unique_spark.functions import (
    asof,
    curation,
    dedup,
    multimodal,
    pipeline,
    retrieval,
    sessions,
    similarity,
    sketch,
    text,
)

__all__ = [
    "asof",
    "curation",
    "dedup",
    "multimodal",
    "pipeline",
    "retrieval",
    "sessions",
    "similarity",
    "sketch",
    "text",
]
