"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing (SURVEY.md §7 phase 4)."""

from siddhi_execution_unique_spark.functions import (
    analytics,
    asof,
    curation,
    dedup,
    fuzzy,
    graph,
    multimodal,
    pipeline,
    retrieval,
    sessions,
    similarity,
    sketch,
    text,
)

__all__ = [
    "analytics",
    "asof",
    "curation",
    "dedup",
    "fuzzy",
    "graph",
    "multimodal",
    "pipeline",
    "retrieval",
    "sessions",
    "similarity",
    "sketch",
    "text",
]
