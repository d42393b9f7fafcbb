"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing (SURVEY.md §7 phase 4)."""

from siddhi_execution_unique_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
