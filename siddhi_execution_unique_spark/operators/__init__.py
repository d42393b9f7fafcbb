"""The 11 uniqueness operators of the reference, Spark-first.

Pure-Catalyst tier (single hash-aggregation plans):
``ever``, ``first``, ``time_batch``, ``first_time_batch``,
``external_time_batch``, ``time_window``, ``length_window``.

Stateful replay tier (Arrow/pandas):
``deduplicate`` (key-distributed), ``length_batch``,
``first_length_batch``, ``time_length_batch`` (globally ordered).
"""

from siddhi_execution_unique_spark.operators.keyed import ever, ever_expired, first
from siddhi_execution_unique_spark.operators.length import (
    length_exit_instants,
    length_window,
    length_window_emissions,
    length_window_emissions_distributed,
    length_window_emissions_indexed,
    length_window_emissions_indexed_partitioned,
    length_window_partitioned,
)
from siddhi_execution_unique_spark.operators.replay import (
    deduplicate,
    first_length_batch,
    length_batch,
    length_batch_all,
    length_batch_forming,
    length_batch_forming_partitioned,
    length_batch_periods,
    time_length_batch_all,
    time_length_batch_all_partitioned,
    length_batch_expired,
    length_batch_partitioned,
    time_length_batch,
    time_length_batch_distributed,
    time_length_batch_expired,
    time_length_batch_partitioned,
    time_length_batch_expired_partitioned,
)
from siddhi_execution_unique_spark.operators.time_batch import (
    expired_channel,
    expired_channel_partitioned,
    all_channel,
    all_channel_partitioned,
    external_time_batch,
    external_time_batch_all,
    external_time_batch_all_partitioned,
    external_time_batch_expired,
    external_time_batch_expired_partitioned,
    external_time_batch_partitioned,
    first_time_batch,
    time_batch,
)
from siddhi_execution_unique_spark.operators.time_window import time_window

__all__ = [
    "deduplicate",
    "ever",
    "ever_expired",
    "expired_channel",
    "expired_channel_partitioned",
    "external_time_batch",
    "external_time_batch_expired",
    "external_time_batch_expired_partitioned",
    "external_time_batch_partitioned",
    "first",
    "first_length_batch",
    "first_time_batch",
    "length_batch",
    "length_batch_expired",
    "length_batch_forming",
    "length_batch_forming_partitioned",
    "length_batch_periods",
    "length_batch_partitioned",
    "length_exit_instants",
    "length_window",
    "length_window_partitioned",
    "time_batch",
    "time_length_batch",
    "time_length_batch_distributed",
    "time_length_batch_expired",
    "time_length_batch_partitioned",
    "time_length_batch_expired_partitioned",
    "time_window",
]
