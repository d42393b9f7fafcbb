"""Experiment (r15, VERDICT r14 item 4): the core-count-hostile
entries — contamination_check (3.0 s @32 vs 0.86 s @8),
corpus_pack_shards, corpus_mixture_stats, events_range_join — run 3-4x
SLOWER at 32 cores than 8 at sf0.1. Hypothesis: fixed
shuffle.partitions = cpus plus AQE's parallelism-first coalescing
leaves dozens of KB-sized shuffle partitions whose task/exchange
overhead dominates a ~17 MB input.

A/B session-config variants over the hostile set plus controls that
currently parallelize well (they must not regress):

  base   : shipped conf (shuffle.partitions = SPARK_GRAFT_CPUS)
  pf     : adaptive.coalescePartitions.parallelismFirst=false
           (advisory 64m — AQE coalesces to data size, not core count)
  pf16   : parallelismFirst=false + advisoryPartitionSizeInBytes=16m
  p8     : shuffle.partitions=8 (diagnostic: the c8 advantage is
           partition count, not core count)

Usage: python tools/exp_tiny_partitions.py [runs_per_query]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HOSTILE = [
    "contamination_check", "corpus_mixture_stats",
    "corpus_quality_percentiles", "corpus_pack_shards",
    "events_range_join", "events_time_rollup", "events_sessionize",
    "events_asof_join",
]
CONTROLS = [
    "dedup_semantic", "text_repetition_stats", "vocab_top_tokens",
    "dedup_char_ngram_jaccard", "sim_ivf_topk",
]

VARIANTS = {
    "base": {},
    "pf": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "pf16": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    },
    "p8": {"spark.sql.shuffle.partitions": "8"},
    # parallelismFirst stays TRUE (CPU-heavy small-byte stages keep
    # their parallelism headroom); only sub-minPartitionSize reduce
    # partitions coalesce, so a 17 MB shuffle at 32 partitions
    # (~0.5 MB each) folds to ~4-8 while anything with real bytes is
    # untouched
    "mps2": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "2m"},
    "mps4": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "4m"},
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    order = list(sys.argv[2:]) or list(VARIANTS)
    import __spark_entry__ as entry_mod
    from siddhi_execution_unique_spark.session import get_spark

    names = HOSTILE + CONTROLS
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for vname in order:
        conf = VARIANTS[vname]
        spark = get_spark(app_name=f"exp-tiny-{vname}", extra_conf=conf)
        spark.sparkContext.setLogLevel("ERROR")
        queries = entry_mod.queries()
        # session warm-up (JVM, parquet footers, Arrow workers)
        force(queries[names[0]](spark, SF_DIR))
        for n in names:
            fn = queries[n]
            spark.sparkContext.setJobDescription(f"{vname}:{n}")
            force(fn(spark, SF_DIR))  # plan compile warm
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                force(fn(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            results[n][vname] = round(best, 3)
            print(f"{vname:5s} {n:32s} {best:6.3f}s", flush=True)
        spark.stop()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
