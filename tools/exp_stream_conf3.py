"""Experiment (r15, VERDICT r14 item 2): attack the streaming
certification floor (33 entries x ~2 s of micro-batch machinery) with
the session-level knobs the r14 round did NOT A/B:

  base  : shipped conf (RocksDB provider + changelog checkpointing)
  maint : stateStore.maintenanceInterval=600s (never fires inside a
          2 s certification; default 60s can fire mid-entry and its
          snapshot upload competes with the run)
  retain: minBatchesToRetain=2 (offset/commit/state log purge work
          tracks a 2-file retention window instead of 100)
  wbuf  : rocksdb.writeBufferSizeMB=8 (tiny state; the default arena
          reserves far more than a certification ever writes)
  falloc: rocksdb.allowFAllocate=false (no preallocation for WAL/SST
          on a state store holding KBs)
  compact: rocksdb.compactOnCommit=true (VERDICT asked for the A/B;
          expected WORSE - compaction per commit)
  combo : the winners combined (edit after reading the singles)

Each variant gets a FRESH SparkSession (maintenance executor state is
per-context). Entries run through the registry wrappers, so the
per-entry state-partition sizing (_with_stream_conf) still applies.

Usage: python tools/exp_stream_conf3.py [runs_per_query] [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "streaming_dedup_parity",        # python stateful (applyInPandasWithState)
    "streaming_length_batch_parity", # heaviest (2.6 s), dual channel
    "streaming_time_batch_parity",
    "streaming_ever_parity",         # native state (dropDuplicates-style)
    "streaming_outer_join_parity",   # stream-stream join, 4 state stores
    "siddhiql_streaming_agg_parity", # staged two-run checkpoint
    "streaming_sessionize_parity",   # 16-partition python stateful
]

ROCKS = "spark.sql.streaming.stateStore.rocksdb."
VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "maint": {"spark.sql.streaming.stateStore.maintenanceInterval": "600s"},
    "retain": {"spark.sql.streaming.minBatchesToRetain": "2"},
    "wbuf": {ROCKS + "writeBufferSizeMB": "8"},
    "falloc": {ROCKS + "allowFAllocate": "false"},
    "compact": {ROCKS + "compactOnCommit": "true"},
    "combo": {
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
        "spark.sql.streaming.minBatchesToRetain": "2",
        ROCKS + "writeBufferSizeMB": "8",
        ROCKS + "allowFAllocate": "false",
    },
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from siddhi_execution_unique_spark.session import get_spark

    results: dict[str, dict[str, float]] = {n: {} for n in ENTRIES}
    # CLI order is honored (and names may repeat, e.g. "base ... base"
    # to witness same-process JVM-warmup drift); later duplicates
    # overwrite earlier timings
    order = list(sys.argv[2:]) if only else list(VARIANTS)
    for vname in order:
        conf = VARIANTS[vname]
        spark = get_spark(app_name=f"exp-stream-{vname}", extra_conf=conf)
        spark.sparkContext.setLogLevel("ERROR")
        queries = entry_mod.queries()
        force(queries[ENTRIES[0]](spark, SF_DIR))  # session warm-up
        for n in ENTRIES:
            fn = queries[n]
            spark.sparkContext.setJobDescription(f"{vname}:{n}")
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                force(fn(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            results[n][vname] = round(best, 3)
            print(f"{vname:7s} {n:42s} {best:6.3f}s", flush=True)
        spark.stop()
        tot = sum(results[n].get(vname, 0.0) for n in ENTRIES)
        print(f"{vname:7s} TOTAL {tot:7.3f}s", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
