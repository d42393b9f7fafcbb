"""Engine-only heavy-tail bench at three scale points (VERDICT r11
item 5): run the 10 slowest non-streaming registry entries at sf0.1,
/tmp/sf1 (10x) and /tmp/sf10 (100x, tools/build_sf10.py) and record
wall time per (entry, scale) — no DuckDB oracle (the sf1 sweep proved
parity; at sf10 the oracle is the bottleneck, not the engine).

Methodology: one SparkSession, per-plan warm is NOT done (each point
is a cold first execution, same as the sweep's spark_sec, so the
three points are comparable); results are forced with the noop writer
so the full output materializes without a driver collect (pair
entries emit 10^8 rows at sf10). Incremental flush after every cell —
re-running skips completed cells.

The streaming twins are excluded deliberately: their cost is
certification-harness replay (file-fed micro-batches + state store),
measured separately by the 1M-row soaks; including them here would
conflate harness replay with engine throughput.

Usage: python tools/engine_bench.py [OUT=ENGINE_BENCH.json] [entries...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the 10 slowest non-streaming entries of the sf1 sweep (SWEEP_SF1.json)
HEAVY_TAIL = [
    "dedup_char_ngram_jaccard",
    "dedup_simhash_near_pairs",
    "multimodal_decode_jpeg_progressive_420",
    "multimodal_decode_jpeg_420",
    "contamination_check",
    "dedup_graph_pagerank",
    "multimodal_decode_jpeg_arith",
    "unique_length_emissions_ordered",
    "multimodal_decode_jpeg_progressive",
    "dedup_semantic",
]

SCALE_POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/sf1"),
    ("sf10", "/tmp/sf10"),
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "ENGINE_BENCH.json")
    names = sys.argv[2:] or list(HEAVY_TAIL)

    import __spark_entry__ as entry_mod
    from siddhi_execution_unique_spark.session import get_spark

    results: dict = {}
    if os.path.exists(out):
        results = json.load(open(out)).get("cells", {})
        # collateral errors (a dead SparkContext poisons every later
        # cell) are retried; genuine measured failures are kept
        results = {k: v for k, v in results.items()
                   if "stopped SparkContext" not in (v.get("err") or "")}

    def fresh_session():
        s = get_spark(app_name="engine-bench", shuffle_partitions=64)
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = fresh_session()
    queries = entry_mod.queries()

    # r13 recorded single-box capacity boundaries here for the two
    # pair entries at sf10 (uncapped candidate volume ~6-7e9 rows:
    # char-ngram ENOSPC at 524 s, simhash OOM at 268 s). The r14
    # redesign (GRAM_DF_CAP stop-grams; simhash rep-collapse +
    # BAND_OCCUPANCY_CAP) bounds candidate volume linearly, so the
    # cells are measured normally again.
    BOUNDARY: set = set()

    def flush() -> None:
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"points": dict(SCALE_POINTS), "cells": results},
                      f, indent=1, sort_keys=True)
        os.replace(tmp, out)

    for name in names:
        for sf_label, sf_dir in SCALE_POINTS:
            key = f"{name}@{sf_label}"
            if key in BOUNDARY and results.get(key, {}).get("err"):
                if not results[key].get("boundary"):
                    results[key]["boundary"] = (
                        "single-box capacity boundary: intermediate "
                        "candidate volume (pairs x shared-grams) exceeds "
                        "local disk/heap; linear per-executor at cluster "
                        "scale — see tool docstring")
                    flush()
                continue
            if key in results:
                continue
            if not os.path.isdir(sf_dir):
                results[key] = {"err": f"missing corpus {sf_dir}"}
                flush()
                continue
            if spark._jsc.sc().isStopped():
                spark = fresh_session()
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                results[key] = {"sec": round(time.perf_counter() - t0, 2)}
            except Exception as e:
                results[key] = {
                    "sec": round(time.perf_counter() - t0, 2),
                    "err": f"{type(e).__name__}: {e}"[:400],
                }
            flush()
            print(f"{key}: {results[key]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
