"""Plan-shape audit over every registry entry (guide §7.2): count the
operators that matter for scale (Exchange, global Sort, Python eval,
cartesian shapes, scans) so plan smells pop out as a table instead of
reading 216 explain files.

Usage: python tools/plan_stats.py [out_tsv]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from siddhi_execution_unique_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

MARKS = (
    "Exchange", "FileScan", "Sort ", "Window", "MapInPandas",
    "FlatMapGroupsInPandas", "BatchEvalPython", "ArrowEvalPython",
    "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
    "BroadcastHashJoin", "ShuffledHashJoin", "Union", "Generate",
    "LocalTableScan",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_stats.tsv"
    spark = get_spark(app_name="plan-stats")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    rows = []
    with open(out_path, "w") as out:
        out.write("entry\tbuild_s\t" + "\t".join(m.strip() for m in MARKS) + "\n")
        for name in sorted(queries):
            t0 = time.perf_counter()
            try:
                df = queries[name](spark, SF)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # noqa: BLE001
                out.write(f"{name}\tERROR {type(e).__name__}\n")
                continue
            dt = time.perf_counter() - t0
            counts = [plan.count(m) for m in MARKS]
            rows.append((name, dt, counts))
            out.write(f"{name}\t{dt:.2f}\t" + "\t".join(map(str, counts)) + "\n")
            out.flush()
    print(f"wrote {out_path} ({len(rows)} entries)")
    spark.stop()


if __name__ == "__main__":
    main()
