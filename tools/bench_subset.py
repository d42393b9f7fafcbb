"""Isolated re-timing of selected bench entries (guide §1): same
warm+min-of-2 methodology as bench.py but only for the named queries,
so a change's before/after is measurable in seconds, not minutes.

Usage: python tools/bench_subset.py name [name...]
       python tools/bench_subset.py @prefix   (all entries starting so)
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


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("@"):
            names.extend(n for n in sorted(queries) if n.startswith(a[1:]))
        else:
            names.append(a)
    # session warmup (mirrors bench.py)
    force(next(iter(queries.values()))(spark, SF))
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    total = 0.0
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        force(fn(spark, SF))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(spark, SF))
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{best:7.3f}  {name}", flush=True)
    print(f"{total:7.3f}  TOTAL ({len(names)} entries)")
    spark.stop()


if __name__ == "__main__":
    main()
