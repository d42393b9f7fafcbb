"""Capture .explain('formatted') for named queries into plans/<round>/
(set SPARK_GRAFT_PLANS_ROUND, default r15).

Usage: python tools/capture_plans.py before|after query [query...]
       python tools/capture_plans.py before|after @file-with-names
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from siddhi_execution_unique_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans",
                   os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))


def main() -> None:
    tag = sys.argv[1]
    names: list[str] = []
    for a in sys.argv[2:]:
        if a.startswith("@"):
            with open(a[1:]) as f:
                names.extend(x.strip() for x in f if x.strip())
        else:
            names.append(a)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_ex} Exchange -> {path}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
