"""Render SWEEP_SF1.json into the BASELINE.md summary block:
green counts, the slowest Spark-side entries, and the oracle-cost
outliers (entries where the DuckDB verification dwarfs the engine)."""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_SF1.json"
    d = json.load(open(path))
    e = d["entries"]
    greens = [k for k, v in e.items() if v["status"] in ("pass", "rows_only")]
    oracled = [k for k, v in e.items() if v["status"] == "pass"]
    rows_only = [k for k, v in e.items() if v["status"] == "rows_only"]
    bad = {k: v for k, v in e.items() if v["status"] not in ("pass", "rows_only")}
    spark_total = sum(v.get("spark_sec", 0) for v in e.values())
    duck_total = sum(v.get("duck_sec") or 0 for v in e.values())
    print(f"entries: {len(e)}  green: {len(greens)} "
          f"(hash-oracled {len(oracled)} + rows-only {len(rows_only)})  "
          f"non-green: {len(bad)} {sorted(bad)}")
    print(f"spark total: {spark_total:.0f}s   duck oracle total: {duck_total:.0f}s")
    print("\nslowest spark side:")
    for s, du, k in sorted(((v.get("spark_sec", 0), v.get("duck_sec"), k)
                            for k, v in e.items()), reverse=True)[:6]:
        print(f"| {k} | {s:.1f} | {du} |")
    print("\noracle-dominated (duck >> spark):")
    for du, s, k in sorted((((v.get("duck_sec") or 0), v.get("spark_sec", 0), k)
                            for k, v in e.items()), reverse=True)[:6]:
        print(f"| {k} | {s:.1f} | {du:.1f} |")


if __name__ == "__main__":
    main()
