"""Full-registry Spark-vs-DuckDB oracle sweep at an arbitrary SF dir.

The driver certifies a rotating 50-entry window at sf0.01 each round;
this harness runs EVERY ``queries()`` entry against its DuckDB oracle
at a chosen scale (built for the /tmp/sf1 10x corpus) and records a
per-entry verdict + wall-times so BASELINE.md can carry a measured
"full-registry sfN parity" table instead of spot checks.

Resumable: results are flushed to the output JSON after every entry
and pass/rows_only entries are skipped on re-run, so an interrupted
sweep continues where it stopped.

Usage: python tools/oracle_sweep.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Above this row count the pure-Python tuple compare (test_oracle_parity
# _normalize) is too slow (11M-pair results at sf1); use DuckDB
# EXCEPT ALL set-difference in both directions instead — exact, and it
# runs vectorized.
PY_COMPARE_MAX_ROWS = 200_000


def _round_floats(df):
    import numpy as np

    for col in df.columns:
        if df[col].dtype.kind == "f":
            df[col] = np.round(df[col], 9)
    return df


def _normalize_py(df):
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(
            round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
            for v in tup
        ))
    return sorted(rows, key=repr)


def _compare(name: str, spark_df, duck_df, con) -> dict:
    """Mirror of tests/test_oracle_parity.py semantics, plus a
    large-result fast path. Returns a result dict with status."""
    res: dict = {}
    if len(spark_df) != len(duck_df):
        return {"status": "fail", "why": "row count",
                "spark_rows": len(spark_df), "duck_rows": len(duck_df)}
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return {"status": "fail", "why": "schema",
                "spark_cols": sorted(spark_df.columns),
                "duck_cols": sorted(duck_df.columns)}
    cols = sorted(spark_df.columns)
    spark_df = spark_df[cols]
    duck_df = duck_df[cols]
    for col in cols:
        sk, dk = spark_df[col].dtype.kind, duck_df[col].dtype.kind
        if {sk, dk} <= {"i", "u", "f"} and (sk in "iu") != (dk in "iu"):
            return {"status": "fail", "why": f"dtype kind {col}",
                    "spark_dtype": str(spark_df[col].dtype),
                    "duck_dtype": str(duck_df[col].dtype)}
    res["rows"] = len(spark_df)
    if len(spark_df) <= PY_COMPARE_MAX_ROWS:
        if _normalize_py(spark_df) == _normalize_py(duck_df):
            res["status"] = "pass"
            return res
        return {**res, "status": "fail", "why": "values (py compare)"}
    # large result: round floats (same 9-dp rule), EXCEPT ALL both ways
    spark_df = _round_floats(spark_df.copy())
    duck_df = _round_floats(duck_df.copy())
    con.register("_sweep_a", spark_df)
    con.register("_sweep_b", duck_df)
    sel = ", ".join(f'"{c}"' for c in cols)
    try:
        d1 = con.sql(f"SELECT count(*) FROM (SELECT {sel} FROM _sweep_a "
                     f"EXCEPT ALL SELECT {sel} FROM _sweep_b)").fetchone()[0]
        d2 = con.sql(f"SELECT count(*) FROM (SELECT {sel} FROM _sweep_b "
                     f"EXCEPT ALL SELECT {sel} FROM _sweep_a)").fetchone()[0]
    finally:
        con.unregister("_sweep_a")
        con.unregister("_sweep_b")
    if d1 == 0 and d2 == 0:
        res["status"] = "pass"
        res["compare"] = "duckdb_except_all"
        return res
    return {**res, "status": "fail", "why": "values (except-all)",
            "only_spark": d1, "only_duck": d2}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "SWEEP_SF1.json")
    # data-dependent oracles (pca_project's literal eigenvectors) must
    # be built for the SAME corpus the sweep compares at
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import duckdb

    import __spark_entry__ as entry_mod
    from siddhi_execution_unique_spark.session import get_spark

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results: dict = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f).get("entries", {})

    # pair-dense entries return millions of rows at sf1 (the
    # streaming_join_parity interval join; dedup_char_ngram_jaccard
    # at 288.6k since the r14 stop-gram redesign — it was 11.1M
    # before); the comparison collect needs more than the 1g default
    # (heap stays at the factory's GC-tuned 8g — the serialized result
    # buffer streams out through Arrow)
    spark = get_spark(app_name="oracle-sweep", shuffle_partitions=32,
                      extra_conf={"spark.driver.maxResultSize": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # rebuilt 10x tables are Spark-written parquet DIRECTORIES;
        # driver-generated ones are single files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    def flush() -> None:
        tmp = out + ".tmp"
        done = [r for r in results.values()
                if r.get("status") in ("pass", "rows_only")]
        payload = {
            "sf_dir": sf_dir,
            "entries_total": len(queries),
            "entries_done": len(results),
            "entries_green": len(done),
            "spark_sec_total": round(sum(
                r.get("spark_sec", 0) for r in results.values()), 1),
            "entries": results,
        }
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, out)

    only = os.environ.get("SWEEP_ONLY")
    todo = [n for n in sorted(queries)
            if results.get(n, {}).get("status") not in ("pass", "rows_only")]
    if only:
        todo = [n for n in todo if n in set(only.split(","))]
    print(f"sweep {sf_dir}: {len(todo)}/{len(queries)} to run", flush=True)
    # chain oracles whose WITH RECURSIVE rescans events per step are
    # super-linear at sf1; use the selfchecked linear rewrites there
    # (tools/scale_oracles.py — chain walked in Python, certified tail
    # SQL verbatim). Two guards (ADVICE r11): (1) the equivalence is
    # re-proven by THIS process at sf0.01 before any substitution, not
    # inherited from the test suite having once pinned it; (2) below a
    # row-count threshold the certified recursive SQL is cheap, so
    # small-SF sweeps keep exercising it directly and the rewrite only
    # substitutes where the recursion is actually super-linear.
    from scale_oracles import SCALE_ORACLES, selfcheck

    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    use_rewrites = n_events > int(
        os.environ.get("SWEEP_REWRITE_MIN_EVENTS", "200000"))
    if use_rewrites:
        print("sweep: proving linear rewrites == certified SQL at sf0.01 "
              "before substituting...", flush=True)
        if not selfcheck("/root/testdata/sf0.01"):
            raise SystemExit(
                "scale_oracles selfcheck FAILED — refusing to sweep with "
                "unproven rewrites")

    for i, name in enumerate(todo):
        t0 = time.perf_counter()
        try:
            spark_df = queries[name](spark, sf_dir).toPandas()
            t_spark = round(time.perf_counter() - t0, 2)
            if use_rewrites and name in SCALE_ORACLES:
                t1 = time.perf_counter()
                duck_df = SCALE_ORACLES[name](con)
                t_duck = round(time.perf_counter() - t1, 2)
                rec = _compare(name, spark_df, duck_df, con)
                rec["duck_sec"] = t_duck
                rec["oracle"] = "linear-rewrite(selfchecked in-run at sf0.01)"
            elif name in oracles:
                t1 = time.perf_counter()
                duck_df = con.sql(oracles[name]).df()
                t_duck = round(time.perf_counter() - t1, 2)
                rec = _compare(name, spark_df, duck_df, con)
                rec["duck_sec"] = t_duck
            else:
                rec = {"status": "rows_only", "rows": len(spark_df)}
            rec["spark_sec"] = t_spark
        except Exception:
            rec = {"status": "error",
                   "spark_sec": round(time.perf_counter() - t0, 2),
                   "err": traceback.format_exc()[-1500:]}
        results[name] = rec
        flush()
        print(f"[{i + 1}/{len(todo)}] {name}: {rec['status']} "
              f"spark={rec.get('spark_sec')}s duck={rec.get('duck_sec', '-')}s",
              flush=True)

    greens = sum(1 for r in results.values()
                 if r.get("status") in ("pass", "rows_only"))
    print(f"DONE: {greens}/{len(queries)} green", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
