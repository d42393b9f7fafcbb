"""Per-task skew probe: run registry entries on a hot-key corpus and
record what the executor actually saw (VERDICT r11 next-round item 3).

For each entry this harness executes the query and then reads two
witnesses no wall-clock number can fake:

- the FINAL adaptive plan (``queryExecution().executedPlan()`` after
  the action, so ``AdaptiveSparkPlan isFinalPlan=true``): counts of
  ``AQEShuffleRead`` nodes and ``skew=true`` markers show whether AQE
  re-planned/split at runtime;
- the Spark REST API's per-stage ``taskSummary`` quantiles: the
  max/median task-duration ratio of the heaviest stages is the direct
  measurement of "one hot key = one straggler task".

With ``SKEW_AQE_DEMO=1`` the adaptive skew-join thresholds are lowered
to corpus scale (the defaults need a 256 MB partition, which a 1M-row
local corpus never reaches) so the probe demonstrates the split AQE
would perform at real scale, where the default thresholds DO trip.

Usage: python tools/skew_probe.py [SF_DIR] [entry,entry,...]
Writes SKEW_PROBE.json next to the repo's other artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = int(os.environ.get("SKEW_PROBE_UI_PORT", "4057"))

DEFAULT_ENTRIES = [
    "unique_ever",
    "unique_time_batch",
    "events_funnel",
    "events_sessionize",
    "events_session_native",
    "dedup_clusters",
    "dedup_char_ngram_jaccard",
]


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _rest("/applications")[0]["id"]


def _stage_task_stats(app: str, min_stage: int) -> list[dict]:
    """max/median task duration for every completed stage whose id is
    >= min_stage (i.e. stages of the query just run), heaviest first."""
    out = []
    for st in _rest(f"/applications/{app}/stages?status=COMPLETE"):
        sid, att = st["stageId"], st["attemptId"]
        if sid < min_stage or st.get("numCompleteTasks", 0) == 0:
            continue
        try:
            q = _rest(
                f"/applications/{app}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        p50, mx = q["executorRunTime"]
        out.append({
            "stage": sid,
            "tasks": st["numCompleteTasks"],
            "task_p50_ms": round(p50, 1),
            "task_max_ms": round(mx, 1),
            "max_over_p50": round(mx / p50, 1) if p50 > 0 else None,
            "name": st.get("name", "")[:80],
        })
    out.sort(key=lambda s: -s["task_max_ms"])
    return out


def _next_stage_id(app: str) -> int:
    sids = [s["stageId"] for s in _rest(f"/applications/{app}/stages")]
    return max(sids) + 1 if sids else 0


def probe(spark, fn, sf_dir: str, app: str) -> dict:
    min_stage = _next_stage_id(app)
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    pdf = df.toPandas()  # executes the df's own queryExecution ->
    wall = round(time.perf_counter() - t0, 2)
    # ...so executedPlan() below is the FINAL adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    stages = _stage_task_stats(app, min_stage)
    return {
        "rows": len(pdf),
        "wall_sec": wall,
        "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
        "aqe_skew_marks": plan.count("skew=true"),
        "aqe_coalesced": plan.count("coalesced"),
        "stages_top": stages[:4],
        # only stages doing real work count as skew witnesses — a 5.6x
        # ratio on a 5 ms-median stage is scheduler noise, not skew
        "worst_max_over_p50": max(
            ((s["max_over_p50"] or 0)
             for s in stages if s["task_max_ms"] >= 200), default=None),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    names = (sys.argv[2].split(",") if len(sys.argv) > 2
             else list(DEFAULT_ENTRIES))

    import __spark_entry__ as entry_mod
    from siddhi_execution_unique_spark.session import get_spark

    extra = {"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)}
    if os.environ.get("SKEW_AQE_DEMO") == "1":
        # corpus-scale thresholds: same split logic AQE runs at the
        # default 256 MB threshold on a real cluster's partitions.
        # Broadcast is disabled because at 100 TB neither side of the
        # posting join fits in a broadcast — the demo must exercise
        # the sort-merge path OptimizeSkewedJoin actually splits.
        extra.update({
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        })
    spark = get_spark(app_name="skew-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    app = _app_id()

    results: dict = {}
    for name in names:
        # warm run: JIT/Janino compile + parquet footers, so task
        # times measure the data, not first-touch costs
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        results[name] = probe(spark, queries[name], sf_dir, app)
        r = results[name]
        print(f"{name}: rows={r['rows']} wall={r['wall_sec']}s "
              f"worst max/p50={r['worst_max_over_p50']} "
              f"skew_marks={r['aqe_skew_marks']}", flush=True)
    payload = {
        "sf_dir": sf_dir,
        "aqe_demo": os.environ.get("SKEW_AQE_DEMO") == "1",
        "entries": results,
    }
    out = os.path.join(REPO, "SKEW_PROBE.json")
    mode = "a" if os.environ.get("SKEW_PROBE_APPEND") == "1" else "w"
    with open(out, mode) as f:  # JSONL: one document per probe run
        json.dump(payload, f, separators=(",", ":"), sort_keys=True)
        f.write("\n")
    print(f"wrote {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
