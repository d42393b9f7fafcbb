"""Dump StreamingQuery recentProgress durationMs breakdown for one
parity-style run (guide §1: where does the micro-batch wall time go).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from siddhi_execution_unique_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOUR = 3600 * 1000


def main() -> None:
    from siddhi_execution_unique_spark import streaming as stw
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    spark = get_spark(app_name="exp-stream-progress")
    spark.sparkContext.setLogLevel("ERROR")
    for trial in range(3):
        work = tempfile.mkdtemp(prefix="sgraft_expp_")
        indir = os.path.join(work, "in")
        os.makedirs(indir)
        schema = entry_mod._stage_replay_file(
            spark, SF, "events", os.path.join(indir, "events.parquet"))
        sdf = stream_table(spark, indir, schema)
        out = stw.deduplicate_exact_stream(sdf, "user_id", HOUR, ts="ts")
        outdir = os.path.join(work, "out")
        t0 = time.perf_counter()
        q = (
            out.select(
                "event_id", F.unix_millis("ts").alias("ts_ms"),
                "user_id", "event_type", "value", "props",
            )
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        print(f"== trial {trial}: wall {dt:.3f}s", flush=True)
        for p in q.recentProgress:
            d = {k: p[k] for k in ("batchId", "numInputRows")}
            d["durationMs"] = p["durationMs"]
            print(json.dumps(d), flush=True)
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
