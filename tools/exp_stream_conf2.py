"""Round-14 streaming-harness config A/B (guide §1): one stateful twin
certification body (deduplicate_exact_stream) timed per config, at the
REGISTRY's shipped 8 state partitions, isolating RocksDB changelog
checkpointing, row tracking, provider class, and the read-back
materialization style.

Usage: python tools/exp_stream_conf2.py
"""

from __future__ import annotations

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

ROCKS = ("org.apache.spark.sql.execution.streaming.state."
         "RocksDBStateStoreProvider")
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")
PFX = "spark.sql.streaming.stateStore."


def run_once(spark, lazy_read: bool = False) -> float:
    from siddhi_execution_unique_spark import streaming as stw
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    work = tempfile.mkdtemp(prefix="sgraft_exp2_")
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    schema = entry_mod._stage_replay_file(
        spark, SF, "events", os.path.join(indir, "events.parquet"))
    t0 = time.perf_counter()
    sdf = stream_table(spark, indir, schema)
    out = stw.deduplicate_exact_stream(sdf, "user_id", HOUR, ts="ts")
    outdir = os.path.join(work, "out")
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
    res = spark.read.parquet(outdir)
    if lazy_read:
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
    else:
        res = res.localCheckpoint(eager=True)
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        shutil.rmtree(work, ignore_errors=True)
    return dt


CONFIGS = [
    ("8part rocks (shipped)", {}, False),
    ("8p rocks+changelog", {PFX + "rocksdb.changelogCheckpointing.enabled": "true"}, False),
    ("8p rocks+noTrackRows", {PFX + "rocksdb.trackTotalNumberOfRows": "false"}, False),
    ("8p rocks+chglog+noTrack", {
        PFX + "rocksdb.changelogCheckpointing.enabled": "true",
        PFX + "rocksdb.trackTotalNumberOfRows": "false"}, False),
    ("8p hdfs provider", {PFX + "providerClass": HDFS}, False),
    ("8p rocks lazy-read (no localCkpt)", {}, True),
    ("8p rocks+chglog+noTrack lazy", {
        PFX + "rocksdb.changelogCheckpointing.enabled": "true",
        PFX + "rocksdb.trackTotalNumberOfRows": "false"}, True),
]


def main() -> None:
    spark = get_spark(app_name="exp-stream-conf2")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {
        PFX + "rocksdb.changelogCheckpointing.enabled": "false",
        PFX + "rocksdb.trackTotalNumberOfRows": "true",
        PFX + "providerClass": ROCKS,
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    run_once(spark)  # warm
    for label, conf, lazy in CONFIGS:
        for k, v in {**defaults, **conf}.items():
            spark.conf.set(k, v)
        times = [run_once(spark, lazy) for _ in range(3)]
        print(f"{label:36s} min={min(times):6.3f}s all="
              f"{[round(t, 2) for t in times]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
