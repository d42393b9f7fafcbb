"""Controlled experiment (guide §1): per-config timing of one
streaming-twin certification body (deduplicate_exact_stream over the
events replay) to separate state-partition count, RocksDB changelog
checkpointing, checkpoint placement, and provider class.

Usage: python tools/exp_stream_conf.py
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


def run_once(spark, tmp_base: str) -> float:
    from siddhi_execution_unique_spark import streaming as stw
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    work = tempfile.mkdtemp(prefix="sgraft_exp_", dir=tmp_base)
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
    n = spark.read.parquet(outdir).count()
    shutil.rmtree(work, ignore_errors=True)
    print(f"    rows={n}", flush=True)
    return dt


CONFIGS = [
    ("baseline 32part rocks", {}, "/tmp"),
    ("8 partitions", {"spark.sql.shuffle.partitions": "8"}, "/tmp"),
    ("4 partitions", {"spark.sql.shuffle.partitions": "4"}, "/tmp"),
    ("4part+changelog", {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true"}, "/tmp"),
    ("32part+changelog", {
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true"}, "/tmp"),
    ("4part+changelog+shm", {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true"}, "/dev/shm"),
    ("4part hdfs-provider", {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.streaming.stateStore.providerClass": HDFS}, "/tmp"),
    ("32part hdfs-provider", {
        "spark.sql.streaming.stateStore.providerClass": HDFS}, "/tmp"),
]


def main() -> None:
    spark = get_spark(app_name="exp-stream-conf")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"),
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "false",
        "spark.sql.streaming.stateStore.providerClass": ROCKS,
    }
    run_once(spark, "/tmp")  # warm
    for label, conf, tmp_base in CONFIGS:
        for k, v in {**defaults, **conf}.items():
            spark.conf.set(k, v)
        times = [run_once(spark, tmp_base) for _ in range(3)]
        print(f"{label:28s} min={min(times):6.3f}s  all="
              f"{[round(t, 2) for t in times]}", flush=True)
    for k, v in defaults.items():
        spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()
