"""Measure the applyInPandasWithState per-group protocol floor vs the
real dedup transition fn (guide §1: find where the time goes before
touching code).
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
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState, GroupStateTimeout)
from pyspark.sql.types import (  # noqa: E402
    LongType, StructField, StructType)
from siddhi_execution_unique_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOUR = 3600 * 1000
STATE = StructType([StructField("last", LongType())])


def run_stream(spark, build_out) -> float:
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    work = tempfile.mkdtemp(prefix="sgraft_expf_")
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    schema = entry_mod._stage_replay_file(
        spark, SF, "events", os.path.join(indir, "events.parquet"))
    sdf = stream_table(spark, indir, schema)
    out = build_out(sdf)
    outdir = os.path.join(work, "out")
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    shutil.rmtree(work, ignore_errors=True)
    return dt


def trivial_state(sdf):
    def fn(key, pdfs, state: GroupState):
        for _ in pdfs:
            pass
        if False:
            yield pd.DataFrame()

    return sdf.groupBy("user_id").applyInPandasWithState(
        fn, sdf.schema, STATE, "append", GroupStateTimeout.NoTimeout)


def passthrough_state(sdf):
    def fn(key, pdfs, state: GroupState):
        for pdf in pdfs:
            yield pdf
        state.update((1,))

    return sdf.groupBy("user_id").applyInPandasWithState(
        fn, sdf.schema, STATE, "append", GroupStateTimeout.NoTimeout)


def real_dedup(sdf):
    from siddhi_execution_unique_spark import streaming as stw

    return stw.deduplicate_exact_stream(sdf, "user_id", HOUR, ts="ts")


def jvm_only(sdf):
    return sdf.withWatermark("ts", "1 second").groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.max(F.unix_millis("ts")).alias("mx"))


def main() -> None:
    spark = get_spark(app_name="exp-group-floor")
    spark.sparkContext.setLogLevel("ERROR")
    n_keys = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .select("user_id").distinct().count())
    n_rows = spark.read.parquet(os.path.join(SF, "events.parquet")).count()
    print(f"events rows={n_rows} distinct user_id={n_keys}", flush=True)
    run_stream(spark, real_dedup)  # warm
    for label, b in [
        ("trivial-state fn", trivial_state),
        ("passthrough-state fn", passthrough_state),
        ("real dedup fn", real_dedup),
        ("jvm-only agg (no python)", jvm_only),
    ]:
        times = [run_stream(spark, b) for _ in range(3)]
        print(f"{label:28s} min={min(times):6.3f}s all="
              f"{[round(t, 2) for t in times]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
