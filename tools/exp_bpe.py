"""Phase timing of bpe_train/bpe_encode (guide §1): where do the
8 rounds spend wall time — the per-round checkpoint chain or the
final union's re-aggregation of every round's best pair?
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from siddhi_execution_unique_spark.session import get_spark  # noqa: E402
from siddhi_execution_unique_spark.functions import curation  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="exp-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    print("docs:", docs.count(), "rows,",
          docs.rdd.getNumPartitions(), "partitions")

    # warm
    force(curation.bpe_train(docs))

    for trial in range(2):
        t0 = time.perf_counter()
        cur, bests = curation._bpe_fit(docs, 8)
        t1 = time.perf_counter()
        out = bests[0]
        for b in bests[1:]:
            out = out.unionAll(b)
        force(out)
        t2 = time.perf_counter()
        print(f"trial {trial}: fit(chain)={t1 - t0:6.3f}s "
              f"union-force={t2 - t1:6.3f}s total={t2 - t0:6.3f}s")

    # per-round cost breakdown of one fit
    import numpy as np  # noqa: F401
    docs2 = docs.select("doc_id", F.expr(curation.SPARK_TOKS).alias("toks"))
    t0 = time.perf_counter()
    cur = docs2.localCheckpoint()
    print(f"  initial tokenize+ckpt: {time.perf_counter() - t0:.3f}s")
    for rnd in range(1, 9):
        t0 = time.perf_counter()
        best = (
            cur.filter(F.expr("size(toks) >= 2"))
            .select("toks",
                    F.explode(F.expr("sequence(0, size(toks) - 2)")).alias("i"))
            .select(F.expr("toks[i]").alias("_bl"),
                    F.expr("toks[i+1]").alias("_br"))
            .groupBy("_bl", "_br").agg(F.count("*").alias("_bn"))
            .orderBy(F.desc("_bn"), F.asc("_bl"), F.asc("_br")).limit(1)
        ).localCheckpoint()
        t1 = time.perf_counter()
        cur = (
            cur.crossJoin(F.broadcast(best.select("_bl", "_br")))
            .mapInPandas(_resegment(), cur.schema)
            .localCheckpoint()
        )
        t2 = time.perf_counter()
        print(f"  round {rnd}: best-agg={t1 - t0:5.3f}s "
              f"reseg+ckpt={t2 - t1:5.3f}s")
    spark.stop()


def _resegment():
    import numpy as np

    def fn(frames):
        for pdf in frames:
            if pdf.empty:
                yield pdf[["doc_id", "toks"]]
                continue
            bl, br = pdf["_bl"].iloc[0], pdf["_br"].iloc[0]
            merged_col = []
            for toks in pdf["toks"]:
                t = np.asarray(toks, dtype=object)
                if t.size < 2:
                    merged_col.append(toks)
                    continue
                idx = np.flatnonzero((t[:-1] == bl) & (t[1:] == br))
                if idx.size == 0:
                    merged_col.append(toks)
                    continue
                take, prev_end = [], -1
                for i in idx:
                    if i <= prev_end:
                        continue
                    take.append(i)
                    prev_end = i + 1
                take = np.asarray(take, dtype=np.int64)
                t[take] = [t[i] + " " + t[i + 1] for i in take]
                keep = np.ones(t.size, dtype=bool)
                keep[take + 1] = False
                merged_col.append(list(t[keep]))
            res = pdf[["doc_id"]].copy()
            res["toks"] = merged_col
            yield res

    return fn


if __name__ == "__main__":
    main()
