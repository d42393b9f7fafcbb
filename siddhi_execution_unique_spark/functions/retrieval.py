"""BM25 keyword retrieval over the documents corpus — the lexical
search/contamination-probe primitive a training-data pipeline runs
next to embedding ANN. (Beyond-reference scope — SURVEY.md §7 phase 4;
the reference has no retrieval surface.)

Scale shape: the whole computation is inverted-index relational
algebra — explode tokens once, hash-aggregate term frequencies
(map-side combined), and drive scoring with an equi-join on the term
between the tiny query-term set and the posting list. No document
ever meets another document: cost is O(sum of posting-list lengths
for query terms), the textbook sparse-retrieval bound. Corpus-level
constants (N docs, total token count) ride one broadcast 1-row
aggregate.

Determinism: scores are exact integers. BM25's ``ln`` idf is
transcendental (libm differs across engines), so this uses the
rational idf variant idf = (N - df + 0.5) / (df + 0.5); with
k1 = 6/5 and b = 3/4 every factor is a ratio of exact int64s, and the
per-(query, term, doc) contribution is

    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  = [(2N - 2df + 1) / (2df + 1)] * [22*tf*T / (10*tf*T + 3*T + 9*dl*N)]

with T = total tokens — two correctly-rounded IEEE divisions and one
multiply on identical operands in both engines, then fixed-point
``floor(x * 1e6)`` per contribution and an exact bigint sum (the same
pattern as similarity.cell_centroids), so the driver hash rides on
integers only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from siddhi_execution_unique_spark.functions.text import DUCK_TOKS, SPARK_TOKS

TOP_K = 10
N_QUERY_DOCS = 3
_QUANT = 1_000_000

# contribution of one (query term, doc) posting, shared factor shapes:
# idf and tfnorm are each ONE double division of exact int64s
_CONTRIB_SPARK = (
    "(cast(2 * (n_docs - df) + 1 as double) / cast(2 * df + 1 as double))"
    " * (cast(22 * tf * tot_toks as double)"
    "    / cast(10 * tf * tot_toks + 3 * tot_toks + 9 * dl * n_docs as double))"
)
_CONTRIB_DUCK = (
    "(CAST(2 * (n_docs - df) + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))"
    " * (CAST(22 * tf * tot_toks AS DOUBLE)"
    "    / CAST(10 * tf * tot_toks + 3 * tot_toks + 9 * dl * n_docs AS DOUBLE))"
)


def bm25_topk(
    docs: DataFrame,
    n_query_docs: int = N_QUERY_DOCS,
    k: int = TOP_K,
) -> DataFrame:
    """Top-``k`` BM25 matches per probe document (``doc_id <
    n_query_docs``; the probe's distinct tokens are its query terms).
    Output: (query_id, doc_id, rank, qscore) — qscore is the exact
    integer micro-unit BM25 sum, rank ties broken by doc_id. The
    probe document itself competes like any other (on the synthetic
    template-vocabulary corpus a twin doc can legitimately outscore
    it — BM25's length normalization at work)."""
    if n_query_docs <= 0:
        raise ValueError(f"n_query_docs must be > 0, got {n_query_docs}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    toks = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKS)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    bounds = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("tot_toks")
    )
    qterms = (
        tf.filter(F.col("doc_id") < n_query_docs)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    scored = (
        qterms.join(tf, "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(bounds))
        .withColumn(
            "qc",
            F.expr(f"cast(floor(({_CONTRIB_SPARK}) * {_QUANT}) as bigint)"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("qc").alias("qscore"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qscore").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "qscore")
    )


def bm25_topk_oracle(n_query_docs: int = N_QUERY_DOCS, k: int = TOP_K) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({DUCK_TOKS}) AS term FROM documents
        ),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        dl AS (
          SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
        ),
        dfreq AS (
          SELECT term, count(*) AS df FROM tf GROUP BY term
        ),
        bounds AS (
          SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_toks FROM dl
        ),
        qterms AS (
          SELECT doc_id AS query_id, term FROM tf WHERE doc_id < {n_query_docs}
        ),
        scored AS (
          SELECT q.query_id, t.doc_id,
                 CAST(sum(CAST(floor(({_CONTRIB_DUCK}) * {_QUANT}) AS BIGINT)) AS BIGINT)
                   AS qscore
          FROM qterms q
          JOIN tf t ON t.term = q.term
          JOIN dfreq f ON f.term = q.term
          JOIN dl d ON d.doc_id = t.doc_id
          CROSS JOIN bounds
          GROUP BY q.query_id, t.doc_id
        )
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qscore DESC, doc_id) AS rank,
               qscore
        FROM scored
        QUALIFY rank <= {k}
    """
