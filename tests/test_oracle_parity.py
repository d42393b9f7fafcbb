"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.001, compare row count, column set, and exact sorted values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df):
    # sort columns by name, then rows by all values; exact compare
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(
            round(v, 9) if isinstance(v, float) and not math.isnan(v) else v
            for v in tup
        ))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    duck_df = con.sql(ORACLES[name]).df()
    assert len(spark_df) == len(duck_df), f"{name}: row count mismatch"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), f"{name}: schema mismatch"
    # The driver's value hash is dtype-sensitive (3 != 3.0). Python
    # tuple compare is not, so pin numeric *kind* per column too:
    # int-vs-float drift between an oracle and the Spark side must
    # fail here, not in CORRECTNESS_r{N}.
    for col in spark_df.columns:
        sk = spark_df[col].dtype.kind
        dk = duck_df[col].dtype.kind
        if {sk, dk} <= {"i", "u", "f"}:
            assert (sk in "iu") == (dk in "iu"), (
                f"{name}.{col}: dtype kind mismatch spark={spark_df[col].dtype} "
                f"duck={duck_df[col].dtype}"
            )
    assert _normalize(spark_df) == _normalize(duck_df), f"{name}: value mismatch"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
