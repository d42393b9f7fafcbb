"""SiddhiQL front-end: parsed query text must build EXACTLY the plan
the function API builds (row-level equivalence), and app-creation
errors must raise eagerly (the SiddhiAppCreationException twin)."""

import pytest

from pyspark.sql import functions as F

from siddhi_execution_unique_spark import operators as ops
from siddhi_execution_unique_spark import siddhiql as sq
from siddhi_execution_unique_spark.operators.keyed import ever_expired
from siddhi_execution_unique_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def streams(spark):
    return {"events": load_table(spark, SF_DIR, "events")}


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_ever_with_define_stream_validation(streams):
    app = """
    define stream events (event_id long, user_id long, value double);
    from events#window.unique:ever(user_id)
    select user_id, value
    insert into out;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["out"]
    want = ops.ever(
        streams["events"], "user_id", ts="ts", tiebreak="event_id"
    ).select("user_id", "value")
    assert rows(got) == rows(want)


def test_filter_window_and_alias(streams):
    app = """
    from events[value > 100]#window.unique:time(user_id, 1 hour)
    select user_id, event_id as eid
    insert into filtered;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["filtered"]
    want = ops.time_window(
        streams["events"].filter(F.col("value") > 100),
        "user_id", "1 hour", ts="ts", tiebreak="event_id",
    ).select("user_id", F.col("event_id").alias("eid"))
    assert rows(got) == rows(want)


def test_stream_processor_and_time_sugar(streams):
    app = "from events#unique:deduplicate(user_id, 1 sec) select * insert into dd;"
    got = sq.run_app(app, streams, tiebreak="event_id")["dd"]
    want = ops.deduplicate(
        streams["events"], "user_id", "1 sec", ts="ts", tiebreak="event_id"
    )
    assert rows(got) == rows(want)


def test_external_time_batch_positional_timestamp(streams):
    app = """
    from events#window.unique:externalTimeBatch(user_id, ts, 2 hours, 0)
    select user_id, event_id
    insert into etb;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["etb"]
    want = ops.external_time_batch(
        streams["events"], "user_id", "ts", "2 hours",
        start_time_ms=0, tiebreak="event_id",
    ).select("user_id", "event_id")
    assert rows(got) == rows(want)


def test_expired_events_channel(streams):
    app = """
    from events#window.unique:ever(user_id)
    select event_id
    insert expired events into exp;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["exp"]
    want = ever_expired(
        streams["events"], "user_id", ts="ts", tiebreak="event_id"
    ).select("event_id")
    assert rows(got) == rows(want)


def test_length_batch_and_multi_query_app(streams):
    app = """
    from events#window.unique:lengthBatch(user_id, 100)
    select user_id, event_id, batch_seq
    insert into lb;

    from events#window.unique:first(user_id)
    select event_id
    insert into firsts;
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    assert set(out) == {"lb", "firsts"}
    want = ops.length_batch(
        streams["events"], "user_id", 100, ts="ts", tiebreak="event_id"
    ).select("user_id", "event_id", "batch_seq")
    assert rows(out["lb"]) == rows(want)


@pytest.mark.parametrize("bad, desc", [
    ("from events#window.unique:nope(user_id) select * insert into x;",
     "unknown window"),
    ("define stream events (no_col long);\n"
     "from events#window.unique:ever(user_id) select * insert into x;",
     "missing declared attribute"),
    ("from events#window.unique:ever(ghost) select * insert into x;",
     "unknown key attribute"),
    ("from events#window.unique:length(user_id) select * insert into x;",
     "missing window.length"),
    ("from events#window.unique:lengthBatch(10, user_id) select * insert into x;",
     "constants must come last"),
    ("from events#window.unique:timeBatch(user_id, 1 hour) "
     "select * insert expired events into x;",
     "expired channel not wired"),
    ("hello world", "no query"),
])
def test_app_creation_errors_raise_eagerly(streams, bad, desc):
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(bad, streams)


def test_unbound_stream_raises(streams):
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(
            "from ghosts#window.unique:ever(user_id) select * insert into x;",
            streams,
        )


def test_streaming_app_builds_twin_plans(spark, tmp_path):
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    schema = spark.read.parquet(src).schema
    sdf = stream_table(spark, str(indir), schema, ts=None)
    app = """
    from events#window.unique:ever(user_id)
    select user_id, value
    insert into latest;
    """
    out = sq.run_app_streaming(app, {"events": sdf})["latest"]
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("sq_latest")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["value"]) for r in spark.sql("SELECT * FROM sq_latest").collect()}
    want = {(r["user_id"], r["value"]) for r in
            ops.ever(load_table(spark, SF_DIR, "events"), "user_id",
                     ts="ts", tiebreak="event_id").select("user_id", "value").collect()}
    # streaming ever has no tiebreak: equal-ts replacements may differ;
    # the synthetic corpus has unique (user, ts) so sets match exactly
    assert got == want


def test_streaming_expired_channel_filter(spark, tmp_path):
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in2"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    schema = spark.read.parquet(src).schema
    sdf = stream_table(spark, str(indir), schema, ts=None)
    app = """
    from events#window.unique:length(user_id, 100)
    select event_id
    insert expired events into gone;
    """
    out = sq.run_app_streaming(app, {"events": sdf})["gone"]
    assert out.isStreaming
    # ever's twin has no expired channel -> eager error
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app_streaming(
            "from events#window.unique:ever(user_id) select * "
            "insert expired events into x;",
            {"events": sdf},
        )


def test_aggregate_select_over_window_contents(streams):
    # the reference's "running count over unique:ever" composition:
    # final state = count of retained events per group
    app = """
    from events#window.unique:ever(user_id)
    select event_type, count() as n
    insert into counts;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["counts"]
    want = (
        ops.ever(streams["events"], "user_id", ts="ts", tiebreak="event_id")
        .groupBy("event_type").agg(F.count("*").alias("n"))
    )
    assert rows(got) == rows(want)
    # global aggregate (no group keys)
    app2 = """
    from events#window.unique:first(user_id)
    select count() as n, max(value) as vmax
    insert into total;
    """
    got2 = sq.run_app(app2, streams, tiebreak="event_id")["total"].collect()[0]
    base = ops.first(streams["events"], "user_id", ts="ts", tiebreak="event_id")
    assert got2.n == base.count()
    assert got2.vmax == base.agg(F.max("value")).collect()[0][0]


def test_streaming_aggregate_select_raises_eagerly(spark, tmp_path):
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in3"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    sdf = stream_table(spark, str(indir), spark.read.parquet(src).schema, ts=None)
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app_streaming(
            "from events#window.unique:ever(user_id) "
            "select event_type, count() as n insert into x;",
            {"events": sdf},
        )
