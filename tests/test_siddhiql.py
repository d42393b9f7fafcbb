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
    ("from clicks#window.unique:ever(user_id) "
     "join purchases#window.unique:ever(user_id) "
     "on clicks.user_id == purchases.user_id "
     "select clicks.user_id insert expired events into x;",
     "expired channel of a non-timeBatch join not wired"),
    ("from clicks#window.unique:timeBatch(user_id, 1 hour) "
     "join purchases#window.unique:timeBatch(user_id, 2 hours) "
     "on clicks.user_id == purchases.user_id "
     "select clicks.user_id insert expired events into x;",
     "expired channel of a MISALIGNED pair not wired (the current "
     "channel now lowers to find()-state contents)"),
    ("from events#window.unique:ever(user_id) "
     "join events#window.unique:ever(user_id) on 1=1 "
     "select * insert into x;",
     "self-join needs distinct stream names"),
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


# ---------------------------------------------------------------- round 6:
# `insert all events into` (UniqueLengthWindowTestCase.java:65,95) and
# window-to-window joins (UniqueEverWindowTestCase.java:228-233)


def test_insert_all_events_ever(streams):
    app = """
    from events#window.unique:ever(user_id)
    select event_id, channel
    insert all events into both;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["both"]
    ev = streams["events"]
    cur = ops.ever(ev, "user_id", ts="ts", tiebreak="event_id").select(
        "event_id", F.lit("current").alias("channel"))
    exp = ever_expired(ev, "user_id", ts="ts", tiebreak="event_id").select(
        "event_id", F.lit("expired").alias("channel"))
    assert rows(got) == rows(cur.unionAll(exp))
    # every event appears on >= 1 channel; current+expired partition the stream
    assert got.count() == ev.count()


def test_insert_all_events_length_is_dual_channel(streams):
    app = """
    from events#window.unique:length(user_id, 100)
    select event_id, channel
    insert all events into both;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["both"]
    want = ops.length_window_emissions_distributed(
        streams["events"], "user_id", 100, ts="ts", tiebreak="event_id"
    ).select("event_id", "channel")
    assert rows(got) == rows(want)


def test_insert_all_events_time_batch(streams):
    app = """
    from events#window.unique:timeBatch(user_id, 1 hour)
    select event_id, batch_end_ms, channel
    insert all events into both;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["both"]
    batched = ops.time_batch(
        streams["events"], "user_id", "1 hour", ts="ts", tiebreak="event_id")
    n_cur = batched.count()
    last_end = batched.agg(F.max("batch_end_ms")).collect()[0][0]
    n_last = batched.filter(F.col("batch_end_ms") == last_end).count()
    by_ch = {r["channel"]: r["n"] for r in
             got.groupBy("channel").agg(F.count("*").alias("n")).collect()}
    assert by_ch["current"] == n_cur
    # expired = every batch except the one that never gets flushed
    assert by_ch["expired"] == n_cur - n_last


def test_insert_all_events_first_equals_current(streams):
    # unique:first never emits expired (UniqueFirstWindowProcessor.java:
    # 129-132): all events == current events, no channel column
    app = "from events#window.unique:first(user_id) select event_id insert all events into o;"
    got = sq.run_app(app, streams, tiebreak="event_id")["o"]
    want = ops.first(
        streams["events"], "user_id", ts="ts", tiebreak="event_id").select("event_id")
    assert rows(got) == rows(want)


def test_expired_channel_time_batch_and_length_batch(streams):
    # round 6 wiring: expired channel for the batch families via SiddhiQL
    app = """
    from events#window.unique:timeBatch(user_id, 1 hour)
    select event_id, expired_at_ms
    insert expired events into e1;

    from events#window.unique:lengthBatch(user_id, 50)
    select event_id, expired_at_ms
    insert expired events into e2;
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    batched = ops.time_batch(
        streams["events"], "user_id", "1 hour", ts="ts", tiebreak="event_id")
    want1 = ops.expired_channel(batched, "1 hour").select("event_id", "expired_at_ms")
    assert rows(out["e1"]) == rows(want1)
    lb = ops.length_batch(
        streams["events"], "user_id", 50, ts="ts", tiebreak="event_id")
    want2 = ops.length_batch_expired(lb).select("event_id", "expired_at_ms")
    assert rows(out["e2"]) == rows(want2)


def test_expired_channel_time_length_batch_and_external(streams):
    # round 7 wiring: the last two reference operators with no batch
    # expired equivalent (VERDICT r06 item 1) through SiddhiQL
    app = """
    from events#window.unique:timeLengthBatch(user_id, 6 hours, 20)
    select event_id, expired_at_ms
    insert expired events into e1;

    from events#window.unique:externalTimeBatch(user_id, ts, 2 hours)
    select event_id, expired_at_ms
    insert expired events into e2;
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    want1 = ops.time_length_batch_expired(
        streams["events"], "user_id", "6 hours", 20, ts="ts", tiebreak="event_id"
    ).select("event_id", "expired_at_ms")
    assert rows(out["e1"]) == rows(want1)
    want2 = ops.external_time_batch_expired(
        streams["events"], "user_id", "ts", "2 hours", tiebreak="event_id"
    ).select("event_id", "expired_at_ms")
    assert rows(out["e2"]) == rows(want2)


def test_all_events_time_length_batch_union_shape(streams):
    app = """
    from events#window.unique:timeLengthBatch(user_id, 6 hours, 20)
    select event_id, channel
    insert all events into both;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["both"]
    by_ch = {r["channel"]: r["n"] for r in
             got.groupBy("channel").agg(F.count("*").alias("n")).collect()}
    cur = ops.time_length_batch_distributed(
        streams["events"], "user_id", "6 hours", 20, ts="ts", tiebreak="event_id")
    exp = ops.time_length_batch_expired(
        streams["events"], "user_id", "6 hours", 20, ts="ts", tiebreak="event_id")
    assert by_ch["current"] == cur.count()
    assert by_ch["expired"] == exp.count()


def test_join_time_batch_grid_normalizes_duration_sugar(two_streams):
    # '1 hour' and '3600000' are the same tumbling grid (ADVICE r06):
    # the shared-grid check must normalize, not compare literal text
    app = """
    from clicks#window.unique:timeBatch(user_id, 1 hour) join purchases#window.unique:timeBatch(user_id, 3600000)
    on clicks.user_id == purchases.user_id
    select clicks.user_id as user_id, purchases.event_id as pe
    insert into joined;
    """
    got = sq.run_app(app, two_streams, tiebreak="event_id")["joined"]
    assert got.count() > 0
    # ...but a different start.time anchor is a DIFFERENT grid — a
    # MIXED pair: each side probes its find() state (last fired batch)
    # instead of pinning batch co-residency
    mixed = app.replace("3600000)", "3600000, 60000)")
    got_mixed = sq.run_app(mixed, two_streams, tiebreak="event_id")["joined"]

    def last_batch(df, **kw):
        b = ops.time_batch(df, "user_id", ts="ts", window_time=3_600_000,
                           tiebreak="event_id", **kw)
        m = b.agg(F.max("batch_end_ms").alias("_m"))
        return b.crossJoin(F.broadcast(m)).filter(
            F.col("batch_end_ms") == F.col("_m")).drop("_m")

    l = last_batch(two_streams["clicks"])
    r = last_batch(two_streams["purchases"], start_time_ms=60000)
    want = l.alias("l").join(
        r.alias("r"), F.col("l.user_id") == F.col("r.user_id")
    ).select(F.col("l.user_id").alias("user_id"),
             F.col("r.event_id").alias("pe"))
    assert rows(got_mixed) == rows(want)


def test_external_time_batch_six_arg_form(streams):
    # the reference's tests 13/14 text: time.out = -1 (disabled) and
    # the replace.time.stamp.with.batch.end.time boolean
    app = """
    from events#window.unique:externalTimeBatch(user_id, ts, 2 hours, 0, -1, true)
    select event_id, user_id, ts
    insert into out;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["out"]
    want = ops.external_time_batch(
        streams["events"], "user_id", "ts", "2 hours", start_time_ms=0,
        replace_timestamp_with_batch_end=True, tiebreak="event_id",
    ).select("event_id", "user_id", "ts")
    assert rows(got) == rows(want)
    # false leaves the timestamps alone
    app_f = app.replace("-1, true", "-1, false")
    got_f = sq.run_app(app_f, streams, tiebreak="event_id")["out"]
    want_f = ops.external_time_batch(
        streams["events"], "user_id", "ts", "2 hours", start_time_ms=0,
        tiebreak="event_id",
    ).select("event_id", "user_id", "ts")
    assert rows(got_f) == rows(want_f)
    # a non-boolean sixth argument is an app-creation error
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(app.replace("-1, true", "-1, maybe"), streams)


def test_partitioned_length_families(streams):
    # round 7 wiring (VERDICT r06 item 3): partition with over
    # length / lengthBatch / timeLengthBatch
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:length(user_id, 50)
        select event_type, user_id, event_id
        insert into contents;

        from events#window.unique:lengthBatch(user_id, 40)
        select event_type, user_id, event_id, batch_seq
        insert into batches;
    end
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    want1 = ops.length_window_partitioned(
        streams["events"], "event_type", "user_id", 50, ts="ts", tiebreak="event_id"
    ).select("event_type", "user_id", "event_id")
    assert rows(out["contents"]) == rows(want1)
    want2 = ops.length_batch_partitioned(
        streams["events"], "event_type", "user_id", 40, ts="ts", tiebreak="event_id"
    ).select("event_type", "user_id", "event_id", "batch_seq")
    assert rows(out["batches"]) == rows(want2)


@pytest.fixture()
def two_streams(streams):
    ev = streams["events"]
    return {
        "clicks": ev.filter(F.col("event_type") == "click"),
        "purchases": ev.filter(F.col("event_type") == "purchase"),
    }


def test_join_query_reference_text(two_streams):
    # the exact shape of UniqueEverWindowTestCase.java:228-233: two
    # unique:ever windows joined on an attribute equality, qualified
    # select list with aliases
    app = """
    define stream clicks (event_id long, user_id long, value double);
    define stream purchases (event_id long, user_id long, value double);
    from clicks#window.unique:ever(user_id) join purchases#window.unique:ever(user_id)
    on clicks.user_id== purchases.user_id
    select clicks.user_id as user_id, purchases.event_id, clicks.value
    insert into joined ;
    """
    got = sq.run_app(app, two_streams, tiebreak="event_id")["joined"]
    cl = ops.ever(two_streams["clicks"], "user_id", ts="ts", tiebreak="event_id")
    pu = ops.ever(two_streams["purchases"], "user_id", ts="ts", tiebreak="event_id")
    want = (
        cl.alias("c").join(pu.alias("p"), F.expr("c.user_id = p.user_id"))
        .select(F.col("c.user_id").alias("user_id"),
                F.col("p.event_id"), F.col("c.value"))
    )
    assert rows(got) == rows(want)
    assert got.columns == ["user_id", "event_id", "value"]


def test_join_time_batch_all_events(two_streams):
    # UniqueTimeBatchWindowTestCase.java:192-196: timeBatch join
    # timeBatch with `insert all events into`
    app = """
    from clicks#window.unique:timeBatch(user_id, 1 hour) join purchases#window.unique:timeBatch(user_id, 1 hour)
    on clicks.user_id== purchases.user_id
    select clicks.user_id as user_id, purchases.event_id, channel
    insert all events into joined ;
    """
    got = sq.run_app(app, two_streams, tiebreak="event_id")["joined"]
    ch = {r["channel"] for r in got.select("channel").distinct().collect()}
    assert ch <= {"current", "expired"}
    # co-residency: current pairs come only from batches whose
    # intervals coincide; expired re-emits all but the last one
    cb = ops.time_batch(two_streams["clicks"], "user_id", "1 hour",
                        ts="ts", tiebreak="event_id")
    pb = ops.time_batch(two_streams["purchases"], "user_id", "1 hour",
                        ts="ts", tiebreak="event_id")
    want_cur = cb.alias("c").join(
        pb.alias("p"),
        F.expr("c.user_id = p.user_id AND c.batch_end_ms = p.batch_end_ms"),
    ).count()
    n_cur = got.filter(F.col("channel") == "current").count()
    assert n_cur == want_cur
    assert n_cur > 0


def test_join_mismatched_batch_period_probes_last_batches(two_streams):
    """A timeBatch pair with DIFFERENT grids is a mixed pair: no shared
    tumbling interval exists, so each side joins its find() probe state
    — ``eventsToBeExpired``, the last fired batch
    (UniqueTimeBatchWindowProcessor.java:318-328) — not its full batch
    history and not an eager error."""
    out = sq.run_app(
        "from clicks#window.unique:timeBatch(user_id, 1 hour) "
        "join purchases#window.unique:timeBatch(user_id, 2 hours) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as user_id, clicks.event_id as l_id, "
        "purchases.event_id as r_id insert into x;",
        two_streams, tiebreak="event_id",
    )["x"]
    import siddhi_execution_unique_spark.operators as ops

    def last_batch(df, window_ms):
        b = ops.time_batch(df, "user_id", ts="ts", window_time=window_ms,
                           tiebreak="event_id")
        m = b.agg(F.max("batch_end_ms").alias("_m"))
        return b.crossJoin(F.broadcast(m)).filter(
            F.col("batch_end_ms") == F.col("_m")).drop("_m")

    l = last_batch(two_streams["clicks"], 3_600_000)
    r = last_batch(two_streams["purchases"], 7_200_000)
    want = l.alias("l").join(
        r.alias("r"), F.col("l.user_id") == F.col("r.user_id")
    ).select(F.col("l.user_id").alias("user_id"),
             F.col("l.event_id").alias("l_id"),
             F.col("r.event_id").alias("r_id"))
    assert rows(out) == rows(want)
    assert out.count() > 0


def test_expression_keys_batch_partition_agg_and_negatives(streams):
    """VERDICT r09 item 5: expression keys × partition × group-by/
    having. unique:ever/first accept arbitrary key expressions (the
    reference's ExpressionExecutor keys); illegal combos raise
    eagerly."""
    # expression key alone: latest per (user_id % 4) bucket
    out = sq.run_app(
        "from events#window.unique:ever(user_id % 4) "
        "select event_id, user_id insert into o;",
        streams, tiebreak="event_id",
    )["o"]
    want = ops.ever(
        streams["events"], F.expr("user_id % 4"), ts="ts", tiebreak="event_id"
    ).select("event_id", "user_id")
    assert rows(out) == rows(want)
    # expired channel with an expression key
    exp = sq.run_app(
        "from events#window.unique:ever(user_id % 4) "
        "select event_id insert expired events into o;",
        streams, tiebreak="event_id",
    )["o"]
    want_exp = ops.ever_expired(
        streams["events"], F.expr("user_id % 4"), ts="ts", tiebreak="event_id"
    ).select("event_id")
    assert rows(exp) == rows(want_exp)
    # the full composition: partition with + expression key + agg
    comp = sq.run_app(
        "partition with (event_type of events) begin "
        "from events#window.unique:first(user_id % 4) "
        "select event_type, count() as n group by event_type having n > 0 "
        "insert into o; end",
        streams, tiebreak="event_id",
    )["o"]
    want_comp = (
        ops.first(streams["events"], ["event_type", F.expr("user_id % 4")],
                  ts="ts", tiebreak="event_id")
        .groupBy("event_type").agg(F.count("*").alias("n"))
        .filter("n > 0")
    )
    assert rows(comp) == rows(want_comp)
    # multi-arg expression keys survive top-level comma splitting
    two = sq.run_app(
        "from events#window.unique:ever(coalesce(user_id, event_id), event_type) "
        "select event_id insert into o;",
        streams, tiebreak="event_id",
    )["o"]
    want_two = ops.ever(
        streams["events"],
        [F.expr("coalesce(user_id, event_id)"), F.col("event_type")],
        ts="ts", tiebreak="event_id",
    ).select("event_id")
    assert rows(two) == rows(want_two)
    # ILLEGAL: expression key on a non-ever/first window
    with pytest.raises(sq.SiddhiQLError, match="attribute"):
        sq.run_app(
            "from events#window.unique:length(user_id % 4, 10) "
            "select event_id insert into o;",
            streams, tiebreak="event_id",
        )
    # ILLEGAL: all-events channel with expression keys (the channel
    # complement joins on key columns)
    with pytest.raises(sq.SiddhiQLError, match="all-events"):
        sq.run_app(
            "from events#window.unique:ever(user_id % 4) "
            "select event_id insert all events into o;",
            streams, tiebreak="event_id",
        )
    # ILLEGAL: expression referencing a missing attribute (eager)
    with pytest.raises(sq.SiddhiQLError, match="does not resolve"):
        sq.run_app(
            "from events#window.unique:ever(no_such % 4) "
            "select event_id insert into o;",
            streams, tiebreak="event_id",
        )


def test_expression_keys_streaming_parity(spark, tmp_path):
    """The streaming twin stages expression keys as computed columns
    (keyed state needs a real column), drops them from emissions, and
    lands on the batch retain."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(1, 1_700_000_000_000, 3, "click", 1.0),
         (2, 1_700_000_060_000, 7, "click", 2.0),   # 7 % 4 == 3 % 4
         (3, 1_700_000_120_000, 4, "view", 3.0)],
        columns=["event_id", "ts_ms", "user_id", "event_type", "value"],
    )
    indir = str(tmp_path / "in")
    (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")
        .coalesce(1).write.mode("overwrite").parquet(indir)
    )
    schema = spark.read.parquet(indir).schema
    sdf = spark.readStream.schema(schema).parquet(indir)
    res = sq.run_app_streaming(
        "from events#window.unique:first(user_id % 4) "
        "select event_id, user_id insert into o;",
        {"events": sdf},
    )["o"]
    assert "_ekey0" not in res.columns
    outdir = str(tmp_path / "out")
    q = (
        res.writeStream.format("parquet").option("path", outdir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(outdir).collect()))
    # first per bucket: event 1 (bucket 3), event 3 (bucket 0);
    # event 2 duplicates bucket 3 and is dropped
    assert got == [(1, 3), (3, 4)]


def test_join_external_time_batch_aligned_and_negatives(two_streams):
    """VERDICT r09 item 3 + r10 item 3: externalTimeBatch pairs with
    an explicit, identical start.time share an absolute grid and join
    with the batch-co-residency lowering; without it the pair is MIXED
    and each side probes its find() state (last flushed batch). The
    expired/all channels of non-aligned pairs still raise eagerly."""
    # aligned: runs and pins batch co-residency (grid = 1h anchored 0)
    out = sq.run_app(
        "from clicks#window.unique:externalTimeBatch(user_id, ts, 1 hour, 0) "
        "join purchases#window.unique:externalTimeBatch(user_id, ts, 1 hour, 0) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as user_id, clicks.event_id as l_id, "
        "purchases.event_id as r_id insert into x;",
        two_streams, tiebreak="event_id",
    )["x"]
    import siddhi_execution_unique_spark.operators as ops

    l = ops.external_time_batch(
        two_streams["clicks"], "user_id", "ts", 3_600_000,
        start_time_ms=0, tiebreak="event_id")
    r = ops.external_time_batch(
        two_streams["purchases"], "user_id", "ts", 3_600_000,
        start_time_ms=0, tiebreak="event_id")
    want = l.alias("l").join(
        r.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.batch_end_ms") == F.col("r.batch_end_ms")),
    ).select(F.col("l.user_id").alias("user_id"),
             F.col("l.event_id").alias("l_id"),
             F.col("r.event_id").alias("r_id"))
    assert rows(out) == rows(want)
    # no start.time: each side anchors at its own first event — no
    # shared grid, so the pair is MIXED and each side probes its
    # find() state: expiredEvents, the last FLUSHED batch = the
    # second-highest present batch end (the final forming batch never
    # flushes without a later arrival,
    # UniqueExternalTimeBatchWindowProcessor.java:283-318,383-393)
    out2 = sq.run_app(
        "from clicks#window.unique:externalTimeBatch(user_id, ts, 5 days) "
        "join purchases#window.unique:externalTimeBatch(user_id, ts, 5 days) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as user_id, clicks.event_id as l_id, "
        "purchases.event_id as r_id insert into x;",
        two_streams, tiebreak="event_id",
    )["x"]

    def last_flushed(df):
        b = ops.external_time_batch(df, "user_id", "ts", 432_000_000,
                                    tiebreak="event_id")
        ends = b.select("batch_end_ms").distinct()
        m = ends.agg(F.max("batch_end_ms").alias("_m1"))
        tgt = (ends.crossJoin(F.broadcast(m))
               .filter(F.col("batch_end_ms") < F.col("_m1"))
               .agg(F.max("batch_end_ms").alias("_tgt")))
        return b.crossJoin(F.broadcast(tgt)).filter(
            F.col("batch_end_ms") == F.col("_tgt")).drop("_tgt")

    lf, rf = last_flushed(two_streams["clicks"]), last_flushed(
        two_streams["purchases"])
    want2 = lf.alias("l").join(
        rf.alias("r"), F.col("l.user_id") == F.col("r.user_id")
    ).select(F.col("l.user_id").alias("user_id"),
             F.col("l.event_id").alias("l_id"),
             F.col("r.event_id").alias("r_id"))
    assert rows(out2) == rows(want2)
    assert out2.count() > 0
    # non-batch window against a batch side: lowered as of r13 (the
    # arrival-pair instant algebra) — runs, no eager error
    out3 = sq.run_app(
        "from clicks#window.unique:ever(user_id) "
        "join purchases#window.unique:externalTimeBatch(user_id, ts, 1 hour) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as u, channel insert all events into x;",
        two_streams, tiebreak="event_id",
    )["x"]
    assert out3.columns == ["u", "channel"]
    out3.collect()
    # timeLengthBatch against itself — the last join-channel square,
    # lowered as of r14 through the same instant-pair machinery
    out4 = sq.run_app(
        "from clicks#window.unique:timeLengthBatch(user_id, 1 hour, 5) "
        "join purchases#window.unique:timeLengthBatch(user_id, 2 hours, 5) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as u, channel insert all events into x;",
        two_streams, tiebreak="event_id",
    )["x"]
    assert out4.columns == ["u", "channel"]
    out4.collect()


def test_join_length_batch_probes_forming_set(spark):
    """UniqueLengthBatchWindowTestCase.java:325-370 (Test7) joins two
    unique:lengthBatch(_, 2) windows. The reference's find() probes
    the FORMING unique map, never the fired log
    (UniqueLengthBatchWindowProcessor.java:226-233), so the
    final-state join = forming(left) ⋈ forming(right). Replaying
    Test7's exact event sequence: cse fires twice (forming empty at
    end), twitter holds {WSO2: tweet2} — final join is EMPTY; stop
    one cse event earlier and cse's forming {IBM, WSO2-57.6} joins
    twitter's retained WSO2 tweet."""
    import pandas as pd

    from pyspark.sql import functions as F

    def mk(rows, cols):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts_ms"] + cols)
        return (spark.createDataFrame(pdf)
                .withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms"))

    twitter = mk([(3, 3000, "User1", "Hello World", "WSO2"),
                  (4, 4000, "User2", "Hello World2", "WSO2")],
                 ["user", "tweet", "company"])
    app = """
    from cse#window.unique:lengthBatch(symbol, 2)
    join twitter#window.unique:lengthBatch(company, 2)
    on cse.symbol == twitter.company
    select cse.symbol as symbol, twitter.tweet as tweet, cse.price as price
    insert into joined;
    """
    # full Test7 sequence: both cse batches fire -> forming empty
    cse_full = mk([(1, 1000, "WSO2", 55.6), (2, 2000, "IBM", 59.6),
                   (5, 5000, "IBM", 75.6), (6, 6000, "WSO2", 57.6)],
                  ["symbol", "price"])
    out = sq.run_app(app, {"cse": cse_full, "twitter": twitter},
                     tiebreak="event_id")["joined"]
    assert out.count() == 0
    # truncated sequence: cse forming = {IBM@75.6, WSO2 absent};
    # actually {IBM} only -> no WSO2 match; add a WSO2 that does NOT
    # complete the batch by replacing IBM? A duplicate IBM keeps size 1
    cse_part = mk([(1, 1000, "WSO2", 55.6), (2, 2000, "IBM", 59.6),
                   (5, 5000, "IBM", 75.6)], ["symbol", "price"])
    out2 = sq.run_app(app, {"cse": cse_part, "twitter": twitter},
                      tiebreak="event_id")["joined"]
    assert out2.count() == 0  # forming {IBM} vs twitter {WSO2}: no match
    # forming WSO2 on the cse side (batch never fills) + twitter's
    # retained WSO2 tweet -> exactly one joined row
    cse_open = mk([(9, 9000, "WSO2", 57.6)], ["symbol", "price"])
    out3 = sq.run_app(app, {"cse": cse_open, "twitter": twitter},
                      tiebreak="event_id")["joined"]
    rows3 = [(r["symbol"], r["tweet"], r["price"]) for r in out3.collect()]
    assert rows3 == [("WSO2", "Hello World2", 57.6)]  # keep=LAST tweet
    # firstLengthBatch side: keep-FIRST retains tweet1
    app_first = app.replace(
        "twitter#window.unique:lengthBatch(company, 2)",
        "twitter#window.unique:firstLengthBatch(company, 2)")
    out4 = sq.run_app(app_first, {"cse": cse_open, "twitter": twitter},
                      tiebreak="event_id")["joined"]
    rows4 = [(r["symbol"], r["tweet"], r["price"]) for r in out4.collect()]
    assert rows4 == [("WSO2", "Hello World", 57.6)]


def test_join_mixed_pair_probes_find_state(spark):
    """Mixed batch-window join pairs (VERDICT r10 item 3): each side
    joins its find() probe state. lengthBatch probes the FORMING map
    (UniqueLengthBatchWindowProcessor.java:226-233); timeBatch probes
    ``eventsToBeExpired`` = the LAST fired batch
    (UniqueTimeBatchWindowProcessor.java:318-328); externalTimeBatch
    probes ``expiredEvents`` = the last FLUSHED batch, one behind the
    forming batch (UniqueExternalTimeBatchWindowProcessor.java:
    283-318,383-393). The expected rows below are a hand event-at-a-
    time replay of each processor."""
    import pandas as pd

    from pyspark.sql import functions as F

    def mk(rows, cols):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts_ms"] + cols)
        return (spark.createDataFrame(pdf)
                .withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms"))

    # cse walk (lengthBatch(symbol, 3)): put WSO2, put IBM -> size 2 < 3,
    # never fires -> final forming map {WSO2, IBM}
    cse = mk([(1, 1000, "WSO2", 55.6), (2, 2000, "IBM", 59.6)],
             ["symbol", "price"])
    # twitter walk (timeBatch(company, 1 hour), epoch grid): batch
    # [0,1h) holds tweet1(WSO2) + tweet3(IBM), fires at 1h and moves to
    # eventsToBeExpired; tweet2(WSO2) lands in [2h,3h) which fires last
    # -> final eventsToBeExpired = {WSO2: tweet2}
    twitter = mk([(3, 1000, "User1", "tweet1", "WSO2"),
                  (5, 2000, "User3", "tweet3", "IBM"),
                  (4, 7_200_500, "User2", "tweet2", "WSO2")],
                 ["user", "tweet", "company"])
    app = """
    from cse#window.unique:lengthBatch(symbol, 3)
    join twitter#window.unique:timeBatch(company, 1 hour)
    on cse.symbol == twitter.company
    select cse.symbol as symbol, twitter.tweet as tweet
    insert into joined;
    """
    out = sq.run_app(app, {"cse": cse, "twitter": twitter},
                     tiebreak="event_id")["joined"]
    got = [(r["symbol"], r["tweet"]) for r in out.collect()]
    # IBM is in cse's forming map, but tweet3 sits in a non-last batch
    assert got == [("WSO2", "tweet2")]
    # externalTimeBatch probes ONE BATCH EARLIER (last flushed): the
    # same twitter data joins tweet1/tweet3 (their batch flushed when
    # tweet2 arrived), never tweet2 (still forming at end of stream)
    app_ext = app.replace(
        "twitter#window.unique:timeBatch(company, 1 hour)",
        "twitter#window.unique:externalTimeBatch(company, ts, 1 hour)")
    out2 = sq.run_app(app_ext, {"cse": cse, "twitter": twitter},
                      tiebreak="event_id")["joined"]
    got2 = sorted((r["symbol"], r["tweet"]) for r in out2.collect())
    assert got2 == [("IBM", "tweet3"), ("WSO2", "tweet1")]


def test_partitioned_join_length_batch_and_tlb_probe_per_instance(streams):
    """`partition with` + lengthBatch/timeLengthBatch joins: each
    instance's probe state is its OWN forming map / last fired batch
    (the reference's per-instance WindowState), verified against the
    function-API twins."""
    ev = streams["events"]
    two = {
        "lefties": ev.filter(F.col("event_id") % 2 == 0),
        "righties": ev.filter(F.col("event_id") % 2 == 1),
    }
    app = """
    partition with (event_type of lefties, event_type of righties)
    begin
        from lefties#window.unique:lengthBatch(user_id, 5)
        join righties#window.unique:lengthBatch(user_id, 5)
        on lefties.user_id == righties.user_id
        select lefties.event_type as event_type,
               lefties.event_id as l_id, righties.event_id as r_id
        insert into joined;
    end
    """
    got = sq.run_app(app, two, tiebreak="event_id")["joined"]

    def forming(df):
        return ops.length_batch_forming_partitioned(
            df, "event_type", "user_id", 5, ts="ts", tiebreak="event_id")

    l, r = forming(two["lefties"]), forming(two["righties"])
    want = l.alias("l").join(
        r.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.event_type") == F.col("r.event_type")),
    ).select(F.col("l.event_type").alias("event_type"),
             F.col("l.event_id").alias("l_id"),
             F.col("r.event_id").alias("r_id"))
    assert rows(got) == rows(want)
    # per-instance forming is NOT the global forming: the instances'
    # chains fire at different points
    g = ops.length_batch_forming(
        two["lefties"], "user_id", 5, ts="ts", tiebreak="event_id")
    assert rows(l.select("event_id")) != rows(g.select("event_id"))
    # partitioned timeLengthBatch join: per-instance LAST batch
    app_tlb = app.replace("unique:lengthBatch(user_id, 5)",
                          "unique:timeLengthBatch(user_id, 6 hours, 20)")
    got_tlb = sq.run_app(app_tlb, two, tiebreak="event_id")["joined"]

    def last_per_instance(df):
        from pyspark.sql.window import Window as W

        b = ops.time_length_batch_partitioned(
            df, "event_type", "user_id", 6 * 3600 * 1000, 20,
            ts="ts", tiebreak="event_id")
        return (b.withColumn("_m", F.max("batch_seq").over(
                    W.partitionBy("event_type")))
                .filter("batch_seq = _m").drop("_m"))

    lt, rt = last_per_instance(two["lefties"]), last_per_instance(two["righties"])
    want_tlb = lt.alias("l").join(
        rt.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.event_type") == F.col("r.event_type")),
    ).select(F.col("l.event_type").alias("event_type"),
             F.col("l.event_id").alias("l_id"),
             F.col("r.event_id").alias("r_id"))
    assert rows(got_tlb) == rows(want_tlb)


def test_join_time_length_batch_probes_last_fired_batch(streams):
    """UniqueTimeLengthBatchWindowTestCase joins two timeLengthBatch
    windows; the reference's find() probes eventsToBeExpired — the
    LAST FIRED batch only (UniqueTimeLengthBatchWindowProcessor.java:
    377-384). The lowering must equal joining each side's fired
    output filtered to its max batch_seq."""
    ev = streams["events"]
    two = {
        "lefties": ev.filter(F.col("event_id") % 2 == 0),
        "righties": ev.filter(F.col("event_id") % 2 == 1),
    }
    app = """
    from lefties#window.unique:timeLengthBatch(user_id, 6 hours, 20)
    join righties#window.unique:timeLengthBatch(user_id, 6 hours, 20)
    on lefties.user_id == righties.user_id
    select lefties.user_id as user_id, lefties.event_id as l_id,
           righties.event_id as r_id
    insert into joined;
    """
    got = sq.run_app(app, two, tiebreak="event_id")["joined"]

    def last_batch(df):
        b = ops.time_length_batch(df, "user_id", 6 * 3600 * 1000, 20,
                                  ts="ts", tiebreak="event_id")
        mx = b.agg(F.max("batch_seq").alias("m"))
        return b.crossJoin(F.broadcast(mx)).filter("batch_seq = m").drop("m")

    l, r = last_batch(two["lefties"]), last_batch(two["righties"])
    want = l.alias("l").join(
        r.alias("r"), F.col("l.user_id") == F.col("r.user_id")
    ).select(F.col("l.user_id").alias("user_id"),
             F.col("l.event_id").alias("l_id"),
             F.col("r.event_id").alias("r_id"))
    assert rows(got) == rows(want)
    assert len(rows(got)) > 0


def test_join_non_batch_all_events_runs(two_streams):
    """ever ⋈ ever on the all-events channel is lowered as of r13
    (the final non-batch pair family) — the former eager error is
    gone; the emission protocol itself is pinned in
    test_join_x_x_channels_match_certified_algebra."""
    out = sq.run_app(
        "from clicks#window.unique:ever(user_id) "
        "join purchases#window.unique:ever(user_id) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as u, channel insert all events into x;",
        two_streams, tiebreak="event_id",
    )["x"]
    assert out.columns == ["u", "channel"]
    out.collect()


def test_streaming_declared_attribute_validation(spark, tmp_path):
    # the SiddhiAppCreationException twin now fires in streaming too
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in4"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    sdf = stream_table(spark, str(indir), spark.read.parquet(src).schema, ts=None)
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app_streaming(
            "define stream events (ghost_col long);\n"
            "from events#window.unique:first(user_id) select * insert into x;",
            {"events": sdf},
        )


def test_streaming_join_raises(spark, tmp_path):
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in5"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    sdf = stream_table(spark, str(indir), spark.read.parquet(src).schema, ts=None)
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app_streaming(
            "from a#window.unique:ever(user_id) join b#window.unique:ever(user_id) "
            "on a.user_id == b.user_id select a.user_id insert into x;",
            {"a": sdf, "b": sdf},
        )


def test_streaming_all_events_passes_dual_channel(spark, tmp_path):
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in6"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    sdf = stream_table(spark, str(indir), spark.read.parquet(src).schema, ts=None)
    out = sq.run_app_streaming(
        "from events#window.unique:length(user_id, 100) "
        "select event_id, channel insert all events into both;",
        {"events": sdf},
    )["both"]
    assert out.isStreaming
    assert "channel" in out.columns
    # ever's twin has no dual channel -> all events must raise
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app_streaming(
            "from events#window.unique:ever(user_id) "
            "select event_id insert all events into x;",
            {"events": sdf},
        )


# ---------------------------------------------------------------- round 6:
# `partition with (attr of Stream) begin ... end`


def test_partitioned_ever_equals_composite_key(streams):
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:ever(user_id)
        select event_type, user_id, event_id
        insert into latest;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["latest"]
    want = ops.ever(
        streams["events"], ["event_type", "user_id"], ts="ts", tiebreak="event_id"
    ).select("event_type", "user_id", "event_id")
    assert rows(got) == rows(want)


def test_partitioned_time_uses_per_partition_edge(streams):
    # each partition instance's timer is driven by ITS OWN stream
    # front: the live set is ts > per-partition max - T, not global max
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:time(user_id, 1 day)
        select event_type, user_id, event_id
        insert into recent;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["recent"]
    ev = streams["events"]
    from pyspark.sql.window import Window as W
    ms = F.unix_millis("ts")
    live = (
        ev.withColumn("_edge", F.max(ms).over(W.partitionBy("event_type")))
        .filter(ms > F.col("_edge") - F.lit(86_400_000))
        .drop("_edge")
    )
    want = ops.ever(
        live, ["event_type", "user_id"], ts="ts", tiebreak="event_id"
    ).select("event_type", "user_id", "event_id")
    assert rows(got) == rows(want)
    # and it differs from the naive composite-key global-edge form on
    # this corpus only if partitions' maxima differ; both are valid
    # row sets, the oracle above is the semantic pin


def test_partitioned_time_batch_and_deduplicate(streams):
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:timeBatch(user_id, 1 hour)
        select event_type, user_id, event_id, batch_start_ms
        insert into tb;

        from events#unique:deduplicate(user_id, 30 minutes)
        select event_type, user_id, event_id
        insert into dd;
    end
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    want_tb = ops.time_batch(
        streams["events"], ["event_type", "user_id"], "1 hour",
        ts="ts", tiebreak="event_id",
    ).select("event_type", "user_id", "event_id", "batch_start_ms")
    assert rows(out["tb"]) == rows(want_tb)
    # deduplicate: independent anchored chain per (event_type, user_id)
    ev = streams["events"]
    got_dd = rows(out["dd"])
    per_type = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = ops.deduplicate(
            ev.filter(F.col("event_type") == et), "user_id", "30 minutes",
            ts="ts", tiebreak="event_id",
        ).select("event_type", "user_id", "event_id")
        per_type += rows(sub)
    assert got_dd == sorted(per_type)


def test_partitioned_external_time_batch_per_instance_anchor(streams):
    # VERDICT r07 item 6: without start.time each instance anchors at
    # its OWN first event — running the global op on each
    # event_type's sub-stream must reproduce that instance's rows
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:externalTimeBatch(user_id, ts, 2 hours)
        select event_type, user_id, event_id, batch_start_ms
        insert into out;
    end
    """
    out = sq.run_app(app, streams, tiebreak="event_id")["out"]
    ev = streams["events"]
    per_type = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = ops.external_time_batch(
            ev.filter(F.col("event_type") == et), "user_id", "ts", "2 hours",
            tiebreak="event_id",
        ).select("event_type", "user_id", "event_id", "batch_start_ms")
        per_type += rows(sub)
    assert rows(out) == sorted(per_type) and len(per_type) > 0


def test_partitioned_external_time_batch_start_time_is_composite(streams):
    # with start.time the grid is absolute and partition-independent:
    # the lowering equals the composite-key global op
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:externalTimeBatch(user_id, ts, 2 hours, 0)
        select event_type, user_id, event_id, batch_start_ms
        insert into out;
    end
    """
    out = sq.run_app(app, streams, tiebreak="event_id")["out"]
    want = ops.external_time_batch(
        streams["events"], ["event_type", "user_id"], "ts", "2 hours",
        start_time_ms=0, tiebreak="event_id",
    ).select("event_type", "user_id", "event_id", "batch_start_ms")
    assert rows(out) == rows(want)


def test_partitioned_time_batch_all_events_per_instance_witness(streams):
    # VERDICT r07 item 7: each partition instance owns its expired
    # stream — a batch expires iff ITS OWN instance fired a later
    # batch, so per-instance the expired set equals the global op run
    # on that instance's sub-stream
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:timeBatch(user_id, 1 hour)
        select event_type, user_id, event_id, channel, expired_at_ms
        insert all events into both;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["both"]
    ev = streams["events"]
    per_type = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = ev.filter(F.col("event_type") == et)
        batched = ops.time_batch(sub, "user_id", "1 hour",
                                 ts="ts", tiebreak="event_id")
        cur = batched.withColumn("expired_at_ms", F.lit(None).cast("long")) \
            .withColumn("channel", F.lit("current"))
        exp = ops.expired_channel(batched, "1 hour") \
            .withColumn("channel", F.lit("expired"))
        both = cur.unionByName(exp).select(
            "event_type", "user_id", "event_id", "channel", "expired_at_ms")
        per_type += rows(both)
    assert rows(got) == sorted(per_type) and len(per_type) > 0


def test_partitioned_length_batch_expired_per_instance_chain(streams):
    # each instance's fire chain drains its own previous batch: batch
    # k of instance p expires at fire k+1 OF p, never at another
    # instance's fire
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:lengthBatch(user_id, 10)
        select event_type, user_id, event_id, batch_seq, expired_at_ms
        insert expired events into exp;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["exp"]
    batched = ops.length_batch_partitioned(
        streams["events"], "event_type", "user_id", 10,
        ts="ts", tiebreak="event_id")
    want = ops.length_batch_expired(batched, group_cols=("event_type",)).select(
        "event_type", "user_id", "event_id", "batch_seq", "expired_at_ms")
    assert rows(got) == rows(want) and want.count() > 0


def test_partitioned_time_length_batch_expired_per_instance(streams):
    # per-instance drain rule: running the global expired derivation
    # on each event_type's sub-stream must reproduce that instance's
    # expired rows (anchor, fire log, and witness clock all scoped to
    # the instance)
    from siddhi_execution_unique_spark.operators.replay import (
        time_length_batch_expired,
    )

    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:timeLengthBatch(user_id, 2 hours, 10)
        select event_type, user_id, event_id, batch_seq, expired_at_ms
        insert expired events into exp;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["exp"]
    ev = streams["events"]
    per_type = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = time_length_batch_expired(
            ev.filter(F.col("event_type") == et), "user_id", "2 hours", 10,
            ts="ts", tiebreak="event_id",
        ).select("event_type", "user_id", "event_id", "batch_seq",
                 "expired_at_ms")
        per_type += rows(sub)
    assert rows(got) == sorted(per_type) and len(per_type) > 0


def test_partitioned_time_expired_per_instance_edge(streams):
    # per-instance expired: each instance's complement is computed
    # against its OWN event-time edge — equal to the global derivation
    # on the instance's sub-stream
    from siddhi_execution_unique_spark.operators.time_window import (
        time_window_expired,
    )

    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:time(user_id, 6 hours)
        select event_type, user_id, event_id
        insert expired events into exp;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["exp"]
    ev = streams["events"]
    per_type = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = time_window_expired(
            ev.filter(F.col("event_type") == et), "user_id", "6 hours",
            ts="ts", tiebreak="event_id",
        ).select("event_type", "user_id", "event_id")
        per_type += rows(sub)
    assert rows(got) == sorted(per_type) and len(per_type) > 0


def test_partitioned_length_emissions_per_instance(streams):
    # per-instance set-semantics emission log: expired = complement of
    # the instance's final FIFO contents — equal to the global
    # derivation on each event_type sub-stream
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:length(user_id, 20)
        select event_type, user_id, event_id, channel
        insert all events into log;
    end
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["log"]
    ev = streams["events"]
    per_type = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = ops.length_window_emissions_distributed(
            ev.filter(F.col("event_type") == et), "user_id", 20,
            ts="ts", tiebreak="event_id",
        ).select("event_type", "user_id", "event_id", "channel")
        per_type += rows(sub)
    assert rows(got) == sorted(per_type) and len(per_type) > 0


def test_partitioned_join_per_instance(streams):
    # `partition with (a of A, b of B)` + join: each instance owns
    # BOTH windows, so the join runs between per-instance contents
    # with the instances pinned to each other
    ev = streams["events"]
    two = {"lefties": ev.filter(F.col("event_id") % 2 == 0),
           "righties": ev.filter(F.col("event_id") % 2 == 1)}
    app = """
    partition with (event_type of lefties, event_type of righties)
    begin
        from lefties#window.unique:ever(user_id)
        join righties#window.unique:ever(user_id)
        on lefties.user_id == righties.user_id
        select lefties.event_id as l_id, righties.event_id as r_id
        insert into joined;
    end
    """
    got = sq.run_app(app, two, tiebreak="event_id")["joined"]
    left = ops.ever(two["lefties"], ["event_type", "user_id"],
                    ts="ts", tiebreak="event_id")
    right = ops.ever(two["righties"], ["event_type", "user_id"],
                     ts="ts", tiebreak="event_id")
    want = (
        left.alias("lefties").join(
            right.alias("righties"),
            F.expr("lefties.user_id = righties.user_id AND "
                   "lefties.event_type = righties.event_type"),
        ).select(F.col("lefties.event_id").alias("l_id"),
                 F.col("righties.event_id").alias("r_id"))
    )
    assert rows(got) == rows(want) and want.count() > 0


def test_partitioned_join_all_events_per_instance(streams):
    # the expired channel of a partitioned timeBatch join uses the
    # PER-INSTANCE flush witness: instance p's joined batch re-emits
    # as expired iff p itself fired a later batch on either side —
    # a later flush in another instance is not p's scheduler
    ev = streams["events"]
    two = {"lefties": ev.filter(F.col("event_id") % 2 == 0),
           "righties": ev.filter(F.col("event_id") % 2 == 1)}
    app = """
    partition with (event_type of lefties, event_type of righties)
    begin
        from lefties#window.unique:timeBatch(user_id, 1 hour)
        join righties#window.unique:timeBatch(user_id, 1 hour)
        on lefties.user_id == righties.user_id
        select lefties.event_id as l_id, righties.event_id as r_id, channel
        insert all events into joined;
    end
    """
    got = sq.run_app(app, two, tiebreak="event_id")["joined"]
    want: list = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        lt = ops.time_batch(two["lefties"].filter(F.col("event_type") == et),
                            ["user_id"], window_time="1 hour",
                            ts="ts", tiebreak="event_id")
        rt = ops.time_batch(two["righties"].filter(F.col("event_type") == et),
                            ["user_id"], window_time="1 hour",
                            ts="ts", tiebreak="event_id")
        j = lt.alias("l").join(
            rt.alias("r"),
            F.expr("l.user_id = r.user_id AND l.batch_end_ms = r.batch_end_ms"),
        ).select(F.col("l.event_id").alias("l_id"),
                 F.col("r.event_id").alias("r_id"),
                 F.col("l.batch_end_ms").alias("be"))
        ends = [r[0] for r in
                lt.select("batch_end_ms").unionAll(rt.select("batch_end_ms"))
                .agg(F.max("batch_end_ms")).collect()]
        last_end = ends[0]
        for row in j.collect():
            want.append((row["l_id"], row["r_id"], "current"))
            if last_end is not None and row["be"] < last_end:
                want.append((row["l_id"], row["r_id"], "expired"))
    assert rows(got) == sorted(want)
    assert any(w[2] == "expired" for w in want)
    assert any(w[2] == "current" for w in want)


def test_partitioned_external_time_batch_all_per_instance(streams):
    # the expired channel of a partitioned externalTimeBatch is the
    # global rank+2 arrival-flush rule applied PER INSTANCE: each
    # instance anchors its own grid and drains batch rank r at the
    # first event of ITS rank r+2 batch
    ev = streams["events"]
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:externalTimeBatch(user_id, ts, 6 hours)
        select event_type, user_id, event_id, channel
        insert all events into batches;
    end
    """
    got = sq.run_app(app, {"events": ev}, tiebreak="event_id")["batches"]
    want: list = []
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        sub = ev.filter(F.col("event_type") == et)
        cur = ops.external_time_batch(sub, "user_id", "ts", "6 hours",
                                      tiebreak="event_id")
        exp = ops.external_time_batch_expired(sub, "user_id", "ts", "6 hours",
                                              tiebreak="event_id")
        for row in cur.select("event_type", "user_id", "event_id").collect():
            want.append(tuple(row) + ("current",))
        for row in exp.select("event_type", "user_id", "event_id").collect():
            want.append(tuple(row) + ("expired",))
    assert rows(got) == sorted(want)
    assert any(w[3] == "expired" for w in want)


def test_partitioned_join_non_batch_channel_raises(streams):
    # only aligned timeBatch pairs carry the flush protocol; a
    # partitioned ever-join has no expired pair semantics
    ev = streams["events"]
    two = {"lefties": ev.filter(F.col("event_id") % 2 == 0),
           "righties": ev.filter(F.col("event_id") % 2 == 1)}
    app = """
    partition with (event_type of lefties, event_type of righties)
    begin
        from lefties#window.unique:ever(user_id)
        join righties#window.unique:ever(user_id)
        on lefties.user_id == righties.user_id
        select lefties.event_id as l_id, channel
        insert all events into joined;
    end
    """
    with pytest.raises(sq.SiddhiQLError, match="aligned unique:timeBatch"):
        sq.run_app(app, two, tiebreak="event_id")


def test_partitioned_join_unknown_stream_raises(streams):
    ev = streams["events"]
    two = {"lefties": ev, "righties": ev.filter(F.col("event_id") % 2 == 1)}
    app = """
    partition with (event_type of lefties)
    begin
        from lefties#window.unique:ever(user_id)
        join righties#window.unique:ever(user_id)
        on lefties.user_id == righties.user_id
        select lefties.event_id as l_id
        insert into joined;
    end
    """
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(app, two, tiebreak="event_id")


def test_partitioned_outside_queries_coexist(streams):
    app = """
    from events#window.unique:first(user_id)
    select event_id insert into firsts;

    partition with (event_type of events)
    begin
        from events#window.unique:first(user_id)
        select event_type, event_id insert into pfirsts;
    end
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    assert set(out) == {"firsts", "pfirsts"}
    want_g = ops.first(streams["events"], "user_id", ts="ts", tiebreak="event_id")
    want_p = ops.first(
        streams["events"], ["event_type", "user_id"], ts="ts", tiebreak="event_id")
    assert rows(out["firsts"]) == rows(want_g.select("event_id"))
    assert rows(out["pfirsts"]) == rows(want_p.select("event_type", "event_id"))


@pytest.mark.parametrize("bad", [
    # deduplicate never emits expired events (reference suppresses
    # duplicates, it does not re-emit) — the partitioned expired
    # channel must reject eagerly like the global one
    "partition with (event_type of events) begin "
    "from events#unique:deduplicate(user_id, 30 minutes) select * "
    "insert expired events into x; end",
    # wrong stream inside the block
    "partition with (event_type of events) begin "
    "from ghosts#window.unique:ever(user_id) select * insert into x; end",
    # empty block
    "partition with (event_type of events) begin end",
    # unknown partition attribute
    "partition with (ghost_col of events) begin "
    "from events#window.unique:ever(user_id) select * insert into x; end",
])
def test_partitioned_validation_errors(streams, bad):
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(bad, streams, tiebreak="event_id")


def test_every_reference_test_query_string_parses():
    """Sweep the reference's OWN test suite: every SiddhiQL query
    string containing a unique: clause (reconstructed from the java
    string-concatenation fragments) must parse — single-stream,
    joins, all three channels, filters, time sugar, no-space
    `)select` forms. 95 strings at the pinned reference version."""
    import glob
    import re as _re

    files = glob.glob(
        "/root/reference/component/src/test/java/io/siddhi/extension/"
        "execution/unique/*.java"
    )
    assert files, "reference test sources not found"
    texts = []
    for f in files:
        src = open(f).read()
        for m in _re.finditer(r'String\s+\w+\s*=\s*(.*?);\n', src, _re.DOTALL):
            parts = _re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1))
            text = "".join(parts)
            if "unique:" in text and "from " in text:
                texts.append(text)
    assert len(texts) >= 90, f"expected the reference's ~95 query strings, got {len(texts)}"
    failures = []
    for t in texts:
        try:
            sq.parse_app(t)
        except sq.SiddhiQLError as e:
            failures.append((str(e)[:80], t[:120]))
    assert not failures, failures


def test_reference_corpus_executes_or_rejects_eagerly(spark):
    """Execute the reference's ENTIRE test-suite query corpus against
    synthesized streams built from each file's `define stream`
    declarations: every query must either run end-to-end or be
    rejected with the eager SiddhiQLError (the
    SiddhiAppCreationException twin — the corpus includes the
    reference's invalid-parameter negative tests). Nothing may escape
    as a raw Spark AnalysisException or crash."""
    import datetime
    import glob
    import re as _re

    types = {"string": "string", "int": "int", "long": "long",
             "float": "float", "double": "double", "bool": "boolean"}

    def mkdf(cols):
        vals = {"string": ["A", "B", "A", "C", "B", "A"],
                "int": [1, 2, 3, 4, 5, 6],
                "long": [10, 20, 30, 40, 50, 60],
                "float": [1.5, 2.5, 1.5, 3.5, 2.5, 4.5],
                "double": [1.5, 2.5, 1.5, 3.5, 2.5, 4.5],
                "boolean": [True, False, True, True, False, True]}
        rows = [
            tuple(vals[types[t.lower()]][i] for (_, t) in cols)
            + (datetime.datetime(2024, 1, 1, 0, 0, i), i)
            for i in range(6)
        ]
        schema = ", ".join(
            f"{n} {types[t.lower()]}" for n, t in cols
        ) + ", ts timestamp, event_id long"
        return spark.createDataFrame(rows, schema)

    files = glob.glob(
        "/root/reference/component/src/test/java/io/siddhi/extension/"
        "execution/unique/*.java"
    )
    n_run = n_rejected = 0
    unexpected = []
    for f in files:
        src = open(f).read()
        strings = ["".join(_re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1)))
                   for m in _re.finditer(r'String\s+\w+\s*=\s*(.*?);\n', src, _re.DOTALL)]
        defines = {}
        for s in strings:
            for dm in _re.finditer(r"define\s+stream\s+(\w+)\s*\(([^)]*)\)", s):
                defines[dm.group(1)] = [
                    tuple(c.strip().split()[:2])
                    for c in dm.group(2).split(",") if c.strip()
                ]
        for s in strings:
            if "unique:" not in s or "from " not in s:
                continue
            try:
                qs = sq.parse_app(s)
                streams = {}
                for q in qs:
                    names = ([q["stream"]] if q["kind"] == "single"
                             else [q["left"]["stream"], q["right"]["stream"]])
                    for nm in names:
                        if nm in defines and nm not in streams:
                            streams[nm] = mkdf(defines[nm])
                out = sq.run_app(s, streams, tiebreak="event_id")
                for df in out.values():
                    df.collect()
                n_run += 1
            except sq.SiddhiQLError:
                n_rejected += 1
            except Exception as e:  # noqa: BLE001 - the assertion target
                unexpected.append((f"{type(e).__name__}: {str(e)[:90]}", s[:110]))
    assert not unexpected, unexpected
    # the corpus splits into runnable queries and the reference's own
    # negative tests; both counts are pinned so silent shrinkage of
    # either bucket (a parse gap reappearing) fails here. Round 7
    # raised the runnable floor 40 -> 52: the timeLengthBatch /
    # externalTimeBatch expired/all channels and the partitioned
    # length families made 12 more corpus queries executable.
    # ...and the 6-arg externalTimeBatch form (time.out -1 + the
    # replace.time.stamp boolean, tests 13/14) raised it to 55
    assert n_run >= 54, (n_run, n_rejected)
    assert n_run + n_rejected >= 95, (n_run, n_rejected)


def test_explicit_group_by_and_having(streams):
    app = """
    from events#window.unique:ever(user_id)
    select event_type, count() as n, max(value) as vmax
    group by event_type
    having n > 5
    insert into agg;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["agg"]
    assert got.columns == ["event_type", "n", "vmax"]
    want = (
        ops.ever(streams["events"], "user_id", ts="ts", tiebreak="event_id")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("vmax"))
        .filter(F.col("n") > 5)
    )
    assert rows(got) == rows(want)
    # group by an attribute the select list does NOT name
    app2 = """
    from events#window.unique:ever(user_id)
    select count() as n
    group by event_type
    insert into counts;
    """
    got2 = sq.run_app(app2, streams, tiebreak="event_id")["counts"]
    assert got2.columns == ["n"]
    assert sorted(r["n"] for r in got2.collect()) == sorted(
        r["n"] for r in want.unionAll(
            ops.ever(streams["events"], "user_id", ts="ts", tiebreak="event_id")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.max("value").alias("vmax"))
            .filter(F.col("n") <= 5)
        ).select("n").collect()
    )
    # group by / having without an aggregate -> eager app error
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(
            "from events#window.unique:ever(user_id) select event_id "
            "group by event_type insert into x;",
            streams, tiebreak="event_id",
        )


def test_streaming_partitioned_composite_windows(spark, tmp_path):
    import shutil
    from siddhi_execution_unique_spark.streaming.sources import stream_table

    src = "/root/testdata/sf0.001/events.parquet"
    indir = tmp_path / "in7"
    indir.mkdir()
    shutil.copy(src, indir / "events.parquet")
    sdf = stream_table(spark, str(indir), spark.read.parquet(src).schema)
    app = """
    partition with (event_type of events)
    begin
        from events#window.unique:timeBatch(user_id, 1 hour)
        select event_type, user_id, event_id
        insert into tb;

        from events#unique:deduplicate(user_id, 30 minutes)
        select event_type, user_id, event_id
        insert into dd;
    end
    """
    out = sq.run_app_streaming(app, {"events": sdf})
    assert out["tb"].isStreaming and out["dd"].isStreaming
    assert "_pkey" not in out["dd"].columns
    # length-family partitioned streaming stays unwired -> eager error
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app_streaming(
            "partition with (event_type of events) begin "
            "from events#window.unique:length(user_id, 10) "
            "select * insert into x; end",
            {"events": sdf},
        )


def test_inner_stream_chaining(streams):
    # Siddhi apps chain queries through inner streams: query2 reads
    # query1's output by name; the chain fuses into one Catalyst plan
    app = """
    from events[value > 100]#window.unique:ever(user_id)
    select user_id, event_id, value, ts
    insert into HighValueLatest;

    from HighValueLatest#window.unique:first(user_id)
    select user_id, event_id
    insert into final;
    """
    out = sq.run_app(app, streams, tiebreak="event_id")
    ever1 = ops.ever(
        streams["events"].filter(F.col("value") > 100),
        "user_id", ts="ts", tiebreak="event_id",
    ).select("user_id", "event_id", "value", "ts")
    want = ops.first(ever1, "user_id", ts="ts", tiebreak="event_id").select(
        "user_id", "event_id")
    assert rows(out["final"]) == rows(want)
    # an inner stream is only visible AFTER the query that fills it
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(
            "from NotYet#window.unique:ever(user_id) select * insert into a;\n"
            "from events#window.unique:ever(user_id) select user_id, ts "
            "insert into NotYet;",
            streams, tiebreak="event_id",
        )


def test_insert_all_events_length_batch_and_first_variants(streams):
    # lengthBatch all = current (batched rows, null expired_at_ms) ∪
    # expired (re-emissions with flush time)
    app = """
    from events#window.unique:lengthBatch(user_id, 10)
    select event_id, batch_seq, expired_at_ms, channel
    insert all events into both;
    """
    got = sq.run_app(app, streams, tiebreak="event_id")["both"]
    base = ops.length_batch(
        streams["events"], "user_id", 10, ts="ts", tiebreak="event_id")
    n_cur = base.count()
    n_exp = ops.length_batch_expired(base).count()
    assert n_cur > 0  # the corpus must actually fire batches
    by_ch = {r["channel"]: r["n"] for r in
             got.groupBy("channel").agg(F.count("*").alias("n")).collect()}
    assert by_ch == {"current": n_cur, "expired": n_exp}
    assert got.filter(
        (F.col("channel") == "current") & F.col("expired_at_ms").isNotNull()
    ).count() == 0
    # the first-variants never expire: all == current, silently correct
    for w, extra in (("firstTimeBatch", ", 1 hour"), ("firstLengthBatch", ", 50")):
        out = sq.run_app(
            f"from events#window.unique:{w}(user_id{extra}) "
            "select event_id insert all events into o;",
            streams, tiebreak="event_id",
        )["o"]
        assert "channel" not in out.columns


def test_streaming_partitioned_join_matches_batch(spark, tmp_path):
    """`partition with` through the two-stage STREAMING join topology:
    each side's staged twin is the composite-key streaming window and
    the partition-pinned equality folds into the join condition — the
    result must land row-for-row on the batch run_app lowering of the
    same app text over the same data."""
    import pandas as pd

    from pyspark.sql import functions as F

    from siddhi_execution_unique_spark import siddhiql as sq

    B = 1_700_000_000_000
    rows_in = []
    eid = 0
    for et in ("web", "app"):
        for u in (1, 2, 3):
            for rep in range(2):  # a replaced event per (et, user)
                eid += 1
                rows_in.append((eid, B + eid * 60_000, u, et, float(eid)))
    pdf = pd.DataFrame(
        rows_in, columns=["event_id", "ts_ms", "user_id", "event_type", "value"]
    )
    indir = str(tmp_path / "in")
    (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")
        .coalesce(1).write.mode("overwrite").parquet(indir)
    )
    batch_df = spark.read.parquet(indir)
    schema = batch_df.schema
    app = """
    partition with (event_type of lefties, event_type of righties)
    begin
        from lefties#window.unique:ever(user_id)
        join righties#window.unique:ever(user_id)
        on lefties.user_id == righties.user_id
        select lefties.event_type as event_type,
               lefties.event_id as l_id, righties.event_id as r_id
        insert into joined;
    end
    """

    def split(df):
        return {
            "lefties": df.filter(F.col("event_id") % 2 == 0),
            "righties": df.filter(F.col("event_id") % 2 == 1),
        }

    sdf = spark.readStream.schema(schema).parquet(indir)
    got = sq.run_app_streaming_join(
        app, split(sdf), work_dir=str(tmp_path / "wk")
    )["joined"]
    want = sq.run_app(app, split(batch_df), tiebreak="event_id")["joined"]
    assert rows(got) == rows(want)
    assert len(rows(got)) > 0  # the corpus must actually join


def test_streaming_join_empty_first_side_yields_empty_result(spark, tmp_path):
    """ADVICE r09: a `first`-window join side whose staged twin emits
    ZERO rows leaves only _spark_metadata in the parquet sink dir;
    reading it back with schema inference raised AnalysisException.
    The staged read now passes the twin's known schema, so an empty
    side round-trips as an empty DataFrame and the join is empty."""
    import pandas as pd

    from pyspark.sql import functions as F

    from siddhi_execution_unique_spark import siddhiql as sq

    pdf = pd.DataFrame(
        [(1, 1_700_000_000_000, 7, "purchase", 1.0),
         (2, 1_700_000_060_000, 8, "purchase", 2.0)],
        columns=["event_id", "ts_ms", "user_id", "event_type", "value"],
    )
    indir = str(tmp_path / "in")
    (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")
        .coalesce(1).write.mode("overwrite").parquet(indir)
    )
    schema = spark.read.parquet(indir).schema
    sdf = spark.readStream.schema(schema).parquet(indir)
    app = """
    define stream clicks (event_id long, user_id long, value double);
    define stream purchases (event_id long, user_id long, value double);
    from clicks#window.unique:first(user_id) join purchases#window.unique:ever(user_id)
    on clicks.user_id == purchases.user_id
    select clicks.user_id as user_id, purchases.event_id as purchase_event_id
    insert into joined;
    """
    streams = {
        "clicks": sdf.filter(F.col("event_type") == "click"),  # matches nothing
        "purchases": sdf.filter(F.col("event_type") == "purchase"),
    }
    res = sq.run_app_streaming_join(app, streams, work_dir=str(tmp_path / "wk"))
    assert res["joined"].count() == 0
    assert set(res["joined"].columns) == {"user_id", "purchase_event_id"}


def test_streaming_join_rejects_non_join_and_unstageable(spark, tmp_path):
    from siddhi_execution_unique_spark import siddhiql as sq

    sdf = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(str(tmp_path))
    with pytest.raises(sq.SiddhiQLError, match="join queries only"):
        sq.run_app_streaming_join(
            "from A#window.unique:ever(user_id) select * insert into o;",
            {"A": sdf},
        )
    with pytest.raises(sq.SiddhiQLError, match="staged"):
        sq.run_app_streaming_join(
            "from A#window.unique:length(user_id, 5) join "
            "B#window.unique:ever(user_id) on A.user_id == B.user_id "
            "select A.user_id insert into o;",
            {"A": sdf, "B": sdf},
        )


def test_join_mixed_channels_match_certified_algebra(spark):
    """The MIXED lengthBatch ⋈ timeBatch expired/all channel lowering
    (VERDICT r11 item 4) must reproduce the emission-log interval
    algebra that tests/test_properties.py pins against the
    event-at-a-time reference simulation — across randomized
    two-stream interleavings, both side orders, and both channels."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import _mixed_join_closed_form

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(424242)
    for trial in range(6):
        n = random.randint(2, 4)
        t = random.choice([7, 10, 25])
        # trials 4-5 anchor the grid (start.time) so events BEFORE the
        # anchor land in negative slots — the ADVICE r12 edge where
        # `div` truncation and floor bucketing disagree
        anchor = random.choice([3, 5]) if trial >= 4 else 0
        raw = [
            (random.randint(0, 150), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(10, 55))
        ]
        a = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        flip = trial % 2 == 1
        chan = "expired" if trial == 2 else "all"
        tb_args = f"user_id, {t}" + (f", {anchor}" if anchor else "")
        left = (f"purchases#window.unique:timeBatch({tb_args})"
                if flip else
                f"clicks#window.unique:lengthBatch(user_id, {n})")
        right = (f"clicks#window.unique:lengthBatch(user_id, {n})"
                 if flip else
                 f"purchases#window.unique:timeBatch({tb_args})")
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {left} join {right}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(a), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        alg = _mixed_join_closed_form(a, b, n, t, anchor)
        if chan == "expired":
            exp = sorted((ae, be) for ch, ae, be, _ in alg
                         if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted((ch, ae, be) for ch, ae, be, _ in alg)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, n, t, anchor, got[:6], exp[:6])


def test_join_mixed_preanchor_probe_emits_nothing(spark):
    """Regression for the ADVICE r12 medium: with timeBatch(10,
    start.time 5) and a purchase at ts=2 (slot -1, flushing only AT
    the anchor ts=5), a lengthBatch fire at ts=4 probes slot
    floor((4-5)/10) = -1 — NOT the `div`-truncated 0 that would
    spuriously equi-join the not-yet-flushed batch. The certified
    algebra and the event-at-a-time simulation both emit nothing."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import (
        _mixed_join_closed_form,
        _mixed_join_simulate,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])
    a = [(3, 1, "k0"), (4, 2, "k1")]   # lengthBatch(2) fires at ts=4
    b = [(2, 10, "k1")]                # slot -1 of the anchored grid
    assert _mixed_join_simulate(a, b, 2, 10, 5) == []
    assert _mixed_join_closed_form(a, b, 2, 10, 5) == []
    app = (
        "from clicks#window.unique:lengthBatch(user_id, 2) "
        "join purchases#window.unique:timeBatch(user_id, 10, 5)\n"
        "on clicks.user_id == purchases.user_id\n"
        "select clicks.event_id as a_eid, purchases.event_id as b_eid, "
        "channel\ninsert all events into joined ;"
    )
    out = sq.run_app(
        app,
        {
            "clicks": spark.createDataFrame(a, schema=schema),
            "purchases": spark.createDataFrame(b, schema=schema),
        },
        ts="ts", tiebreak="event_id",
    )["joined"]
    assert out.count() == 0


def test_join_x_tb_channels_match_certified_algebra(spark):
    """The NON-BATCH window ⋈ timeBatch expired/all channel lowering
    (VERDICT r12 item 2 — ever/first/time/length against the
    timeBatch family) must reproduce the live-interval emission-log
    algebra that tests/test_properties.py pins against the
    event-at-a-time reference simulation — across all four X windows,
    both side orders, both channels, anchored grids, and timer/tick
    collisions."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import _x_tb_join_closed_form

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(777)
    for trial, kind in enumerate(["ever", "first", "time", "length",
                                  "time", "length"]):
        t = random.choice([7, 10, 25])
        anchor = random.choice([0, 3, 5])
        xparam = (random.choice([5, 10, 15]) if kind == "time"
                  else random.randint(1, 3))
        raw = [
            (random.randint(0, 150), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(10, 55))
        ]
        x = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        xwin = {
            "ever": "unique:ever(user_id)",
            "first": "unique:first(user_id)",
            "time": f"unique:time(user_id, {xparam})",
            "length": f"unique:length(user_id, {xparam})",
        }[kind]
        tb_args = f"user_id, {t}" + (f", {anchor}" if anchor else "")
        flip = trial % 2 == 1
        chan = "expired" if trial == 3 else "all"
        left = (f"purchases#window.unique:timeBatch({tb_args})"
                if flip else f"clicks#window.{xwin}")
        right = (f"clicks#window.{xwin}"
                 if flip else
                 f"purchases#window.unique:timeBatch({tb_args})")
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {left} join {right}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(x), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        alg = _x_tb_join_closed_form(kind, xparam, x, b, t, anchor)
        if chan == "expired":
            exp = sorted((ae, be) for ch, ae, be, _ in alg
                         if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted((ch, ae, be) for ch, ae, be, _ in alg)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, kind, t, anchor, xparam,
                            got[:6], exp[:6])


def test_join_tlb_batch_channels_match_certified_algebra(spark):
    """timeLengthBatch ⋈ every batch window (and itself) — the last
    join-channel square (VERDICT r13 item 4): the lowering must
    reproduce the instant-pair algebra pinned against the
    two-processor event-at-a-time replays in test_properties.py
    (test_tlb_tb_ / test_tlb_lb_ / test_tlb_etb_ /
    test_tlb_tlb_join_channels_algebra_matches_simulation) — across
    both side orders and both channels."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import (
        _etb_probe_model,
        _instant_pair_closed_form,
        _lb_probe_model,
        _tb_instant_model,
        _tlb_instant_model,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    cases = [
        ("unique:timeBatch(user_id, 10, 3)",
         lambda b: _tb_instant_model(b, 10, 3)),
        ("unique:lengthBatch(user_id, 3)",
         lambda b: _lb_probe_model(b, 3)),
        ("unique:externalTimeBatch(user_id, ts, 8, 2)",
         lambda b: _etb_probe_model(b, 8, 2)),
        ("unique:timeLengthBatch(user_id, 21, 3)",
         lambda b: _tlb_instant_model(b, 21, 3)),
    ]
    random.seed(1414)
    for trial, (wexpr, bmodel) in enumerate(cases):
        raw = [
            (random.randint(0, 150), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(20, 55))
        ]
        a = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        chan = "expired" if trial == 1 else "all"
        flip = trial % 2 == 1
        tlb = "clicks#window.unique:timeLengthBatch(user_id, 7, 2)"
        left = f"purchases#window.{wexpr}" if flip else tlb
        right = tlb if flip else f"purchases#window.{wexpr}"
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {left} join {right}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(a), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        alg = _instant_pair_closed_form(
            _tlb_instant_model(a, 7, 2), bmodel(b))
        if chan == "expired":
            exp = sorted((ae, be) for ch, ae, be in alg if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted((ch, ae, be) for ch, ae, be in alg)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, wexpr, got[:6], exp[:6])


def test_join_mixed_channels_validation(two_streams):
    """Mixed-channel joins reject star and aggregate select lists
    eagerly (the union lowering projects per branch), and pairs
    outside the lengthBatch-family ⋈ timeBatch-family support set
    keep the eager error."""
    base = ("from clicks#window.unique:lengthBatch(user_id, 5) "
            "join purchases#window.unique:timeBatch(user_id, 1 hour) "
            "on clicks.user_id == purchases.user_id ")
    with pytest.raises(sq.SiddhiQLError, match="plain-attribute"):
        sq.run_app(base + "select * insert all events into x;",
                   two_streams, tiebreak="event_id")
    with pytest.raises(sq.SiddhiQLError, match="plain-attribute"):
        sq.run_app(
            base + "select count() as n insert all events into x;",
            two_streams, tiebreak="event_id",
        )
    # timeLengthBatch against another batch window — lowered as of
    # r14 (the last join-channel square); no eager error remains in
    # the window-pair matrix
    out_tlb = sq.run_app(
        "from clicks#window.unique:timeBatch(user_id, 1 hour) "
        "join purchases#window.unique:timeLengthBatch(user_id, 1 hour, 5) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.user_id as u insert all events into x;",
        two_streams, tiebreak="event_id",
    )["x"]
    out_tlb.collect()


def test_join_mixed_tt_channels_match_certified_algebra(spark):
    """Misaligned timeBatch ⋈ timeBatch expired/all channels must
    reproduce the co-residency interval algebra pinned against the
    event-at-a-time simulation in test_properties.py — across
    coprime/multiple grids, shifted anchors, and both channels."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import _tt_join_closed_form

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(313131)
    ran = 0
    for trial in range(5):
        ta = random.choice([5, 7, 10, 25])
        t_b = random.choice([3, 7, 10, 21])
        aa = random.choice([0, 2])
        ab = random.choice([0, 3])
        raw = [
            (random.randint(0, 180), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(10, 55))
        ]
        a = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        if not a or not b:
            continue
        chan = "expired" if trial == 2 else "all"
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (
            f"from clicks#window.unique:timeBatch(user_id, {ta}, {aa}) "
            f"join purchases#window.unique:timeBatch(user_id, {t_b}, {ab})\n"
            "on clicks.user_id == purchases.user_id\n"
            f"{sel}\ninsert {chan} events into joined ;"
        )
        out = sq.run_app(
            app, {"clicks": mkdf(a), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        alg = _tt_join_closed_form(a, b, ta, t_b, aa % ta, ab % t_b)
        if chan == "expired":
            exp = sorted((ae, be) for ch, ae, be, _ in alg
                         if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted((ch, ae, be) for ch, ae, be, _ in alg)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, ta, t_b, got[:6], exp[:6])
        ran += 1
    assert ran >= 3


def test_join_mixed_etb_channels_match_certified_algebra(spark):
    """externalTimeBatch ⋈ timeBatch expired/all channels must
    reproduce the emission-log algebra pinned against the
    event-at-a-time simulation in test_properties.py — across both
    anchor modes (start.time and first-event), both side orders, and
    both channels."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import _etb_tb_join_closed_form

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(616161)
    ran = 0
    for trial in range(5):
        te = random.choice([5, 10, 21])
        t_b = random.choice([3, 7, 10])
        anchored = trial % 2 == 0
        raw = [
            (random.randint(5, 180), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(10, 55))
        ]
        e = [(ts, x, k) for ts, x, k, s in raw if s]
        b = [(ts, x, k) for ts, x, k, s in raw if not s]
        if not e or not b:
            continue
        chan = "expired" if trial == 4 else "all"
        ext = (
            f"clicks#window.unique:externalTimeBatch(user_id, ts, {te}, 3)"
            if anchored else
            f"clicks#window.unique:externalTimeBatch(user_id, ts, {te})"
        )
        tbc = f"purchases#window.unique:timeBatch(user_id, {t_b})"
        left, right = (tbc, ext) if trial in (1, 3) else (ext, tbc)
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {left} join {right}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(e), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        anchor_eff = (3 % te) if anchored else min(t for t, _, _ in e)
        alg = _etb_tb_join_closed_form(e, b, te, t_b, anchor_eff)
        if chan == "expired":
            exp = sorted((x, y) for ch, x, y, _ in alg if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted((ch, x, y) for ch, x, y, _ in alg)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, te, t_b, got[:6], exp[:6])
        ran += 1
    assert ran >= 3


def test_join_mixed_channels_empty_sides(spark):
    """Mixed-channel joins must return empty (never crash) when
    either stream is empty — the clamp scalars go NULL and the
    interval explode bounds filter out, by design."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])
    full = spark.createDataFrame(
        [(10, 1, "a"), (12, 2, "b"), (30, 3, "a"), (55, 4, "c")], schema)
    empty = spark.createDataFrame([], schema)
    apps = [
        ("from clicks#window.unique:lengthBatch(user_id, 2) "
         "join purchases#window.unique:timeBatch(user_id, 10) "),
        ("from clicks#window.unique:timeBatch(user_id, 10) "
         "join purchases#window.unique:timeBatch(user_id, 25) "),
        ("from clicks#window.unique:externalTimeBatch(user_id, ts, 10, 0) "
         "join purchases#window.unique:timeBatch(user_id, 7) "),
        ("from clicks#window.unique:lengthBatch(user_id, 2) "
         "join purchases#window.unique:lengthBatch(user_id, 3) "),
        ("from clicks#window.unique:lengthBatch(user_id, 2) "
         "join purchases#window.unique:externalTimeBatch(user_id, ts, 10, 0) "),
        ("from clicks#window.unique:externalTimeBatch(user_id, ts, 10, 0) "
         "join purchases#window.unique:externalTimeBatch(user_id, ts, 7, 0) "),
    ]
    tail = ("on clicks.user_id == purchases.user_id "
            "select clicks.event_id as a_eid, purchases.event_id as b_eid, "
            "channel insert all events into x;")
    for head in apps:
        for clicks, purchases in ((full, empty), (empty, full),
                                  (empty, empty)):
            out = sq.run_app(
                head + tail, {"clicks": clicks, "purchases": purchases},
                ts="ts", tiebreak="event_id",
            )["x"]
            assert out.count() == 0


def test_join_mixed_ll_channels_match_certified_algebra(spark):
    """lengthBatch ⋈ lengthBatch expired/all channels must reproduce
    the arrival-ordered emission-log algebra pinned against the
    event-at-a-time simulation in test_properties.py — across
    randomized interleavings, window lengths, and both channels."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import _ll_join_closed_form

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(515151)
    ran = 0
    for trial in range(4):
        na = random.randint(2, 4)
        nb = random.randint(2, 4)
        raw = [
            (random.randint(0, 150), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(10, 60))
        ]
        a = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        if not a or not b:
            continue
        chan = "expired" if trial == 2 else "all"
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (
            f"from clicks#window.unique:lengthBatch(user_id, {na}) "
            f"join purchases#window.unique:lengthBatch(user_id, {nb})\n"
            "on clicks.user_id == purchases.user_id\n"
            f"{sel}\ninsert {chan} events into joined ;"
        )
        out = sq.run_app(
            app, {"clicks": mkdf(a), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        alg = _ll_join_closed_form(a, b, na, nb)
        if chan == "expired":
            exp = sorted((x, y) for ch, x, y in alg if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted(alg)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, na, nb, got[:6], exp[:6])
        ran += 1
    assert ran >= 3


def test_join_mixed_arrival_pairs_match_certified_algebra(spark):
    """The remaining arrival-vs-arrival mixed pairs (lengthBatch ⋈
    externalTimeBatch and externalTimeBatch ⋈ externalTimeBatch on
    different grids) must reproduce the instant-space emission-log
    algebra pinned against the event-at-a-time simulations in
    test_properties.py."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import (
        _etb_probe_model,
        _instant_pair_closed_form,
        _lb_probe_model,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(717171)
    ran = 0
    for trial in range(6):
        raw = [
            (random.randint(5, 300), i, f"k{random.randint(0, 3)}",
             random.random() < 0.5)
            for i in range(random.randint(25, 70))
        ]
        a = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        if not a or not b:
            continue
        chan = "expired" if trial in (2, 5) else "all"
        if trial < 3:
            n = random.randint(2, 3)
            te = random.choice([10, 21])
            lw = f"clicks#window.unique:lengthBatch(user_id, {n})"
            rw = (f"purchases#window.unique:externalTimeBatch"
                  f"(user_id, ts, {te}, 0)")
            model = _instant_pair_closed_form(
                _lb_probe_model(a, n), _etb_probe_model(b, te, 0))
        else:
            ta = random.choice([10, 21])
            t2 = random.choice([7, 25])
            lw = (f"clicks#window.unique:externalTimeBatch"
                  f"(user_id, ts, {ta}, 0)")
            rw = (f"purchases#window.unique:externalTimeBatch"
                  f"(user_id, ts, {t2}, 0)")
            model = _instant_pair_closed_form(
                _etb_probe_model(a, ta, 0), _etb_probe_model(b, t2, 0))
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {lw} join {rw}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(a), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        if chan == "expired":
            exp = sorted((x, y) for ch, x, y in model if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted(model)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, got[:6], exp[:6])
        ran += 1
    assert ran >= 4


def test_join_x_arrival_pair_channels_match_certified_algebra(spark):
    """The closing half of VERDICT r12 item 2: NON-BATCH window
    (ever/first/time/length) ⋈ lengthBatch / externalTimeBatch
    expired/all channels must reproduce the instant-space algebra
    (timer flags, remover-tiebreak exits) pinned against the
    event-at-a-time simulations in test_properties.py — across all
    four X windows, both batch families, both side orders, and both
    channels."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import (
        _etb_probe_model,
        _instant_pair_closed_form,
        _lb_probe_model,
        _x_instant_model,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(131313)
    ran = 0
    for trial, kind in enumerate(["ever", "first", "time", "length",
                                  "time", "length", "ever", "time"]):
        xparam = (random.choice([5, 10, 15]) if kind == "time"
                  else random.randint(1, 3))
        raw = [
            (random.randint(0, 150), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(15, 60))
        ]
        x = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        if not x or not b:
            continue
        xwin = {
            "ever": "unique:ever(user_id)",
            "first": "unique:first(user_id)",
            "time": f"unique:time(user_id, {xparam})",
            "length": f"unique:length(user_id, {xparam})",
        }[kind]
        if trial % 2 == 0:
            n = random.randint(2, 3)
            bwin = f"unique:lengthBatch(user_id, {n})"
            b_model = _lb_probe_model(b, n)
        else:
            te = random.choice([10, 21])
            anchor = random.choice([0, 3])
            bwin = f"unique:externalTimeBatch(user_id, ts, {te}, {anchor})"
            b_model = _etb_probe_model(b, te, anchor)
        model = _instant_pair_closed_form(
            _x_instant_model(kind, xparam, x), b_model)
        flip = trial in (2, 3, 6)
        chan = "expired" if trial in (3, 5) else "all"
        left = (f"purchases#window.{bwin}" if flip
                else f"clicks#window.{xwin}")
        right = (f"clicks#window.{xwin}" if flip
                 else f"purchases#window.{bwin}")
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {left} join {right}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(x), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        if chan == "expired":
            exp = sorted((xe, be) for ch, xe, be in model
                         if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted(model)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, kind, xparam, got[:6], exp[:6])
        ran += 1
    assert ran >= 6


def test_join_time_lb_timer_probe_beyond_span(spark):
    """The band-clamp edge: a unique:time TIMER exit can fire AFTER
    every arrival in the union (enter + T > gmax). Its expired chunk
    must still probe the other side's OPEN forming-map intervals —
    the probe band clamps into the last band, where open intervals
    always reside (siddhiql.py:_run_join_mixed_ll direction())."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])
    # clicks: one event at ms 100, T=30 -> timer exit at 130 (beyond
    # every arrival); purchases: one forming-map row at ms 90 (the
    # lengthBatch(2) never fires -> interval open at end of stream)
    clicks = spark.createDataFrame([(100, 1, "k1")], schema=schema)
    purchases = spark.createDataFrame([(90, 2, "k1")], schema=schema)
    app = (
        "from clicks#window.unique:time(user_id, 30) "
        "join purchases#window.unique:lengthBatch(user_id, 2) "
        "on clicks.user_id == purchases.user_id "
        "select clicks.event_id as a_eid, purchases.event_id as b_eid, "
        "channel insert all events into joined ;"
    )
    out = sq.run_app(
        app, {"clicks": clicks, "purchases": purchases},
        ts="ts", tiebreak="event_id",
    )["joined"].toPandas()
    got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                 for r in out.itertuples())
    # current at enter 100 (forming row visible since 90 < 100) and
    # expired at the 130 timer against the still-open interval
    assert got == [("current", 1, 2), ("expired", 1, 2)]


def test_join_x_x_channels_match_certified_algebra(spark):
    """NON-BATCH ⋈ NON-BATCH expired/all channels (the final join
    family, r13): the Spark lowering must reproduce the instant-space
    algebra with the -2/-1 timer encoding pinned against the
    event-at-a-time simulation — including time ⋈ time with SHARED
    timer instants where both sliding windows expire simultaneously
    and must see each other's pre-transition state."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import (
        _instant_pair_closed_form,
        _x_instant_model,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    def win(kind, param):
        return {
            "ever": "unique:ever(user_id)",
            "first": "unique:first(user_id)",
            "time": f"unique:time(user_id, {param})",
            "length": f"unique:length(user_id, {param})",
        }[kind]

    random.seed(424242)
    ran = 0
    pairs = [("time", "time"), ("ever", "time"), ("time", "length"),
             ("first", "time"), ("ever", "ever"), ("length", "length"),
             ("ever", "length"), ("time", "time")]
    for trial, (ka, kb) in enumerate(pairs):
        # equal T on trial 0/7 forces shared timer instants at
        # same-ms cross-stream arrivals
        xa = 10 if ka == "time" else random.randint(1, 3)
        xb = (xa if (ka == kb == "time")
              else 15 if kb == "time" else random.randint(1, 3))
        raw = [
            (random.randint(0, 40), i, f"k{random.randint(0, 3)}",
             random.random() < 0.5)
            for i in range(random.randint(15, 55))
        ]
        a = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        if not a or not b:
            continue
        model = _instant_pair_closed_form(
            _x_instant_model(ka, xa, a), _x_instant_model(kb, xb, b))
        chan = "expired" if trial in (2, 5) else "all"
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from clicks#window.{win(ka, xa)} "
               f"join purchases#window.{win(kb, xb)}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(a), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        if chan == "expired":
            exp = sorted((x, y) for ch, x, y in model if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted(model)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, ka, xa, kb, xb, got[:6], exp[:6])
        ran += 1
    assert ran >= 6


def test_join_x_tlb_channels_match_certified_algebra(spark):
    """NON-BATCH window ⋈ timeLengthBatch expired/all channels (the
    hybrid time+count fire protocol, r13): the Spark lowering —
    per-interval window functions, NO serial scan — must reproduce
    the 3-strata instant algebra pinned against the event-at-a-time
    simulation, across all four X windows, both side orders, both
    channels, skip-flag discards and flush-tick/timer collisions."""
    import random

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tests.test_properties import (
        _instant_pair_closed_form,
        _tlb_instant_model,
        _x_instant_model,
    )

    schema = StructType([
        StructField("ts", LongType()),
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
    ])

    def mkdf(rows_):
        return spark.createDataFrame(
            [(int(r[0]), int(r[1]), r[2]) for r in rows_], schema=schema
        )

    random.seed(99131)
    ran = 0
    for trial, kind in enumerate(["ever", "first", "time", "length",
                                  "time", "ever", "length"]):
        te = random.choice([7, 10, 25])
        n = random.randint(2, 4)
        xparam = (random.choice([5, 10, 15]) if kind == "time"
                  else random.randint(1, 3))
        raw = [
            (random.randint(0, 120), i, f"k{random.randint(0, 4)}",
             random.random() < 0.5)
            for i in range(random.randint(15, 60))
        ]
        x = [(ts, e, k) for ts, e, k, s in raw if s]
        b = [(ts, e, k) for ts, e, k, s in raw if not s]
        if not x or not b:
            continue
        model = _instant_pair_closed_form(
            _x_instant_model(kind, xparam, x),
            _tlb_instant_model(b, te, n))
        xwin = {
            "ever": "unique:ever(user_id)",
            "first": "unique:first(user_id)",
            "time": f"unique:time(user_id, {xparam})",
            "length": f"unique:length(user_id, {xparam})",
        }[kind]
        bwin = f"unique:timeLengthBatch(user_id, {te}, {n})"
        flip = trial in (1, 4)
        chan = "expired" if trial in (3, 6) else "all"
        left = f"purchases#window.{bwin}" if flip else f"clicks#window.{xwin}"
        right = (f"clicks#window.{xwin}" if flip
                 else f"purchases#window.{bwin}")
        sel = ("select clicks.event_id as a_eid, "
               "purchases.event_id as b_eid"
               + ("" if chan == "expired" else ", channel"))
        app = (f"from {left} join {right}\n"
               "on clicks.user_id == purchases.user_id\n"
               f"{sel}\ninsert {chan} events into joined ;")
        out = sq.run_app(
            app, {"clicks": mkdf(x), "purchases": mkdf(b)},
            ts="ts", tiebreak="event_id",
        )["joined"].toPandas()
        if chan == "expired":
            exp = sorted((xe, be) for ch, xe, be in model
                         if ch == "expired")
            got = sorted((int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        else:
            exp = sorted(model)
            got = sorted((r.channel, int(r.a_eid), int(r.b_eid))
                         for r in out.itertuples())
        assert got == exp, (trial, kind, te, n, xparam,
                            sorted(set(map(tuple, got)) - set(exp))[:4],
                            sorted(set(exp) - set(map(tuple, got)))[:4])
        ran += 1
    assert ran >= 5


def test_join_on_non_key_attribute_probes_all_live_intervals(spark):
    """The as-of fast path is only complete when the join equality is
    on the X window's OWN unique key. Here unique:ever(session_id) is
    joined on user_id: two sessions of one user are simultaneously
    live, so the probe must pair with BOTH live intervals — the
    banded direction, not a last-entered lookup (which would silently
    keep only session 102)."""
    xs = spark.createDataFrame(
        [(1, 101, 1, 10), (2, 102, 1, 20)],
        "event_id long, session_id long, user_id long, ts long")
    bs = spark.createDataFrame(
        [(3, 1, 30), (4, 1, 40)],
        "event_id long, user_id long, ts long")
    app = """
    from xs#window.unique:ever(session_id) join bs#window.unique:lengthBatch(user_id, 1)
    on xs.user_id == bs.user_id
    select xs.event_id as x_id, bs.event_id as b_id, channel
    insert all events into j;
    """
    got = sq.run_app(app, {"xs": xs, "bs": bs}, tiebreak="event_id")["j"]
    assert rows(got) == sorted([
        (1, 3, "current"), (2, 3, "current"),
        (1, 4, "current"), (2, 4, "current"),
        (1, 3, "expired"), (2, 3, "expired"),
    ])


def test_join_composite_key_window_takes_banded_direction(spark):
    """A composite unique key — ever(session_id, region) — leaves
    several live intervals per session_id value, so a join on
    session_id alone must also bypass the as-of path and see all of
    them."""
    xs = spark.createDataFrame(
        [(1, 5, "eu", 10), (2, 5, "us", 20)],
        "event_id long, session_id long, region string, ts long")
    bs = spark.createDataFrame(
        [(3, 5, 30), (4, 5, 40)],
        "event_id long, session_id long, ts long")
    app = """
    from xs#window.unique:ever(session_id, region) join bs#window.unique:lengthBatch(session_id, 1)
    on xs.session_id == bs.session_id
    select xs.event_id as x_id, bs.event_id as b_id, channel
    insert all events into j;
    """
    got = sq.run_app(app, {"xs": xs, "bs": bs}, tiebreak="event_id")["j"]
    assert rows(got) == sorted([
        (1, 3, "current"), (2, 3, "current"),
        (1, 4, "current"), (2, 4, "current"),
        (1, 3, "expired"), (2, 3, "expired"),
    ])


def test_asof_cross_stream_tiebreak_collision_is_strict(spark):
    """Tiebreak values need not be unique ACROSS streams: on a full
    (ms, stratum, tiebreak) tie between an interval-enter and a probe,
    the banded predicate's strict enter<probe rule says NO match — the
    as-of union's final is_enter sort key pins the same outcome
    deterministically (ADVICE r14 low #1)."""
    xs = spark.createDataFrame(
        [(7, 1, 30)], "event_id long, user_id long, ts long")
    bs = spark.createDataFrame(
        [(7, 1, 30), (9, 1, 40)], "event_id long, user_id long, ts long")
    app = """
    from xs#window.unique:ever(user_id) join bs#window.unique:lengthBatch(user_id, 1)
    on xs.user_id == bs.user_id
    select xs.event_id as x_id, bs.event_id as b_id, channel
    insert all events into j;
    """
    got = sq.run_app(app, {"xs": xs, "bs": bs}, tiebreak="event_id")["j"]
    assert rows(got) == sorted([(7, 7, "expired"), (7, 9, "current")])


def test_time_length_batch_join_rejects_non_positive_length(spark):
    """timeLengthBatch join lowering validates window.length like the
    single-stream path does (ADVICE r14 low #2): n <= 0 is the eager
    SiddhiAppCreationException twin, not a silent always-time-fire."""
    xs = spark.createDataFrame(
        [(1, 1, 10)], "event_id long, user_id long, ts long")
    bs = spark.createDataFrame(
        [(2, 1, 20)], "event_id long, user_id long, ts long")
    app = """
    from xs#window.unique:ever(user_id) join bs#window.unique:timeLengthBatch(user_id, 1 sec, 0)
    on xs.user_id == bs.user_id
    select xs.event_id as x_id, bs.event_id as b_id, channel
    insert all events into j;
    """
    with pytest.raises(sq.SiddhiQLError):
        sq.run_app(app, {"xs": xs, "bs": bs}, tiebreak="event_id")
