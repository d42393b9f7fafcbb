"""SiddhiQL front-end: run the reference's own query TEXT against
DataFrames — the last mile of "a siddhi-execution-unique user can
switch without relearning": the window clauses their apps already
contain (``#window.unique:ever(ip)``, ``#unique:deduplicate(ip, 1
sec)``) parse directly onto this engine's operators.

Scope (single-stream queries, the shape every reference test uses —
e.g. UniqueEverWindowTestCase.java:86-94)::

    define stream events (user_id long, value double);
    from events[value > 100]#window.unique:time(user_id, 1 min)
    select user_id, value
    insert into out;

Supported per query: an optional stream filter (``[...]``, SQL-subset
expressions; Siddhi's ``==`` is translated), one ``unique:*`` window
or stream-processor clause with the reference's positional parameters
(time constants like ``1 sec`` included), a select list (``*`` or
expressions with ``as`` aliases), and the output channel (``insert
into`` = current events; ``insert expired events into`` for the
operators with a wired expired channel). ``define stream`` lines are
validated EAGERLY against the bound DataFrame's schema — a missing
attribute raises at parse time, mirroring SiddhiAppCreationException
(the reference's init-time validation, DeduplicateTestCase.java:
286-316).

Scale note: the front-end is pure query *construction* — everything
it emits is the same declarative DataFrame plan the function API
builds, so Catalyst sees identical trees and every plan-shape test in
``tests/test_plans.py`` covers the parsed form too.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siddhi_execution_unique_spark import operators as ops
from siddhi_execution_unique_spark.operators.keyed import ever_expired
from siddhi_execution_unique_spark.operators.time_window import time_window_expired

_TIME_RE = re.compile(r"^\d+\s+[a-zA-Z]+$")
_INT_RE = re.compile(r"^\d+$")

_QUERY_RE = re.compile(
    r"from\s+(?P<stream>\w+)"
    r"(?:\s*\[(?P<filter>[^\]]+)\])?"
    r"\s*#\s*(?:window\.)?unique:(?P<window>\w+)"
    r"\s*\((?P<args>[^)]*)\)"
    r"\s+select\s+(?P<select>.+?)"
    r"\s+insert\s+(?:(?P<channel>expired|all)\s+events\s+)?into\s+(?P<out>\w+)",
    re.IGNORECASE | re.DOTALL,
)

_DEFINE_RE = re.compile(
    r"define\s+stream\s+(?P<name>\w+)\s*\((?P<cols>[^)]*)\)",
    re.IGNORECASE,
)

# positional parameter spec: how many trailing args are constants,
# consumed from the END (the reference's signatures put unique keys
# first, then window.length / window.time / start.time)
_SPECS: dict = {
    # name -> (batch fn, [trailing param names], expired-channel fn or None)
    "ever": (ops.ever, [], ever_expired),
    "first": (ops.first, [], None),
    "length": (ops.length_window, ["window_length"], None),
    "lengthBatch": (ops.length_batch, ["window_length"], None),
    "firstLengthBatch": (ops.first_length_batch, ["window_length"], None),
    "time": (ops.time_window, ["window_time"], time_window_expired),
    "timeBatch": (ops.time_batch, ["window_time", "start_time_ms"], None),
    "firstTimeBatch": (ops.first_time_batch, ["window_time"], None),
    "timeLengthBatch": (
        ops.time_length_batch_distributed,
        ["window_time", "window_length"],
        None,
    ),
    "deduplicate": (ops.deduplicate, ["time_interval"], None),
    # externalTimeBatch is special-cased: its SECOND positional arg is
    # the timestamp ATTRIBUTE, not a constant
    "externalTimeBatch": (ops.external_time_batch, None, None),
}


class SiddhiQLError(ValueError):
    """App-creation failure: bad syntax, unknown window, or an
    attribute the bound stream does not have (the eager-validation
    twin of SiddhiAppCreationException)."""


def _split_args(raw: str) -> list[str]:
    return [a.strip() for a in raw.split(",") if a.strip()] if raw.strip() else []


def _is_const(arg: str) -> bool:
    return bool(_INT_RE.match(arg) or _TIME_RE.match(arg))


def _const(arg: str):
    return int(arg) if _INT_RE.match(arg) else arg  # ops parse time sugar


def _translate_expr(expr: str) -> str:
    # Siddhi equality is '=='; Spark SQL accepts '==' too, but
    # normalize for clarity. 'and/or/not' are shared.
    return expr.strip()


def parse_app(text: str) -> list[dict]:
    """Parse a SiddhiQL app into query dicts (no DataFrames yet)."""
    text = re.sub(r"--[^\n]*", "", text)  # line comments
    defines = {
        m.group("name"): [
            c.strip().split()[0]
            for c in m.group("cols").split(",")
            if c.strip()
        ]
        for m in _DEFINE_RE.finditer(text)
    }
    queries = []
    for m in _QUERY_RE.finditer(text):
        window = m.group("window")
        if window not in _SPECS:
            raise SiddhiQLError(
                f"unknown window unique:{window}; expected one of "
                f"{sorted(_SPECS)}"
            )
        queries.append(
            {
                "stream": m.group("stream"),
                "filter": _translate_expr(m.group("filter")) if m.group("filter") else None,
                "window": window,
                "args": _split_args(m.group("args")),
                "select": [s.strip() for s in m.group("select").split(",")],
                "channel": (m.group("channel") or "current").lower(),
                "out": m.group("out"),
                "declared": defines.get(m.group("stream")),
            }
        )
    if not queries:
        raise SiddhiQLError("no 'from ... insert into ...' query found")
    return queries


def _build_window(q: dict, df: DataFrame, ts: str, tiebreak: str | None) -> DataFrame:
    window, args = q["window"], list(q["args"])
    if window == "externalTimeBatch":
        if len(args) < 3:
            raise SiddhiQLError(
                "unique:externalTimeBatch needs (key, timestamp, window.time"
                " [, start.time [, time.out]])"
            )
        key, ts_attr, wtime = args[0], args[1], _const(args[2])
        kwargs: dict = {"tiebreak": tiebreak}
        if len(args) >= 4:
            kwargs["start_time_ms"] = int(args[3])
        # args[4] (time.out) is a wall-clock idle flush: batch replay
        # has no idle clock; the streaming twin honors it
        return ops.external_time_batch(df, key, ts_attr, wtime, **kwargs)
    fn, trailing, expired_fn = _SPECS[window]
    consts: list = []
    while trailing and args and _is_const(args[-1]) and len(consts) < len(trailing):
        consts.insert(0, _const(args.pop()))
    if any(_is_const(a) for a in args):
        raise SiddhiQLError(
            f"unique:{window}: constant parameters must come last, got {q['args']}"
        )
    if trailing and not consts:
        raise SiddhiQLError(
            f"unique:{window} needs ({', '.join(['key'] + trailing)})"
        )
    keys = args if len(args) > 1 else (args[0] if args else None)
    if keys is None:
        raise SiddhiQLError(f"unique:{window} needs at least a unique key attribute")
    if q["channel"] == "expired":
        if expired_fn is None:
            raise SiddhiQLError(
                f"expired-events channel for unique:{window} is not wired "
                "through SiddhiQL; use the function API variant"
            )
        fn = expired_fn
    kwargs = dict(zip(trailing or [], consts))
    return fn(df, keys, ts=ts, tiebreak=tiebreak, **kwargs)


def run_app(
    text: str,
    streams: dict[str, DataFrame],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> dict[str, DataFrame]:
    """Execute a SiddhiQL app against bound DataFrames. Returns
    {output stream name: DataFrame}. Validation is EAGER: unknown
    streams/windows/attributes raise SiddhiQLError before any job
    runs."""
    out: dict[str, DataFrame] = {}
    for q in parse_app(text):
        if q["stream"] not in streams:
            raise SiddhiQLError(
                f"stream {q['stream']!r} is not bound; have {sorted(streams)}"
            )
        df = streams[q["stream"]]
        if q["declared"]:
            missing = [c for c in q["declared"] if c not in df.columns]
            if missing:
                raise SiddhiQLError(
                    f"stream {q['stream']!r} is missing declared attributes "
                    f"{missing}; has {df.columns}"
                )
        # eager key validation: identifier args must be columns
        for a in q["args"]:
            if not _is_const(a) and a not in df.columns:
                raise SiddhiQLError(
                    f"unique:{q['window']}: attribute {a!r} is not in "
                    f"stream {q['stream']!r} ({df.columns})"
                )
        if q["filter"]:
            df = df.filter(F.expr(q["filter"]))
        res = _build_window(q, df, ts, tiebreak)
        out[q["out"]] = _apply_select(res, q["select"])
    return out


# streaming dispatch: same positional treatment, onto the Structured
# Streaming twins (no tiebreak — streams order by arrival/event time)
def _streaming_specs():
    from siddhi_execution_unique_spark import streaming as stw

    def keep_first(fn):
        def wrapped(df, *a, **kw):
            kw.setdefault("keep", "first")
            return fn(df, *a, **kw)
        return wrapped

    return {
        "ever": (stw.ever_stream, []),
        "first": (stw.first_stream, []),
        "length": (stw.length_window_stream, ["window_length"]),
        "lengthBatch": (stw.length_batch_stream, ["window_length"]),
        "firstLengthBatch": (keep_first(stw.length_batch_stream), ["window_length"]),
        "time": (stw.time_window_stream, ["window_time"]),
        "timeBatch": (stw.tumbling_batch_stream, ["window_time"]),
        "firstTimeBatch": (keep_first(stw.tumbling_batch_stream), ["window_time"]),
        "timeLengthBatch": (
            stw.time_length_batch_stream, ["window_time", "window_length"]
        ),
        "deduplicate": (stw.deduplicate_exact_stream, ["time_interval"]),
        "externalTimeBatch": (stw.external_time_batch_stream, ["window_time"]),
    }


def run_app_streaming(
    text: str,
    streams: dict[str, DataFrame],
    ts: str = "ts",
) -> dict[str, DataFrame]:
    """Execute a SiddhiQL app against STREAMING DataFrames: the same
    query text that drives the batch engine builds the Structured
    Streaming twin plans (``#window.unique:time`` → the dual-channel
    ``time_window_stream`` etc.). ``first_stream`` ignores ``ts`` by
    design (arrival order); the dual-channel twins emit the
    reference's current/expired protocol on their ``channel`` column,
    so the ``insert expired events into`` channel selects
    ``channel = 'expired'`` rows where the twin provides them."""
    specs = _streaming_specs()
    out: dict[str, DataFrame] = {}
    for q in parse_app(text):
        if q["stream"] not in streams:
            raise SiddhiQLError(
                f"stream {q['stream']!r} is not bound; have {sorted(streams)}"
            )
        df = streams[q["stream"]]
        for a in q["args"]:
            if not _is_const(a) and a not in df.columns:
                raise SiddhiQLError(
                    f"unique:{q['window']}: attribute {a!r} is not in "
                    f"stream {q['stream']!r} ({df.columns})"
                )
        if q["filter"]:
            df = df.filter(F.expr(q["filter"]))
        window, args = q["window"], list(q["args"])
        fn, trailing = specs[window]
        if window == "externalTimeBatch":
            # (key, timestamp_attr, T): the twin reads the attribute
            # directly as its event-time column
            if len(args) < 3:
                raise SiddhiQLError(
                    "unique:externalTimeBatch needs (key, timestamp, window.time)"
                )
            res = fn(df, args[0], _const(args[2]), ts=args[1])
        else:
            consts: list = []
            while trailing and args and _is_const(args[-1]) and len(consts) < len(trailing):
                consts.insert(0, _const(args.pop()))
            if trailing and not consts:
                raise SiddhiQLError(
                    f"unique:{window} needs ({', '.join(['key'] + trailing)})"
                )
            keys = args if len(args) > 1 else (args[0] if args else None)
            if keys is None:
                raise SiddhiQLError(
                    f"unique:{window} needs at least a unique key attribute"
                )
            kwargs = dict(zip(trailing or [], consts))
            if window != "first":
                kwargs["ts"] = ts
            res = fn(df, keys, **kwargs)
        if q["channel"] == "expired":
            if "channel" not in res.columns:
                raise SiddhiQLError(
                    f"unique:{window}'s streaming twin has no expired channel"
                )
            res = res.filter(F.col("channel") == "expired")
        if any(_AGG_RE.search(s) for s in q["select"]):
            # chaining an aggregation after a stateful twin means two
            # stateful operators in one streaming query — raise the
            # app-creation error instead of a mid-stream planner error
            raise SiddhiQLError(
                "aggregate select over a STREAMING window is not wired; "
                "aggregate the sink table, or use the batch run_app"
            )
        out[q["out"]] = _apply_select(res, q["select"])
    return out


_AGG_RE = re.compile(r"\b(count|sum|avg|min|max)\s*\(", re.IGNORECASE)


def _apply_select(res: DataFrame, select: list[str]) -> DataFrame:
    """Apply a SiddhiQL select list: plain projections, or — when any
    item is an aggregate (``count()``, ``sum(x)``, ...) — an
    aggregation OVER THE WINDOW CONTENTS grouped by the non-aggregate
    items, which is exactly the reference's "aggregation over window"
    composition (e.g. UniqueEverWindowTestCase.java:86-94's running
    ``count(ip)``, whose final state is the per-group count of the
    retained events). Siddhi's bare ``count()`` maps to count(*)."""
    if select == ["*"]:
        return res
    items = [re.sub(r"\bcount\s*\(\s*\)", "count(*)", s, flags=re.IGNORECASE)
             for s in select]
    aggs = [s for s in items if _AGG_RE.search(s)]
    if not aggs:
        return res.select(*[F.expr(s) for s in items])
    keys = [s for s in items if not _AGG_RE.search(s)]
    if not keys:
        return res.agg(*[F.expr(s) for s in aggs])
    return res.groupBy(*[F.expr(s) for s in keys]).agg(
        *[F.expr(s) for s in aggs]
    )
