"""The sf1 sweep's linear chain-oracle rewrites must stay value-equal
to the certified recursive SQL (tools/scale_oracles.py selfcheck).

The full-registry sweep at /tmp/sf1 verifies 11 chain-family entries
against these rewrites because the certified WITH RECURSIVE forms
rescan the event table per step (super-linear at 1M events; one
burned 35+ min of 22-core DuckDB, another spilled 80 GB). The
rewrites walk the chain in O(N)/O(N log N) Python and run the
certified tail SQL verbatim — this test pins the equivalence proof
the sweep relies on, at the suite's sf_dir, on every run.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from scale_oracles import _evict_walk, _fires_walk, _kept_walk  # noqa: E402
from scale_oracles import selfcheck  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_rewrites_match_certified_recursive_sql():
    assert selfcheck(SF_DIR)


# Brute-force transliterations of the certified SQL, run against the
# walks on random small streams — the walks' incremental state is the
# novel part, so pin it where ties/exhaustion/single-user edge cases
# concentrate.

def _evict_brute(users, k):
    """qn per the SQL: for p, the k-th smallest q > p with
    prev_same_user(q) <= p and user(q) != user(p)."""
    n = len(users)
    prev = [0] * (n + 1)
    last: dict = {}
    for i in range(1, n + 1):
        prev[i] = last.get(users[i - 1], 0)
        last[users[i - 1]] = i
    out = []
    for p in range(1, n + 1):
        qs = [q for q in range(p + 1, n + 1)
              if prev[q] <= p and users[q - 1] != users[p - 1]]
        if len(qs) >= k:
            out.append((p, sorted(qs)[k - 1]))
    return out


def _fires_brute(users, n_batch):
    """fires per the SQL: next fire_pos = the n-th smallest
    first-occurrence pos after the previous fire_pos."""
    fires = []
    fire = 0
    seq = 0
    while True:
        firsts: dict = {}
        for q in range(fire + 1, len(users) + 1):
            firsts.setdefault(users[q - 1], q)
        if len(firsts) < n_batch:
            break
        nxt = sorted(firsts.values())[n_batch - 1]
        fires.append((seq, fire, nxt))
        fire = nxt
        seq += 1
    return fires


_streams = st.lists(st.integers(min_value=0, max_value=7),
                    min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_streams, st.integers(min_value=1, max_value=6))
def test_evict_walk_matches_sql_brute_force(users, k):
    assert _evict_walk(users, k) == _evict_brute(users, k)


@settings(max_examples=200, deadline=None)
@given(_streams, st.integers(min_value=1, max_value=6))
def test_fires_walk_matches_sql_brute_force(users, n_batch):
    ev = pd.DataFrame({"user_id": users,
                       "event_id": range(len(users)),
                       "ms": [10 * i for i in range(len(users))]})
    got = _fires_walk(ev, n=n_batch)
    fired = (got[got["batch_seq"] >= 0]
             .groupby("batch_seq")
             .agg(start_pos=("start_pos", "first"),
                  fire_pos=("fire_pos", "first")))
    walk = [(int(s), int(r.start_pos), int(r.fire_pos))
            for s, r in fired.iterrows()]
    assert walk == _fires_brute(users, n_batch)
    # and batch membership is exactly (start_pos, fire_pos]
    for _, row in got.iterrows():
        if row.batch_seq >= 0:
            assert row.start_pos < row.name + 1 <= row.fire_pos


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                min_size=0, max_size=40))
def test_kept_walk_matches_sql_brute_force(pairs):
    """kept per the SQL: seed min ts per user, then repeatedly the
    min ts strictly greater than last kept + window."""
    import duckdb

    import scale_oracles

    window = scale_oracles.DEDUP_MS
    df = pd.DataFrame(pairs, columns=["user_id", "t"])
    df["ts_ms"] = df["t"] * (window // 2)  # hit the boundary cases
    expect = set()
    for u, grp in df.groupby("user_id"):
        ts = sorted(set(grp["ts_ms"]))
        last = None
        for t in ts:
            if last is None or t > last + window:
                expect.add((u, t))
                last = t
    con = duckdb.connect()
    con.register("_ev", df)
    con.sql("CREATE VIEW events AS SELECT user_id, "
            "to_timestamp(ts_ms / 1000.0) AS ts FROM _ev")
    got = _kept_walk(con)
    assert set(zip(got["user_id"], got["ts_ms"])) == expect
