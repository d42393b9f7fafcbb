"""Linear-time evaluators for the recursive chain oracles at scale.

The certified DuckDB oracles for the lengthBatch-fires and
deduplicate-kept chains are WITH RECURSIVE statements whose each
recursion step rescans the event table (`min(pos) ... GROUP BY user
... OFFSET 49`). That is exact and fine at the driver's sf0.01 gate
(~100 steps) but super-linear at sf1: 1M events / ~52-event batches
= ~19k steps x a 1M-row scan per step — the partitioned entry alone
ran 35+ min of 22-core DuckDB without finishing.

These evaluators compute ONLY the recursive CTE (the sequential chain
— a single O(N) walk by definition of the operator) in Python, register
the result as a DuckDB temp table, and run the certified oracle's
non-recursive tail verbatim against it. They are still independent of
the Spark implementation: the walk is a direct transliteration of the
reference's event-at-a-time semantics
(UniqueLengthBatchWindowProcessor.java:117-160 — put into the forming
map, fire when it holds `length` keys; DeduplicateStreamProcessor —
keep an arrival iff no kept arrival for its key within `time` before
it).

`selfcheck(sf_dir)` proves each rewrite equal to the certified
recursive SQL on the same corpus; the sweep runs it at sf0.01/sf0.001
(where the recursion is cheap) before trusting the rewrite at sf1.

Usage as a script:  python tools/scale_oracles.py SF_DIR   # selfcheck
"""

from __future__ import annotations

import os
import sys

import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

LENGTH_N = 50
DEDUP_MS = 3_600_000


# ---------------------------------------------------------------- walks

def _fires_walk(ev: pd.DataFrame, n: int = LENGTH_N) -> pd.DataFrame:
    """One lengthBatch chain: ev sorted by pos (1-based, consecutive).

    Fire when the n-th DISTINCT key since the last fire arrives; the
    batch is positions (start_pos, fire_pos]. Returns ev plus
    batch_seq / start_pos / fire_pos / fired_at_ms for events inside a
    FIRED batch (forming-tail events get batch_seq = -1: the certified
    oracles exclude them via `seq >= 0`, siddhiql_join_mixed's
    `forming` CTE selects exactly them)."""
    if not len(ev):
        out = ev.copy()
        for col in ("batch_seq", "start_pos", "fire_pos", "fired_at_ms"):
            out[col] = pd.Series([], dtype="int64")
        return out
    users = ev["user_id"].to_numpy()
    ms = ev["ms"].to_numpy()
    batch_seq = [-1] * len(ev)
    meta = []  # (seq, start_pos, fire_pos, fired_at_ms)
    seen: set = set()
    seq = 0
    start = 0  # previous fire_pos, 0-seeded like the SQL
    for i in range(len(ev)):
        seen.add(users[i])
        if len(seen) == n:
            for j in range(start, i + 1):
                batch_seq[j] = seq
            meta.append((seq, start, i + 1, int(ms[i])))
            seen.clear()
            start = i + 1
            seq += 1
    out = ev.copy()
    out["batch_seq"] = batch_seq
    fm = pd.DataFrame(meta, columns=["batch_seq", "start_pos", "fire_pos",
                                     "fired_at_ms"])
    return out.merge(fm, on="batch_seq", how="left")


def _ev_batched(con, *, part_col: str | None = None,
                where: str = "", n: int = LENGTH_N) -> pd.DataFrame:
    """events -> per-event batch assignment via the linear fires walk,
    partitioned by `part_col` when given (independent chain each);
    ``n`` overrides the distinct-key window length (the mixed
    lengthBatch pair runs a 30-key chain on the purchase side)."""
    part_sel = f"{part_col}," if part_col else ""
    ev = con.sql(f"""
        SELECT {part_sel} event_id, user_id, epoch_ms(ts) AS ms
        FROM events {where}
        ORDER BY {part_sel} ts, event_id
    """).df()
    if part_col is None:
        out = _fires_walk(ev.reset_index(drop=True), n)
        out["pos"] = range(1, len(out) + 1)
        return out
    parts = []
    for _, grp in ev.groupby(part_col, sort=False):
        g = _fires_walk(grp.reset_index(drop=True), n)
        g["pos"] = range(1, len(g) + 1)
        parts.append(g)
    if not parts:  # empty events table: pd.concat([]) raises (ADVICE r11)
        out = _fires_walk(ev, n)
        out["pos"] = pd.Series(dtype="int64")
        return out
    return pd.concat(parts, ignore_index=True)


def _kept_walk(con, gap_ms: int = DEDUP_MS) -> pd.DataFrame:
    """deduplicate chain: per user, keep the first arrival ts, then
    repeatedly the first ts strictly more than ``gap_ms`` after the
    last kept one. Matches the certified recursive `kept` CTE
    row-for-row (it seeds min(ts) per user and steps to
    min(ts) > kept + gap)."""
    df = con.sql("""
        SELECT DISTINCT user_id, epoch_ms(ts) AS ts_ms FROM events
        ORDER BY user_id, ts_ms
    """).df()
    users = df["user_id"].to_numpy()
    ts = df["ts_ms"].to_numpy()
    keep = []
    cur_user = None
    last = 0
    for i in range(len(df)):
        if users[i] != cur_user:
            cur_user = users[i]
            last = ts[i]
            keep.append(i)
        elif ts[i] > last + gap_ms:
            last = ts[i]
            keep.append(i)
    return df.iloc[keep].reset_index(drop=True)


class _Fenwick:
    """k-th smallest active position in O(log N)."""

    def __init__(self, n: int):
        self.n = n
        self.tree = [0] * (n + 1)
        self.total = 0

    def add(self, i: int, v: int) -> None:
        self.total += v
        while i <= self.n:
            self.tree[i] += v
            i += i & -i

    def kth(self, k: int):
        if self.total < k:
            return None
        pos, rem = 0, k
        pw = 1 << self.n.bit_length()
        while pw:
            npos = pos + pw
            if npos <= self.n and self.tree[npos] < rem:
                pos = npos
                rem -= self.tree[npos]
            pw >>= 1
        return pos + 1


def _evict_walk(users, k: int):
    """For each 1-based position p, the certified `qn` value: the
    position of the k-th smallest q > p whose user's previous
    occurrence is <= p (i.e. the k-th distinct OTHER user's first
    occurrence after p) — the unique:length eviction point. The SQL
    computes it as a range join + row_number()=k, O(N x window) and an
    80GB DuckDB spill at sf1; here the \"first occurrence after p\" set
    (at most one position per user, each position enters exactly when
    its predecessor is crossed and leaves when p passes it) is a
    Fenwick tree, O(N log N)."""
    n = len(users)
    next_pos = [0] * (n + 1)
    last: dict = {}
    for i in range(n, 0, -1):
        u = users[i - 1]
        next_pos[i] = last.get(u, 0)
        last[u] = i
    bit = _Fenwick(n)
    for first in last.values():  # first occurrence of every user
        bit.add(first, 1)
    out = []
    for p in range(1, n + 1):
        bit.add(p, -1)
        np_ = next_pos[p]
        if np_:
            bit.add(np_, 1)
        kth = bit.kth(k)
        if kth is not None and np_ and np_ <= kth:
            kth = bit.kth(k + 1)
        if kth is not None:
            out.append((p, kth))
    return out


def _emissions_qn(con, k: int, part_col: str | None = None) -> pd.DataFrame:
    part_sel = f"{part_col}," if part_col else ""
    ev = con.sql(f"""
        SELECT {part_sel} user_id FROM events
        ORDER BY {part_sel} ts, event_id
    """).df()
    if part_col is None:
        rows = _evict_walk(ev["user_id"].to_numpy(), k)
        return pd.DataFrame(rows, columns=["p_pos", "evict_pos"])
    frames = []
    for val, grp in ev.groupby(part_col, sort=False):
        rows = _evict_walk(grp["user_id"].to_numpy(), k)
        f = pd.DataFrame(rows, columns=["p_pos", "evict_pos"])
        f.insert(0, "et", val)
        frames.append(f)
    return pd.concat(frames, ignore_index=True)


# ------------------------------------------------------- certified tails

_DEDUP_TAIL = """
    SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
    FROM (SELECT e.*, row_number() OVER (PARTITION BY e.user_id, epoch_ms(e.ts)
                                         ORDER BY e.event_id) AS rn
          FROM events e
          JOIN kept k ON e.user_id = k.user_id AND epoch_ms(e.ts) = k.ts_ms) t
    WHERE rn = 1
"""

# last (or first) event per user inside each fired batch — the window
# form of the certified `e.pos = (SELECT max(pos) ... )` join
_LB_BASE = """
    SELECT event_id, user_id, batch_seq,
           CAST(fired_at_ms AS BIGINT) AS fired_at_ms
    FROM (SELECT eb.*, row_number() OVER (PARTITION BY batch_seq, user_id
                                          ORDER BY pos {order}) AS rn
          FROM ev_batched eb WHERE batch_seq >= 0) t
    WHERE rn = 1
"""


def _run(con, helper_tables: dict[str, pd.DataFrame], sql: str):
    for tname, frame in helper_tables.items():
        con.register(tname, frame)
    try:
        return con.sql(sql).df()
    finally:
        for tname in helper_tables:
            con.unregister(tname)


def _dedup_family(con):
    return _run(con, {"kept": _kept_walk(con)}, _DEDUP_TAIL)


def _proc_dedup_replay(con):
    """proc_dedup_replay: the same strict anchored chain with a 2h
    interval and the replay entry's (user_id, event_id, kept_at_ms)
    output shape."""
    return _run(con, {"kept": _kept_walk(con, gap_ms=7_200_000)}, """
        SELECT t.user_id, t.event_id, t.ms AS kept_at_ms
        FROM (SELECT e.user_id, e.event_id, epoch_ms(e.ts) AS ms,
                     row_number() OVER (
                       PARTITION BY e.user_id, epoch_ms(e.ts)
                       ORDER BY e.event_id) AS rn
              FROM events e
              JOIN kept k ON e.user_id = k.user_id
                         AND epoch_ms(e.ts) = k.ts_ms) t
        WHERE rn = 1
    """)


def _unique_length_batch(con):
    return _run(con, {"ev_batched": _ev_batched(con)},
                _LB_BASE.format(order="DESC"))


def _unique_first_length_batch(con):
    return _run(con, {"ev_batched": _ev_batched(con)},
                _LB_BASE.format(order="ASC"))


def _unique_length_batch_expired(con):
    base = _LB_BASE.format(order="DESC")
    return _run(con, {"ev_batched": _ev_batched(con)}, f"""
        WITH base AS ({base}),
        nxt AS (
          SELECT batch_seq - 1 AS batch_seq, fired_at_ms AS expired_at_ms
          FROM (SELECT DISTINCT batch_seq, fired_at_ms FROM base)
        )
        SELECT base.event_id, base.user_id, base.batch_seq,
               base.fired_at_ms, nxt.expired_at_ms
        FROM base JOIN nxt USING (batch_seq)
    """)


def _streaming_length_batch_parity(con):
    base = _LB_BASE.format(order="DESC")
    return _run(con, {"ev_batched": _ev_batched(con)}, f"""
        WITH base AS ({base}),
        last AS (SELECT max(batch_seq) AS mx FROM base)
        SELECT event_id, user_id, batch_seq, 'current' AS channel FROM base
        UNION ALL
        SELECT event_id, user_id, batch_seq, 'expired' AS channel
        FROM base, last WHERE batch_seq < mx
    """)


def _partitioned_base(order: str) -> str:
    return f"""
    SELECT event_type, user_id, event_id, batch_seq,
           CAST(fired_at_ms AS BIGINT) AS fired_at_ms
    FROM (SELECT eb.*, row_number() OVER (PARTITION BY event_type, batch_seq,
                                                       user_id
                                          ORDER BY pos {order}) AS rn
          FROM ev_batched eb WHERE batch_seq >= 0) t
    WHERE rn = 1
    """


def _siddhiql_partitioned_length_batch(con):
    return _run(con, {"ev_batched": _ev_batched(con, part_col="event_type")},
                "SELECT event_type, user_id, event_id, batch_seq, fired_at_ms"
                " FROM (" + _partitioned_base("DESC") + ") t")


def _streaming_partitioned_length_batch_parity(con):
    return _run(con, {"ev_batched": _ev_batched(con, part_col="event_type")},
                "SELECT event_type, user_id, event_id, batch_seq"
                " FROM (" + _partitioned_base("DESC") + ") t")


def _siddhiql_join_mixed(con):
    eb = _ev_batched(con, where="WHERE event_type = 'click'")
    return _run(con, {"ev_batched": eb}, """
        WITH forming AS (
          SELECT event_id, user_id
          FROM (SELECT eb.*, row_number() OVER (PARTITION BY user_id
                                                ORDER BY pos DESC) AS rn
                FROM ev_batched eb WHERE batch_seq < 0) t
          WHERE rn = 1
        ),
        pb AS (
          SELECT * FROM (
            SELECT e.*, (epoch_ms(ts) // 3600000) * 3600000 + 3600000 AS batch_end_ms,
                   row_number() OVER (PARTITION BY epoch_ms(ts) // 3600000, user_id
                                      ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events e WHERE event_type = 'purchase') t WHERE rn = 1),
        lastb AS (
          SELECT * FROM pb
          WHERE batch_end_ms = (SELECT max(batch_end_ms) FROM pb))
        SELECT f.user_id AS user_id, f.event_id AS click_event_id,
               lb.event_id AS purchase_event_id
        FROM forming f JOIN lastb lb ON f.user_id = lb.user_id
    """)


def _siddhiql_join_mixed_all(con):
    """Linear rewrite of the r12 emission-log oracle: the recursive
    ``fires`` CTE is replaced by the walked chain (``_ev_batched``
    gives every click its batch_seq/fire metadata and ``pos``), the
    interval/probe tail runs verbatim SQL. Forming-tail events carry
    batch_seq = -1, so their period index is the fire count."""
    eb = _ev_batched(con, where="WHERE event_type = 'click'")
    return _run(con, {"ev_batched": eb}, """
        WITH f2 AS (
          SELECT DISTINCT batch_seq AS seq,
                 CAST(fired_at_ms AS BIGINT) AS fire_ms,
                 fire_pos
          FROM ev_batched WHERE batch_seq >= 0
        ),
        nf AS (SELECT count(*) AS n FROM f2),
        abat AS (
          SELECT event_id, user_id, batch_seq AS seq,
                 CAST(fired_at_ms AS BIGINT) AS fire_ms
          FROM (SELECT eb.*, row_number() OVER (
                  PARTITION BY batch_seq, user_id
                  ORDER BY pos DESC) AS rn
                FROM ev_batched eb WHERE batch_seq >= 0) t
          WHERE rn = 1
        ),
        pb AS (
          SELECT event_id, user_id, m FROM (
            SELECT e.event_id, e.user_id,
                   epoch_ms(ts) // 3600000 AS m,
                   row_number() OVER (
                     PARTITION BY epoch_ms(ts) // 3600000, user_id
                     ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events e WHERE event_type = 'purchase') t
          WHERE rn = 1
        ),
        ml AS (SELECT max(m) AS ml FROM pb),
        aprobe AS (
          SELECT event_id, user_id, 'current' AS channel, fire_ms AS pt
          FROM abat
          UNION ALL
          SELECT a.event_id, a.user_id, 'expired', n2.fire_ms
          FROM abat a JOIN f2 n2 ON n2.seq = a.seq + 1
        ),
        e12 AS (
          SELECT ap.user_id AS user_id, ap.event_id AS click_event_id,
                 pb.event_id AS purchase_event_id, ap.channel AS channel
          FROM aprobe ap CROSS JOIN ml
          JOIN pb ON least(ap.pt // 3600000, ml.ml + 1) = pb.m + 1
                 AND ap.user_id = pb.user_id
        ),
        per AS (
          SELECT eb.event_id, eb.user_id, eb.ms, eb.pos,
                 CASE WHEN eb.batch_seq >= 0 THEN eb.batch_seq
                      ELSE (SELECT n FROM nf) END AS pseq
          FROM ev_batched eb
        ),
        iv0 AS (
          SELECT p.*,
                 lead(ms) OVER (PARTITION BY pseq, user_id
                                ORDER BY pos) AS nxt,
                 (SELECT fire_ms FROM f2 WHERE f2.seq = p.pseq) AS fire
          FROM per p
        ),
        iv AS (
          SELECT user_id, event_id, ms AS frm,
                 CASE WHEN nxt IS NOT NULL AND fire IS NOT NULL
                      THEN least(nxt, fire)
                      WHEN nxt IS NOT NULL THEN nxt
                      ELSE fire END AS tto
          FROM iv0
        ),
        bprobe AS (
          SELECT event_id, user_id, 'current' AS channel,
                 (m + 1) * 3600000 AS pt
          FROM pb
          UNION ALL
          SELECT pb.event_id, pb.user_id, 'expired', (pb.m + 2) * 3600000
          FROM pb CROSS JOIN ml WHERE pb.m < ml.ml
        ),
        e34 AS (
          SELECT iv.user_id AS user_id, iv.event_id AS click_event_id,
                 bp.event_id AS purchase_event_id, bp.channel AS channel
          FROM bprobe bp JOIN iv
            ON iv.user_id = bp.user_id
           AND iv.frm < bp.pt
           AND (iv.tto IS NULL OR bp.pt <= iv.tto)
        )
        SELECT * FROM e12 UNION ALL SELECT * FROM e34
    """)


def _siddhiql_join_mixed_lengths_all(con):
    """Linear rewrite of the r12 lengthBatch ⋈ lengthBatch emission
    log: both recursive fires chains come from the walk (clicks
    n=50, purchases n=30), the instant/interval tail runs verbatim
    SQL with lexicographic (ms, event_id) comparisons."""
    aw = _ev_batched(con, where="WHERE event_type = 'click'", n=50)
    bw = _ev_batched(con, where="WHERE event_type = 'purchase'", n=30)

    def side_sql(tab: str) -> str:
        return f"""
        f2_{tab} AS (
          SELECT DISTINCT w.batch_seq AS seq, w.fire_pos
          FROM {tab} w WHERE w.batch_seq >= 0
        ),
        fi_{tab} AS (
          SELECT f.seq, f.fire_pos, e.ms AS pms, e.event_id AS ptb
          FROM f2_{tab} f JOIN {tab} e ON e.pos = f.fire_pos
        ),
        nf_{tab} AS (SELECT count(*) AS n FROM fi_{tab}),
        ret_{tab} AS (
          SELECT event_id, user_id, batch_seq AS seq FROM (
            SELECT w.*, row_number() OVER (
              PARTITION BY batch_seq, user_id ORDER BY pos DESC) AS rn
            FROM {tab} w WHERE batch_seq >= 0) t
          WHERE rn = 1
        ),
        probe_{tab} AS (
          SELECT r.event_id, r.user_id, 'current' AS channel,
                 f.pms, f.ptb
          FROM ret_{tab} r JOIN fi_{tab} f ON f.seq = r.seq
          UNION ALL
          SELECT r.event_id, r.user_id, 'expired', f.pms, f.ptb
          FROM ret_{tab} r JOIN fi_{tab} f ON f.seq = r.seq + 1
        ),
        iv_{tab} AS (
          SELECT user_id, event_id, ms AS ems, event_id AS etb,
                 CASE WHEN nms IS NOT NULL AND (fms IS NULL OR
                           (nms, ntb) < (fms, ftb))
                      THEN nms ELSE fms END AS lms,
                 CASE WHEN nms IS NOT NULL AND (fms IS NULL OR
                           (nms, ntb) < (fms, ftb))
                      THEN ntb ELSE ftb END AS ltb
          FROM (
            SELECT p.*,
                   lead(ms) OVER (PARTITION BY pseq, user_id
                                  ORDER BY pos) AS nms,
                   lead(event_id) OVER (PARTITION BY pseq, user_id
                                        ORDER BY pos) AS ntb,
                   (SELECT pms FROM fi_{tab} WHERE seq = p.pseq) AS fms,
                   (SELECT ptb FROM fi_{tab} WHERE seq = p.pseq) AS ftb
            FROM (
              SELECT w.event_id, w.user_id, w.ms, w.pos,
                     CASE WHEN w.batch_seq >= 0 THEN w.batch_seq
                          ELSE (SELECT n FROM nf_{tab}) END AS pseq
              FROM {tab} w) p)
        )"""

    return _run(con, {"aw": aw, "bw": bw}, f"""
        WITH {side_sql('aw')},
        {side_sql('bw')},
        e_ab AS (
          SELECT ap.user_id AS user_id,
                 ap.event_id AS click_event_id,
                 iv.event_id AS purchase_event_id,
                 ap.channel AS channel
          FROM probe_aw ap JOIN iv_bw iv
            ON ap.user_id = iv.user_id
           AND (iv.ems, iv.etb) < (ap.pms, ap.ptb)
           AND (iv.lms IS NULL OR (ap.pms, ap.ptb) < (iv.lms, iv.ltb))
        ),
        e_ba AS (
          SELECT bp.user_id AS user_id,
                 iv.event_id AS click_event_id,
                 bp.event_id AS purchase_event_id,
                 bp.channel AS channel
          FROM probe_bw bp JOIN iv_aw iv
            ON bp.user_id = iv.user_id
           AND (iv.ems, iv.etb) < (bp.pms, bp.ptb)
           AND (iv.lms IS NULL OR (bp.pms, bp.ptb) < (iv.lms, iv.ltb))
        )
        SELECT * FROM e_ab UNION ALL SELECT * FROM e_ba
    """)


def _siddhiql_join_mixed_lb_external_all(con):
    """Linear rewrite of the lengthBatch ⋈ externalTimeBatch emission
    log: the click chain comes from the walk; the external slot log
    and the instant-space tail run verbatim SQL."""
    aw = _ev_batched(con, where="WHERE event_type = 'click'", n=50)
    return _run(con, {"aw": aw}, """
        WITH f2_aw AS (
          SELECT DISTINCT w.batch_seq AS seq, w.fire_pos
          FROM aw w WHERE w.batch_seq >= 0
        ),
        fi_aw AS (
          SELECT f.seq, f.fire_pos, e.ms AS pms, e.event_id AS ptb
          FROM f2_aw f JOIN aw e ON e.pos = f.fire_pos
        ),
        nf_aw AS (SELECT count(*) AS n FROM fi_aw),
        ret_aw AS (
          SELECT event_id, user_id, batch_seq AS seq FROM (
            SELECT w.*, row_number() OVER (
              PARTITION BY batch_seq, user_id ORDER BY pos DESC) AS rn
            FROM aw w WHERE batch_seq >= 0) t
          WHERE rn = 1
        ),
        aprobe AS (
          SELECT r.event_id, r.user_id, 'current' AS channel,
                 f.pms, f.ptb
          FROM ret_aw r JOIN fi_aw f ON f.seq = r.seq
          UNION ALL
          SELECT r.event_id, r.user_id, 'expired', f.pms, f.ptb
          FROM ret_aw r JOIN fi_aw f ON f.seq = r.seq + 1
        ),
        aiv AS (
          SELECT user_id, event_id, ms AS ems, event_id AS etb,
                 CASE WHEN nms IS NOT NULL AND (fms IS NULL OR
                           (nms, ntb) < (fms, ftb))
                      THEN nms ELSE fms END AS lms,
                 CASE WHEN nms IS NOT NULL AND (fms IS NULL OR
                           (nms, ntb) < (fms, ftb))
                      THEN ntb ELSE ftb END AS ltb
          FROM (
            SELECT p.*,
                   lead(ms) OVER (PARTITION BY pseq, user_id
                                  ORDER BY pos) AS nms,
                   lead(event_id) OVER (PARTITION BY pseq, user_id
                                        ORDER BY pos) AS ntb,
                   (SELECT pms FROM fi_aw WHERE seq = p.pseq) AS fms,
                   (SELECT ptb FROM fi_aw WHERE seq = p.pseq) AS ftb
            FROM (
              SELECT w.event_id, w.user_id, w.ms, w.pos,
                     CASE WHEN w.batch_seq >= 0 THEN w.batch_seq
                          ELSE (SELECT n FROM nf_aw) END AS pseq
              FROM aw w) p)
        ),
        es AS (
          SELECT event_id, user_id, s FROM (
            SELECT e.event_id, e.user_id,
                   epoch_ms(ts) // 7200000 AS s,
                   row_number() OVER (
                     PARTITION BY epoch_ms(ts) // 7200000, user_id
                     ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events e WHERE event_type = 'purchase') t
          WHERE rn = 1
        ),
        el AS (
          SELECT s,
                 lead(fm, 1) OVER (ORDER BY s) AS flms,
                 lead(ftb, 1) OVER (ORDER BY s) AS fltb,
                 lead(fm, 2) OVER (ORDER BY s) AS exms,
                 lead(ftb, 2) OVER (ORDER BY s) AS extb
          FROM (
            SELECT s, ms AS fm, event_id AS ftb FROM (
              SELECT epoch_ms(ts) // 7200000 AS s,
                     epoch_ms(ts) AS ms, event_id,
                     row_number() OVER (
                       PARTITION BY epoch_ms(ts) // 7200000
                       ORDER BY epoch_ms(ts), event_id) AS rn
              FROM events WHERE event_type = 'purchase') t
            WHERE rn = 1)
        ),
        bprobe AS (
          SELECT es.event_id, es.user_id, 'current' AS channel,
                 el.flms AS pms, el.fltb AS ptb
          FROM es JOIN el USING (s) WHERE el.flms IS NOT NULL
          UNION ALL
          SELECT es.event_id, es.user_id, 'expired', el.exms, el.extb
          FROM es JOIN el USING (s) WHERE el.exms IS NOT NULL
        ),
        biv AS (
          SELECT es.user_id, es.event_id,
                 el.flms AS ems, el.fltb AS etb,
                 el.exms AS lms, el.extb AS ltb
          FROM es JOIN el USING (s) WHERE el.flms IS NOT NULL
        ),
        e_ab AS (
          SELECT ap.user_id AS user_id,
                 ap.event_id AS click_event_id,
                 iv.event_id AS purchase_event_id,
                 ap.channel AS channel
          FROM aprobe ap JOIN biv iv
            ON ap.user_id = iv.user_id
           AND (iv.ems, iv.etb) < (ap.pms, ap.ptb)
           AND (iv.lms IS NULL OR (ap.pms, ap.ptb) < (iv.lms, iv.ltb))
        ),
        e_ba AS (
          SELECT bp.user_id AS user_id,
                 iv.event_id AS click_event_id,
                 bp.event_id AS purchase_event_id,
                 bp.channel AS channel
          FROM bprobe bp JOIN aiv iv
            ON bp.user_id = iv.user_id
           AND (iv.ems, iv.etb) < (bp.pms, bp.ptb)
           AND (iv.lms IS NULL OR (bp.pms, bp.ptb) < (iv.lms, iv.ltb))
        )
        SELECT * FROM e_ab UNION ALL SELECT * FROM e_ba
    """)


def _siddhiql_join_ever_lb_all(con):
    """Linear rewrite of the lengthBatch ⋈ unique:ever emission log
    (r13): the click chain comes from the walk; the ever side's
    lead-based live intervals and the instant-space tail run verbatim
    SQL (no recursion anywhere on the purchase side)."""
    aw = _ev_batched(con, where="WHERE event_type = 'click'", n=50)
    return _run(con, {"aw": aw}, """
        WITH f2_aw AS (
          SELECT DISTINCT w.batch_seq AS seq, w.fire_pos
          FROM aw w WHERE w.batch_seq >= 0
        ),
        fi_aw AS (
          SELECT f.seq, f.fire_pos, e.ms AS pms, e.event_id AS ptb
          FROM f2_aw f JOIN aw e ON e.pos = f.fire_pos
        ),
        nf_aw AS (SELECT count(*) AS n FROM fi_aw),
        ret_aw AS (
          SELECT event_id, user_id, batch_seq AS seq FROM (
            SELECT w.*, row_number() OVER (
              PARTITION BY batch_seq, user_id ORDER BY pos DESC) AS rn
            FROM aw w WHERE batch_seq >= 0) t
          WHERE rn = 1
        ),
        aprobe AS (
          SELECT r.event_id, r.user_id, 'current' AS channel,
                 f.pms, f.ptb
          FROM ret_aw r JOIN fi_aw f ON f.seq = r.seq
          UNION ALL
          SELECT r.event_id, r.user_id, 'expired', f.pms, f.ptb
          FROM ret_aw r JOIN fi_aw f ON f.seq = r.seq + 1
        ),
        aiv AS (
          SELECT user_id, event_id, ms AS ems, event_id AS etb,
                 CASE WHEN nms IS NOT NULL AND (fms IS NULL OR
                           (nms, ntb) < (fms, ftb))
                      THEN nms ELSE fms END AS lms,
                 CASE WHEN nms IS NOT NULL AND (fms IS NULL OR
                           (nms, ntb) < (fms, ftb))
                      THEN ntb ELSE ftb END AS ltb
          FROM (
            SELECT p.*,
                   lead(ms) OVER (PARTITION BY pseq, user_id
                                  ORDER BY pos) AS nms,
                   lead(event_id) OVER (PARTITION BY pseq, user_id
                                        ORDER BY pos) AS ntb,
                   (SELECT pms FROM fi_aw WHERE seq = p.pseq) AS fms,
                   (SELECT ptb FROM fi_aw WHERE seq = p.pseq) AS ftb
            FROM (
              SELECT w.event_id, w.user_id, w.ms, w.pos,
                     CASE WHEN w.batch_seq >= 0 THEN w.batch_seq
                          ELSE (SELECT n FROM nf_aw) END AS pseq
              FROM aw w) p)
        ),
        pu AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ms
          FROM events WHERE event_type = 'purchase'
        ),
        biv AS (
          SELECT user_id, event_id, ms AS ems, event_id AS etb,
                 lead(ms) OVER (PARTITION BY user_id
                                ORDER BY ms, event_id) AS lms,
                 lead(event_id) OVER (PARTITION BY user_id
                                      ORDER BY ms, event_id) AS ltb
          FROM pu
        ),
        bprobe AS (
          SELECT user_id, event_id, 'current' AS channel,
                 ems AS pms, etb AS ptb
          FROM biv
          UNION ALL
          SELECT user_id, event_id, 'expired', lms, ltb
          FROM biv WHERE lms IS NOT NULL
        ),
        e_ab AS (
          SELECT ap.user_id AS user_id,
                 ap.event_id AS click_event_id,
                 iv.event_id AS purchase_event_id,
                 ap.channel AS channel
          FROM aprobe ap JOIN biv iv
            ON ap.user_id = iv.user_id
           AND (iv.ems, iv.etb) < (ap.pms, ap.ptb)
           AND (iv.lms IS NULL OR (ap.pms, ap.ptb) < (iv.lms, iv.ltb))
        ),
        e_ba AS (
          SELECT bp.user_id AS user_id,
                 iv.event_id AS click_event_id,
                 bp.event_id AS purchase_event_id,
                 bp.channel AS channel
          FROM bprobe bp JOIN aiv iv
            ON bp.user_id = iv.user_id
           AND (iv.ems, iv.etb) < (bp.pms, bp.ptb)
           AND (iv.lms IS NULL OR (bp.pms, bp.ptb) < (iv.lms, iv.ltb))
        )
        SELECT * FROM e_ab UNION ALL SELECT * FROM e_ba
    """)


def _siddhiql_join_length_tb_all(con):
    """Linear rewrite of the unique:length(20) ⋈ timeBatch oracle
    (r13): the eviction positions come from the Fenwick walk over the
    CLICK stream (the certified SQL's range join + row_number()=20
    spills tens of GB at sf1); the live-interval tail and the
    timeBatch side run verbatim SQL."""
    ev = con.sql("""
        SELECT user_id FROM events WHERE event_type = 'click'
        ORDER BY ts, event_id
    """).df()
    qn = pd.DataFrame(_evict_walk(ev["user_id"].to_numpy(), 20),
                      columns=["p_pos", "evict_pos"])
    return _run(con, {"qn": qn}, """
        WITH x AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ms,
                 row_number() OVER (ORDER BY ts, event_id) AS pos
          FROM events WHERE event_type = 'click'
        ),
        linked AS (
          SELECT *,
                 lead(pos) OVER (PARTITION BY user_id
                                 ORDER BY pos) AS next_pos
          FROM x
        ),
        iv AS (
          SELECT l.user_id, l.event_id, l.ms AS frm, x2.ms AS tto
          FROM (
            SELECT l.user_id, l.event_id, l.ms,
                   least(coalesce(l.next_pos, 9223372036854775807),
                         coalesce(q.evict_pos, 9223372036854775807))
                     AS exp_pos
            FROM linked l LEFT JOIN qn q ON q.p_pos = l.pos
          ) l LEFT JOIN x x2 ON x2.pos = l.exp_pos
        ),
        pb AS (
          SELECT event_id, user_id, m FROM (
            SELECT e.event_id, e.user_id,
                   epoch_ms(ts) // 3600000 AS m,
                   row_number() OVER (
                     PARTITION BY epoch_ms(ts) // 3600000, user_id
                     ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events e WHERE event_type = 'purchase') t
          WHERE rn = 1
        ),
        ml AS (SELECT max(m) AS ml FROM pb),
        aprobe AS (
          SELECT user_id, event_id, 'current' AS channel, frm AS pf
          FROM iv
          UNION ALL
          SELECT user_id, event_id, 'expired', tto
          FROM iv WHERE tto IS NOT NULL
        ),
        e12 AS (
          SELECT ap.user_id AS user_id,
                 ap.event_id AS click_event_id,
                 pb.event_id AS purchase_event_id,
                 ap.channel AS channel
          FROM aprobe ap CROSS JOIN ml
          JOIN pb ON least(ap.pf // 3600000, ml.ml + 1) = pb.m + 1
                 AND ap.user_id = pb.user_id
        ),
        bprobe AS (
          SELECT event_id, user_id, 'current' AS channel,
                 (m + 1) * 3600000 AS pt
          FROM pb
          UNION ALL
          SELECT pb.event_id, pb.user_id, 'expired',
                 (pb.m + 2) * 3600000
          FROM pb CROSS JOIN ml WHERE pb.m < ml.ml
        ),
        e34 AS (
          SELECT iv.user_id AS user_id,
                 iv.event_id AS click_event_id,
                 bp.event_id AS purchase_event_id,
                 bp.channel AS channel
          FROM bprobe bp JOIN iv
            ON iv.user_id = bp.user_id
           AND iv.frm < bp.pt
           AND (iv.tto IS NULL OR bp.pt <= iv.tto)
        )
        SELECT * FROM e12 UNION ALL SELECT * FROM e34
    """)


def _unique_length_emissions_ordered(con):
    return _run(con, {"qn": _emissions_qn(con, 100)}, """
        WITH ev AS (
          SELECT event_id, user_id, row_number() OVER (ORDER BY ts, event_id) AS pos FROM events
        ),
        linked AS (
          SELECT *,
                 lead(pos) OVER (PARTITION BY user_id ORDER BY pos) AS next_pos
          FROM ev
        ),
        expiry AS (
          SELECT l.pos, l.event_id,
                 least(coalesce(l.next_pos, 9223372036854775807),
                       coalesce(q.evict_pos, 9223372036854775807)) AS exp_pos
          FROM linked l LEFT JOIN qn q ON q.p_pos = l.pos
        ),
        arr AS (
          SELECT e.pos, e.event_id, x.event_id AS expired_eid
          FROM ev e LEFT JOIN expiry x ON x.exp_pos = e.pos
        ),
        flagged AS (
          SELECT pos, event_id, expired_eid,
                 CASE WHEN expired_eid IS NOT NULL THEN 1 ELSE 0 END AS has_exp,
                 (pos - 1) + coalesce(sum(CASE WHEN expired_eid IS NOT NULL THEN 1 ELSE 0 END)
                   OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
          FROM arr
        ),
        outp AS (
          SELECT expired_eid AS event_id, CAST(base AS BIGINT) AS emission_idx,
                 'expired' AS channel
          FROM flagged WHERE expired_eid IS NOT NULL
          UNION ALL
          SELECT event_id, CAST(base + has_exp AS BIGINT), 'current' AS channel FROM flagged
        )
        SELECT o.event_id, e.user_id, o.channel, o.emission_idx
        FROM outp o JOIN ev e ON e.event_id = o.event_id
    """)


def _unique_length_emissions_partitioned(con):
    return _run(con, {"qn": _emissions_qn(con, 20, part_col="event_type")}, """
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
          FROM events
        ),
        linked AS (
          SELECT *,
                 lead(pos) OVER (PARTITION BY event_type, user_id ORDER BY pos) AS next_pos
          FROM ev
        ),
        expiry AS (
          SELECT l.event_type, l.pos, l.event_id,
                 least(coalesce(l.next_pos, 9223372036854775807),
                       coalesce(q.evict_pos, 9223372036854775807)) AS exp_pos
          FROM linked l LEFT JOIN qn q ON q.et = l.event_type AND q.p_pos = l.pos
        ),
        arr AS (
          SELECT e.event_type, e.pos, e.event_id, x.event_id AS expired_eid
          FROM ev e LEFT JOIN expiry x
            ON x.event_type = e.event_type AND x.exp_pos = e.pos
        ),
        flagged AS (
          SELECT event_type, pos, event_id, expired_eid,
                 CASE WHEN expired_eid IS NOT NULL THEN 1 ELSE 0 END AS has_exp,
                 (pos - 1) + coalesce(sum(CASE WHEN expired_eid IS NOT NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
          FROM arr
        ),
        outp AS (
          SELECT event_type, expired_eid AS event_id, CAST(base AS BIGINT) AS emission_idx,
                 'expired' AS channel
          FROM flagged WHERE expired_eid IS NOT NULL
          UNION ALL
          SELECT event_type, event_id, CAST(base + has_exp AS BIGINT), 'current' AS channel
          FROM flagged
        )
        SELECT o.event_type, o.event_id, e.user_id, o.channel, o.emission_idx
        FROM outp o JOIN ev e ON e.event_id = o.event_id
    """)


SCALE_ORACLES = {
    "unique_length_emissions_ordered": _unique_length_emissions_ordered,
    "unique_length_emissions_partitioned": _unique_length_emissions_partitioned,
    "unique_deduplicate": _dedup_family,
    "proc_dedup_replay": _proc_dedup_replay,
    "streaming_dedup_parity": _dedup_family,
    "streaming_python_sink_parity": _dedup_family,
    "streaming_python_source_partitioned_parity": _dedup_family,
    "unique_length_batch": _unique_length_batch,
    "unique_first_length_batch": _unique_first_length_batch,
    "unique_length_batch_expired": _unique_length_batch_expired,
    "streaming_length_batch_parity": _streaming_length_batch_parity,
    "siddhiql_partitioned_length_batch": _siddhiql_partitioned_length_batch,
    "streaming_partitioned_length_batch_parity":
        _streaming_partitioned_length_batch_parity,
    "siddhiql_join_mixed": _siddhiql_join_mixed,
    "siddhiql_join_mixed_all": _siddhiql_join_mixed_all,
    "siddhiql_join_mixed_lengths_all": _siddhiql_join_mixed_lengths_all,
    "siddhiql_join_mixed_lb_external_all": _siddhiql_join_mixed_lb_external_all,
    "siddhiql_join_ever_lb_all": _siddhiql_join_ever_lb_all,
    "siddhiql_join_length_tb_all": _siddhiql_join_length_tb_all,
}


# ------------------------------------------------------------ selfcheck

def selfcheck(sf_dir: str) -> bool:
    """Every rewrite must equal the certified recursive SQL, value for
    value, on the given (small) corpus."""
    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    ok = True
    for name, fn in sorted(SCALE_ORACLES.items()):
        certified = con.sql(oracles[name]).df()
        rewritten = fn(con)
        cols = sorted(certified.columns)
        if sorted(rewritten.columns) != cols:
            print(f"{name}: SCHEMA MISMATCH {sorted(rewritten.columns)} "
                  f"vs {cols}")
            ok = False
            continue
        a = certified[cols].sort_values(cols).reset_index(drop=True)
        b = rewritten[cols].sort_values(cols).reset_index(drop=True)
        if len(a) != len(b) or not a.equals(b.astype(a.dtypes.to_dict())):
            print(f"{name}: MISMATCH rows {len(a)} vs {len(b)}")
            ok = False
        else:
            print(f"{name}: equal ({len(a)} rows)")
    return ok


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(0 if selfcheck(sf) else 1)
