"""Build the /tmp/sf1 10x corpus from /root/testdata/sf0.1.

Reproduces (now as a committed tool) the ad-hoc 10x corpus used for
every BASELINE.md sf1 scale table since round 7:

- ``events`` x10: replica i shifts ``event_id``/``user_id`` past the
  original id space (ids stay globally unique, user space grows 10x)
  and shifts ``ts`` by i * (span + 1h) so each replica is appended a
  full span later on the timeline -> 1M events over a 10x-longer
  stream.
- ``documents``/``embeddings`` x10 with shifted ids and byte-identical
  payloads: every doc gains 9 identical twins, so near-dup PAIR counts
  grow ~100x — an intentional worst-case dup-density stress for the
  dedup tier.
- TPC-H tables x10 with coherent key shifts (customer/supplier/part/
  orders/lineitem each shift their own key and every foreign key by
  the same per-table offset), so joins stay referentially intact at
  10x density. ``nation``/``region`` are fixed dims and are copied.

Deterministic — no randomness, no timestamps-of-now. Output layout is
one single-file ``<table>.parquet`` per table, same as the driver's
testdata, so both Spark and the DuckDB oracle read it unchanged.

Row groups are sized to ~1/32 of each table (min 1,024 rows) rather
than pyarrow's 1M-row default: parquet scan parallelism — in Spark
tasks AND DuckDB oracle threads — is row-group granular, and a 50k-doc
table in ONE row group serializes every scan (measured: the char-ngram
oracle's 11.7M-pair probe ran single-threaded for 25+ min against a
one-row-group file).

Usage: python tools/build_sf1.py [SRC_DIR] [DST_DIR]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
GAP_US = 3_600_000_000  # 1h gap between appended event spans

# table -> {column: id-space it shifts in}. Columns sharing an id
# space (fk -> pk) shift by the same offset, keeping joins coherent.
SHIFT_COLS = {
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
}
COPY_TABLES = ("nation", "region")


def _id_spans(tables: dict[str, pa.Table]) -> dict[str, int]:
    """Per id-space offset unit: max(value)+1 over every column bound
    to that space, so replica i's ids start at i * unit."""
    spans: dict[str, int] = {}
    for tname, cols in SHIFT_COLS.items():
        for col, space in cols.items():
            mx = pc.max(tables[tname][col]).as_py()
            spans[space] = max(spans.get(space, 0), int(mx) + 1)
    return spans


def _replicate(name: str, tab: pa.Table, spans: dict[str, int]) -> pa.Table:
    parts = []
    ts_span = None
    if name == "events":
        ts = tab["ts"]
        lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
        ts_span = int((hi - lo).total_seconds() * 1_000_000) + GAP_US
    for i in range(REPLICAS):
        cols = {}
        for field in tab.schema:
            col = tab[field.name]
            space = SHIFT_COLS[name].get(field.name)
            if space is not None and i:
                col = pc.add(col, pa.scalar(i * spans[space],
                                            type=field.type))
            elif name == "events" and field.name == "ts" and i:
                shifted = pc.add(col.cast(pa.int64()),
                                 pa.scalar(i * ts_span, type=pa.int64()))
                col = shifted.cast(field.type)
            cols[field.name] = col
        parts.append(pa.table(cols, schema=tab.schema))
    return pa.concat_tables(parts)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    tables = {n: pq.read_table(f"{src}/{n}.parquet") for n in SHIFT_COLS}
    spans = _id_spans(tables)
    for name, tab in tables.items():
        out = _replicate(name, tab, spans)
        pq.write_table(out, f"{dst}/{name}.parquet",
                       row_group_size=max(out.num_rows // 32, 1024))
        print(f"{name}: {tab.num_rows} -> {out.num_rows}", flush=True)
    for name in COPY_TABLES:
        tab = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tab, f"{dst}/{name}.parquet")
        print(f"{name}: copied {tab.num_rows}", flush=True)


if __name__ == "__main__":
    main()
