"""Build the /tmp/sf10 100x heavy-tail corpus from /tmp/sf1.

VERDICT r11 item 5: the sf1 sweep proved parity, but the DuckDB
oracle — not the engine — was the verification bottleneck; the
remaining question is the ENGINE's 10x -> 100x scale law on the
slowest entries. This tool extends the committed sf1 recipe
(tools/build_sf1.py) one more decade for the three tables the heavy
tail reads: ``events``, ``documents``, ``embeddings``.

Corpus design — the one deliberate difference from build_sf1:
replicating identical document twins again would square the near-dup
pair density (sf1 already carries the engineered ~100x density; a
second identical replication makes the PAIR OUTPUT ~100x sf1's 11.1M
= ~1.1B rows, measuring the output law, not the engine). Instead each
replica's text is mutated by deleting a circular 35% arc whose start
fraction is replica_index/10:

- WITHIN a replica every relative relation of sf1 survives exactly
  (identical twins stay identical, organic near-dups keep aligned
  proportional deletions), so within-replica pairs reproduce sf1's;
- ACROSS replicas the same doc's copies share a fractional overlap of
  at most (0.65 - 0.1)/(0.65 + 0.1) ~= 0.73 jaccard, under the 0.8
  gate, so cross-replica pairs are suppressed (a thin integer-rounding
  tail grazes exactly 0.80 on short docs; deterministic either way).

Result: pair entries scale LINEARLY (10 x sf1's output) while the
corpus scans/shuffles scale 10x — the engine law the table needs.
Events/embeddings replicate exactly as build_sf1 (id shifts keep ids
globally unique; event spans append end-to-end on the timeline;
embedding vectors are byte-identical, so semantic-dedup output grows
by its documented duplicate law).

Deterministic — no randomness, no clock reads.

Usage: python tools/build_sf10.py [SRC_DIR=/tmp/sf1] [DST_DIR=/tmp/sf10]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
GAP_US = 3_600_000_000
ARC = 0.35  # deleted fraction; adjacent replicas then overlap
# at most (0.65-0.1)/(0.65+0.1) ~= 0.73 jaccard, clear of the 0.8 gate
# (at 0.30 the measured adjacent-replica jaccard grazed 0.80)


def _mutate_texts(texts: list, frac: float) -> list:
    out = []
    for t in texts:
        if t is None or len(t) < 20:
            out.append(t)
            continue
        n = len(t)
        c = int(ARC * n)
        s = int(frac * n)
        if s + c <= n:
            out.append(t[:s] + t[s + c:])
        else:  # circular arc wraps: delete tail [s,n) and head [0, s+c-n)
            out.append(t[s + c - n:s])
    return out


def _shift(col, offset: int, typ):
    return pc.add(col, pa.scalar(offset, type=typ)) if offset else col


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    os.makedirs(dst, exist_ok=True)

    ev = pq.read_table(f"{src}/events.parquet")
    ts = ev["ts"]
    lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
    ts_span = int((hi - lo).total_seconds() * 1_000_000) + GAP_US
    spans = {c: int(pc.max(ev[c]).as_py()) + 1 for c in ("event_id", "user_id")}
    parts = []
    for i in range(REPLICAS):
        cols = {}
        for f in ev.schema:
            col = ev[f.name]
            if f.name in spans:
                col = _shift(col, i * spans[f.name], f.type)
            elif f.name == "ts" and i:
                col = pc.add(col.cast(pa.int64()),
                             pa.scalar(i * ts_span, pa.int64())).cast(f.type)
            cols[f.name] = col
        parts.append(pa.table(cols, schema=ev.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/events.parquet",
                   row_group_size=max(out.num_rows // 64, 1024))
    print(f"events: {ev.num_rows} -> {out.num_rows}", flush=True)

    docs = pq.read_table(f"{src}/documents.parquet")
    texts = docs["text"].to_pylist()
    doc_span = int(pc.max(docs["doc_id"]).as_py()) + 1
    parts = []
    for i in range(REPLICAS):
        mut = pa.array(_mutate_texts(texts, i / REPLICAS), pa.string())
        cols = {
            "doc_id": _shift(docs["doc_id"], i * doc_span,
                             docs.schema.field("doc_id").type),
            "text": mut,
            "lang": docs["lang"],
            "source": docs["source"],
            "n_chars": pc.cast(pc.utf8_length(mut),
                               docs.schema.field("n_chars").type),
        }
        parts.append(pa.table(cols, schema=docs.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/documents.parquet",
                   row_group_size=max(out.num_rows // 64, 1024))
    print(f"documents: {docs.num_rows} -> {out.num_rows}", flush=True)

    emb = pq.read_table(f"{src}/embeddings.parquet")
    vec_span = int(pc.max(emb["vec_id"]).as_py()) + 1
    parts = []
    for i in range(REPLICAS):
        cols = {
            f.name: (_shift(emb[f.name], i * vec_span, f.type)
                     if f.name == "vec_id" else emb[f.name])
            for f in emb.schema
        }
        parts.append(pa.table(cols, schema=emb.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/embeddings.parquet",
                   row_group_size=max(out.num_rows // 64, 1024))
    print(f"embeddings: {emb.num_rows} -> {out.num_rows}", flush=True)


if __name__ == "__main__":
    main()
