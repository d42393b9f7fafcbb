"""Build the /tmp/sfskew HOT-KEY corpus from /root/testdata/sf0.1.

Every scale claim so far is measured on uniform-ish synthetic corpora;
a 1000-executor cluster's real failure mode is one hot key (VERDICT
r11 next-round item 3). This tool builds a deterministic skewed twin:

- ``events``: the sf1 builder's 10x replication (1M rows, coherent id
  shifts), then two hot-key remaps —
    * user_id := HOT_USER where event_id % 10 == 0  (~10% of all rows
      on ONE user: the per-key-sequential stress for sessionize /
      funnel / keyed windows)
    * event_type := 'view' where event_id % 2 == 0  (~60% of rows on
      ONE type after overlap with the organic ~20% share: the hot
      group for type-keyed aggregation)
- ``documents``: source := HOT_SOURCE where doc_id % 2 == 0 (one
  "domain" owns ~52% of the corpus — the crawl-skew shape), and the
  same docs get HOT_SENTENCE appended (then n_chars recomputed): its
  ~60 char-5-grams each have document frequency ~400 inside the hot
  source's length buckets, so the char-ngram posting join sees a few
  shuffle keys carrying ~80k candidate pairs each while the median
  gram carries ~1 — shuffle-join key skew by construction. The
  sentence is ~1/5 of a typical doc, so injected pairs stay below the
  0.8 jaccard threshold: the join skew is real but the verified
  output stays comparable.
- everything else: copied from the source dir (referential integrity
  for the TPC-H tier, embeddings untouched).

Deterministic — no randomness, no clock reads. Output layout matches
the driver's testdata (single-file <table>.parquet, ~32 row groups)
so Spark, the DuckDB oracle, and tools/oracle_sweep.py read it
unchanged.

Usage: python tools/build_skew.py [SRC_DIR] [DST_DIR]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from build_sf1 import COPY_TABLES, SHIFT_COLS, _id_spans, _replicate  # noqa: E402

HOT_USER = 7
HOT_TYPE = "view"
HOT_SOURCE = "src0"
HOT_SENTENCE = (
    " the quick brown fox jumps over the lazy dog near the river bank"
)


def _skew_events(tab: pa.Table) -> pa.Table:
    eid = tab["event_id"]
    # event_id % 10 == 0 -> hot user (exactly 10% of a dense id space)
    hot_user_mask = pc.equal(
        pc.subtract(eid, pc.multiply(pc.divide(eid, 10), 10)), 0
    )
    hot_type_mask = pc.equal(
        pc.subtract(eid, pc.multiply(pc.divide(eid, 2), 2)), 0
    )
    user = pc.if_else(hot_user_mask,
                      pa.scalar(HOT_USER, tab.schema.field("user_id").type),
                      tab["user_id"])
    etype = pc.if_else(hot_type_mask, pa.scalar(HOT_TYPE), tab["event_type"])
    return tab.set_column(
        tab.schema.get_field_index("user_id"), "user_id", user
    ).set_column(
        tab.schema.get_field_index("event_type"), "event_type", etype
    )


def _skew_documents(tab: pa.Table) -> pa.Table:
    did = tab["doc_id"]
    hot = pc.equal(pc.subtract(did, pc.multiply(pc.divide(did, 2), 2)), 0)
    source = pc.if_else(hot, pa.scalar(HOT_SOURCE), tab["source"])
    text = pc.if_else(
        hot, pc.binary_join_element_wise(tab["text"], HOT_SENTENCE, ""),
        tab["text"],
    )
    n_chars = pc.cast(pc.utf8_length(text), tab.schema.field("n_chars").type)
    out = tab.set_column(tab.schema.get_field_index("source"), "source", source)
    out = out.set_column(out.schema.get_field_index("text"), "text", text)
    return out.set_column(
        out.schema.get_field_index("n_chars"), "n_chars", n_chars
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfskew"
    os.makedirs(dst, exist_ok=True)
    tables = {n: pq.read_table(f"{src}/{n}.parquet") for n in SHIFT_COLS}
    spans = _id_spans(tables)
    ev = _skew_events(_replicate("events", tables["events"], spans))
    pq.write_table(ev, f"{dst}/events.parquet",
                   row_group_size=max(ev.num_rows // 32, 1024))
    hot_n = pc.sum(pc.equal(ev["user_id"],
                            pa.scalar(HOT_USER, pa.int64()))).as_py()
    type_n = pc.sum(pc.equal(ev["event_type"], HOT_TYPE)).as_py()
    print(f"events: {ev.num_rows} rows, hot user={hot_n} "
          f"({100.0 * hot_n / ev.num_rows:.1f}%), hot type={type_n} "
          f"({100.0 * type_n / ev.num_rows:.1f}%)", flush=True)
    docs = _skew_documents(tables["documents"])
    pq.write_table(docs, f"{dst}/documents.parquet",
                   row_group_size=max(docs.num_rows // 32, 1024))
    src_n = pc.sum(pc.equal(docs["source"], HOT_SOURCE)).as_py()
    print(f"documents: {docs.num_rows} rows, hot source={src_n} "
          f"({100.0 * src_n / docs.num_rows:.1f}%)", flush=True)
    for name in list(SHIFT_COLS) + list(COPY_TABLES):
        if name in ("events", "documents"):
            continue
        tab = tables.get(name) or pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tab, f"{dst}/{name}.parquet",
                       row_group_size=max(tab.num_rows // 32, 1024))
        print(f"{name}: copied {tab.num_rows}", flush=True)


if __name__ == "__main__":
    main()
