"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` feature
extractors. (Beyond-reference scope — SURVEY.md §7 phase 4.)

The container has no image/audio codecs, so the *decode* step is a
stub (clearly marked, raises ``NotImplementedError``) with a
deterministic fake extractor behind it; the Spark-side plumbing —
schema, Arrow batch shape, partition-local processing — is real and
tested. At scale this pattern is exactly how you'd run CPU-bound
decode: binary column + metadata struct in parquet, ``mapInPandas``
over size-bounded Arrow batches, no shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HIST_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_hist", ArrayType(IntegerType())),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + metadata struct. Here the
    payload is the UTF-8 text (stand-in for image/audio bytes); in a
    real corpus this column comes straight from parquet."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires PIL/opencv, which this
    container does not ship. The Spark plumbing around it
    (:func:`extract_features`) is real."""
    raise NotImplementedError(
        "image decode requires an image codec library (PIL/opencv); "
        "not available in this environment — use the deterministic "
        "byte-histogram fake extractor instead"
    )


def _fake_features(payload: bytes) -> list[int]:
    """Deterministic stand-in for a decoded-media feature vector:
    a 16-bin byte histogram (vectorized — the batch path must never
    loop per byte in Python)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr % HIST_BINS, minlength=HIST_BINS).astype(int).tolist()


def extract_features(binary_df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Feature extraction over the binary column via ``mapInPandas``:
    one Arrow batch in, one feature frame out, partition-local (no
    shuffle). ``use_real_decode=True`` routes through
    :func:`decode_image` and raises until a codec is installed."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_real_decode:
                feats = [decode_image(p) for p in payloads]
            else:
                feats = [_fake_features(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "byte_hist": feats,
                }
            )

    return binary_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_COUNT = 4

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(binary_df: DataFrame, n_frames: int = FRAME_COUNT) -> DataFrame:
    """Frame sampling over an opaque binary payload — the 1-row-in,
    N-rows-out ``mapInPandas`` shape a video pipeline uses (decode is
    the stubbed step; the sampled "frames" are deterministic equal
    slices of the payload, so the whole path is oracle-checkable).
    Emits ``n_frames`` rows per document: (doc_id, frame_idx,
    frame_bytes, frame_md5). Frames hash via the payload's hex form
    because that representation slices identically in DuckDB (which
    cannot slice blobs directly). Partition-local, no shuffle."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if len(b) < n_frames:
                    continue
                stride = len(b) // n_frames
                hx = b.hex().upper()
                for i in range(n_frames):
                    seg = hx[i * stride * 2 : (i * stride + stride) * 2]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(stride)
                    out["frame_md5"].append(hashlib.md5(seg.encode()).hexdigest())
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return binary_df.mapInPandas(sample, schema=FRAME_SCHEMA)


FRAME_SAMPLE_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes, hex(encode(text)) AS hx
      FROM documents WHERE octet_length(encode(text)) >= {FRAME_COUNT}
    ),
    f AS (
      SELECT doc_id, n_bytes // {FRAME_COUNT} AS stride, hx,
             unnest(generate_series(0, {FRAME_COUNT - 1})) AS frame_idx
      FROM h
    )
    SELECT doc_id, frame_idx, stride AS frame_bytes,
           md5(substring(hx, frame_idx * stride * 2 + 1, stride * 2)) AS frame_md5
    FROM f
"""


def feature_stats(docs: DataFrame) -> DataFrame:
    """End-to-end multimodal pipeline demo: attach payloads, extract
    features, reduce to per-document scalars (rows-only checkable)."""
    feats = extract_features(with_binary_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.expr("array_max(byte_hist)").alias("max_bin"),
        F.expr(
            "array_position(byte_hist, array_max(byte_hist))"
        ).alias("argmax_bin_1based"),
    )


THUMB_TARGET = 64

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("stride", LongType()),
        StructField("thumb_bytes", LongType()),
        StructField("thumb_md5", StringType()),
    ]
)


def resize_payload(binary_df: DataFrame, target_bytes: int = THUMB_TARGET) -> DataFrame:
    """Resize/thumbnail plumbing over the opaque payload: a strided
    byte downsample to ~``target_bytes`` (every ``stride``-th byte) —
    the deterministic stand-in for an image resize (no codec in this
    container; a real pipeline swaps the stride slice for
    PIL.thumbnail inside the same batch loop). The Spark shape is the
    real thing: Arrow-batched ``mapInPandas``, vectorized numpy
    striding, partition-local, no shuffle. ``thumb_md5`` pins the
    thumbnail CONTENT byte-for-byte, but as md5 of the UPPERCASE-HEX
    ENCODING of the strided bytes, not of the raw bytes themselves —
    this build of DuckDB only has md5(VARCHAR), so the hex string is
    the shared representation both engines can hash identically. (It
    is equally collision-sensitive to any byte change; it just isn't
    comparable to an external ``md5sum`` of the payload.)"""
    import hashlib

    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "stride": [],
                   "thumb_bytes": [], "thumb_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = arr.size
                if n == 0:
                    continue
                stride = max(n // target_bytes, 1)
                thumb = arr[::stride]
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(n)
                out["stride"].append(stride)
                out["thumb_bytes"].append(int(thumb.size))
                out["thumb_md5"].append(
                    hashlib.md5(thumb.tobytes().hex().upper().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


RESIZE_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             hex(encode(text)) AS hx
      FROM documents WHERE octet_length(encode(text)) >= 1
    ),
    p AS (
      SELECT doc_id, n_bytes, greatest(n_bytes // {THUMB_TARGET}, 1) AS stride, hx
      FROM h
    ),
    idx AS (
      SELECT doc_id, n_bytes, stride, hx,
             unnest(generate_series(0, (n_bytes - 1) // stride)) AS i
      FROM p
    )
    SELECT doc_id, n_bytes, CAST(stride AS BIGINT) AS stride,
           count(*) AS thumb_bytes,
           md5(string_agg(substring(hx, i * stride * 2 + 1, 2), '' ORDER BY i))
             AS thumb_md5
    FROM idx GROUP BY doc_id, n_bytes, stride
"""
