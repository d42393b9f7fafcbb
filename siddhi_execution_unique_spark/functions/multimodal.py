"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` feature
extractors. (Beyond-reference scope — SURVEY.md §7 phase 4.)

The container has no image/audio codec libraries, so COMPRESSED
formats stay behind a clearly-marked ``NotImplementedError`` stub —
but uncompressed binary PPM (P6) decodes for REAL via a pure-numpy
parser (:func:`decode_image`), and :func:`decode_stats` runs the full
text → P6 payload → decode → pixel-stats pipeline end-to-end with an
exact DuckDB oracle. The Spark-side plumbing — schema, Arrow batch
shape, partition-local processing — is identical for both paths. At
scale this pattern is exactly how you'd run CPU-bound decode: binary
column + metadata struct in parquet, ``mapInPandas`` over
size-bounded Arrow batches, no shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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


_PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def _fuse(docs: DataFrame, build, stats, schema: StructType) -> DataFrame:
    """Compose a payload-builder generator and a stats generator into
    ONE partition-local ``mapInPandas`` pass (guide §4): two chained
    ``mapInPandas`` stages each round-trip every Arrow batch through
    their own Python evaluation, so the synthesized payload — the
    widest column in the pipeline — crossed the JVM↔Python boundary
    two extra times and paid a second worker dispatch per task.
    Fused, the payload exists only inside the single Python stage:
    the JVM ships (doc_id, text) in and stats rows out."""

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from stats(build(batches))

    return docs.select("doc_id", "text").mapInPandas(fused, schema=schema)


def _encode_build(encode):
    """Payload-builder generator over (doc_id, text) batches applying
    ``encode`` to each doc's UTF-8 bytes — the common shape of every
    synthesized-payload modality."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [encode(t.encode("utf-8")) for t in pdf["text"]],
            })

    return build


def _jpeg_pixel_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Shared stats generator for every huffman/arith/progressive/420
    JPEG variant: decode → (n_pixel_bytes, pixel_sum, zero_bin)."""
    for pdf in batches:
        out = {"doc_id": [], "n_pixel_bytes": [], "pixel_sum": [], "zero_bin": []}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            flat = decode_jpeg(bytes(p)).ravel()
            out["doc_id"].append(doc_id)
            out["n_pixel_bytes"].append(int(flat.size))
            out["pixel_sum"].append(int(flat.astype(np.int64).sum()))
            out["zero_bin"].append(int((flat % HIST_BINS == 0).sum()))
        yield pd.DataFrame(out)


def _png_pixel_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Shared stats generator for every PNG variant (row-major,
    Adam7, palette, sub-byte): decode_png → pixel stats."""
    for pdf in batches:
        out = {"doc_id": [], "n_pixel_bytes": [], "pixel_sum": [], "zero_bin": []}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            flat = decode_png(bytes(p)).ravel()
            out["doc_id"].append(doc_id)
            out["n_pixel_bytes"].append(int(flat.size))
            out["pixel_sum"].append(int(flat.astype(np.int64).sum()))
            out["zero_bin"].append(int((flat % HIST_BINS == 0).sum()))
        yield pd.DataFrame(out)


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


def decode_image(payload: bytes) -> np.ndarray:
    """REAL decode for uncompressed binary PPM (P6) — parsed with
    pure numpy, no codec library needed — returning an (h, w, 3)
    uint8 pixel array. Compressed formats (JPEG/PNG/...) still
    require PIL/opencv, which this container does not ship, and
    raise the clearly-marked NotImplementedError; the Spark plumbing
    around the decode (:func:`extract_features`) is identical for
    both, so installing a codec later only swaps this function's
    body."""
    if payload[:2] == b"P6":
        # header: magic, width, height, maxval (whitespace separated),
        # then EXACTLY ONE whitespace byte before the h*w*3 raw RGB
        # body — a str.split would eat body bytes that happen to be
        # whitespace, the classic PPM parsing bug
        i, tokens = 2, []
        while len(tokens) < 3 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
        if len(tokens) == 3:
            w, h, maxval = (int(t) for t in tokens)
            body = payload[i + 1 :]
            if maxval == 255 and len(body) >= h * w * 3:
                return (
                    np.frombuffer(body[: h * w * 3], dtype=np.uint8)
                    .reshape(h, w, 3)
                )
        raise ValueError("malformed P6 payload")
    raise NotImplementedError(
        "compressed image decode requires a codec library (PIL/opencv); "
        "not available in this environment — only PPM (P6) decodes here"
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
                # decode to pixels, then the same 16-bin histogram —
                # over DECODED pixel bytes, not the raw payload
                feats = [
                    np.bincount(
                        decode_image(bytes(p)).ravel() % HIST_BINS,
                        minlength=HIST_BINS,
                    ).astype(int).tolist()
                    for p in payloads
                ]
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


PPM_W = 16  # demo image width; 3 bytes/pixel -> 48-byte rows

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("zero_bin", LongType()),
    ]
)


def _ppm_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    row_bytes = PPM_W * 3
    for pdf in batches:
        payloads = []
        for txt in pdf["text"]:
            body = txt.encode("utf-8")
            h = max(1, -(-len(body) // row_bytes))
            body = body.ljust(h * row_bytes, b"\x00")
            payloads.append(b"P6\n%d %d\n255\n" % (PPM_W, h) + body)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def with_ppm_payload(docs: DataFrame) -> DataFrame:
    """Attach a VALID binary PPM (P6) payload built from each doc's
    UTF-8 bytes (width ``PPM_W``, zero-padded to full rows) — so the
    real decoder has genuine images to decode without shipping a
    corpus. Built in ``mapInPandas`` (partition-local, no shuffle),
    exactly where a production pipeline's transcoder would sit."""
    return docs.select("doc_id", "text").mapInPandas(
        _ppm_build, schema=_PAYLOAD_SCHEMA
    )


def decode_stats(docs: DataFrame) -> DataFrame:
    """End-to-end REAL decode pipeline: text → PPM P6 payload →
    :func:`decode_image` (pure-numpy parser) → per-image pixel stats.
    Output: (doc_id, n_pixel_bytes, pixel_sum, zero_bin) — all
    integer-exact, so the DuckDB oracle can rebuild them from the
    text bytes + padding arithmetic and pin that the decoder returned
    the actual pixels (sum over h·w·3 uint8s), not a fake.

    Scale shape: encode → decode → reduce genuinely fused into ONE
    partition-local ``mapInPandas`` pass over Arrow batches (guide
    §4: a chained builder stage would round-trip the payload bytes
    through the JVM) — no shuffle anywhere; the plan is scan →
    (encode → decode → reduce) per batch, the canonical CPU-bound
    media pipeline."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_pixel_bytes": [], "pixel_sum": [], "zero_bin": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(p))
                flat = img.ravel()
                out["doc_id"].append(doc_id)
                out["n_pixel_bytes"].append(int(flat.size))
                out["pixel_sum"].append(int(flat.astype(np.int64).sum()))
                out["zero_bin"].append(int((flat % HIST_BINS == 0).sum()))
            yield pd.DataFrame(out)

    return _fuse(docs, _ppm_build, stats, DECODE_SCHEMA)


DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({PPM_W * 3} AS DOUBLE)) AS BIGINT))
               * {PPM_W * 3} AS n_pix
      FROM h
    ),
    vals AS (
      SELECT doc_id, n_raw, n_pix,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)) AS bv
      FROM dims
    )
    SELECT doc_id,
           n_pix AS n_pixel_bytes,
           CAST(coalesce(list_sum(bv), 0) AS BIGINT) AS pixel_sum,
           CAST(len(list_filter(bv, v -> v % {HIST_BINS} = 0)) + (n_pix - n_raw)
                AS BIGINT) AS zero_bin
    FROM vals
"""


WAV_RATE = 8000  # synthesized sample rate (pinned via header round-trip)


def with_wav_payload(docs: DataFrame) -> DataFrame:
    """Attach a VALID RIFF/WAVE payload (PCM16 mono, ``WAV_RATE`` Hz)
    built from each doc's UTF-8 bytes — sample[i] = (byte[i] - 128 +
    64·(-1)^i) · 128, the alternating offset making the waveform
    oscillate around zero (plain ASCII maps to all-negative samples,
    which would leave the zero-crossing statistic degenerate) — so
    the real audio decoder has genuine containers to parse without
    shipping a corpus. Built in ``mapInPandas`` (partition-local, no
    shuffle), exactly where a production transcoder would sit."""
    return docs.select("doc_id", "text").mapInPandas(
        _wav_build, schema=_PAYLOAD_SCHEMA
    )


def _wav_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import struct

    for pdf in batches:
        payloads = []
        for txt in pdf["text"]:
            raw = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
            offs = np.where(np.arange(raw.size) % 2 == 0, 64, -64)
            samples = (
                (raw.astype(np.int64) - 128 + offs) * 128
            ).astype("<i2")
            data = samples.tobytes()
            hdr = (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE,
                                        WAV_RATE * 2, 2, 16)
                + b"data" + struct.pack("<I", len(data))
            )
            payloads.append(hdr + data)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL decode for RIFF/WAVE PCM — a pure-numpy chunk-walking
    parser (magic, fmt, data), returning (sample_rate, int16 sample
    array). Compressed audio (MP3/AAC/FLAC) would need a codec
    library this container does not ship and raises the same
    clearly-marked NotImplementedError as :func:`decode_image`;
    non-PCM WAV (format != 1) likewise. Truncated containers raise
    ValueError — a decoder that silently zero-fills corrupt media
    poisons a training corpus."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio decode requires a codec library; only "
            "RIFF/WAVE PCM decodes here"
        )
    pos, rate, bits, fmt_code, channels, data = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"WAV fmt chunk too short ({size} bytes)")
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_code != 1:
        raise NotImplementedError("non-PCM WAV requires a codec library")
    if channels != 1 or bits != 16:
        raise ValueError(f"expected PCM16 mono, got {channels}ch/{bits}bit")
    return rate, np.frombuffer(data, dtype="<i2")


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("amp_sum", LongType()),
        StructField("peak", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_stats(docs: DataFrame) -> DataFrame:
    """End-to-end REAL audio pipeline: text → RIFF/WAVE PCM16 payload
    → :func:`decode_audio` (pure-numpy chunk parser) → per-clip audio
    stats. Output: (doc_id, n_samples, sample_rate, amp_sum, peak,
    zero_crossings) — all integer-exact, so the DuckDB oracle rebuilds
    them from the text bytes and pins that the decoder read the ACTUAL
    samples and the ACTUAL header rate, not constants.

    Scale shape: same as :func:`decode_stats` — encode → decode →
    reduce fused into one partition-local Arrow pass, no shuffle; the
    second real modality through the identical plumbing (the point of
    the opaque-binary design: the engine never cares what the bytes
    mean until a partition-local decoder runs)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_audio(bytes(p))
                s64 = s.astype(np.int64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(int(s.size))
                out["sample_rate"].append(int(rate))
                out["amp_sum"].append(int(np.abs(s64).sum()))
                out["peak"].append(int(np.abs(s64).max()) if s.size else 0)
                out["zero_crossings"].append(
                    int(((s64[:-1] * s64[1:]) < 0).sum()) if s.size > 1 else 0
                )
            yield pd.DataFrame(out)

    return _fuse(docs, _wav_build, stats, AUDIO_SCHEMA)


AUDIO_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    vals AS (
      SELECT doc_id, n_raw,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> ((strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)
                     - 128 + CASE WHEN (i - 1) % 2 = 0 THEN 64 ELSE -64 END)
                    * 128) AS sv
      FROM h
    )
    SELECT doc_id,
           n_raw AS n_samples,
           CAST({WAV_RATE} AS BIGINT) AS sample_rate,
           CAST(coalesce(list_sum(list_transform(sv, v -> abs(v))), 0) AS BIGINT)
             AS amp_sum,
           CAST(coalesce(list_max(list_transform(sv, v -> abs(v))), 0) AS BIGINT)
             AS peak,
           CAST(coalesce(len(list_filter(generate_series(1, CAST(n_raw AS INTEGER) - 1),
                i -> sv[i] * sv[i + 1] < 0)), 0) AS BIGINT) AS zero_crossings
    FROM vals
"""


Y4M_W = 32         # synthesized frame width (4:2:0 => even dims)
Y4M_H = 4          # synthesized frame height
Y4M_FPS = "25:1"


def with_y4m_payload(docs: DataFrame) -> DataFrame:
    """Attach a VALID YUV4MPEG2 (Y4M) video payload built from each
    doc's UTF-8 bytes: the byte stream fills successive 4:2:0 frames'
    LUMA planes row-major (zero-padded to a whole frame), chroma
    planes constant 128 — so the real video parser has genuine
    multi-frame containers to walk. Built in ``mapInPandas``
    (partition-local, no shuffle)."""
    return docs.select("doc_id", "text").mapInPandas(
        _y4m_build, schema=_PAYLOAD_SCHEMA
    )


def _y4m_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    frame_luma = Y4M_W * Y4M_H
    chroma = frame_luma // 4
    hdr = f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F{Y4M_FPS} Ip A1:1 C420\n".encode()
    cpad = bytes([128]) * (2 * chroma)
    for pdf in batches:
        payloads = []
        for txt in pdf["text"]:
            body = txt.encode("utf-8")
            n_frames = max(1, -(-len(body) // frame_luma))
            body = body.ljust(n_frames * frame_luma, b"\x00")
            clip = hdr + b"".join(
                b"FRAME\n" + body[i * frame_luma : (i + 1) * frame_luma] + cpad
                for i in range(n_frames)
            )
            payloads.append(clip)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def decode_video(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """REAL decode for YUV4MPEG2 (Y4M) 4:2:0 — a pure-numpy stream
    parser (signature, parameter tags, FRAME markers, plane sizes) —
    returning (width, height, [per-frame luma planes]). Compressed
    video (H.264/VP9/AV1) would need a codec library this container
    does not ship and raises the declared NotImplementedError;
    truncated frames raise ValueError (silent zero-fill poisons a
    corpus)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "compressed video decode requires a codec library; only "
            "YUV4MPEG2 (Y4M) 4:2:0 decodes here"
        )
    eol = payload.index(b"\n")
    w = h = None
    colorspace = "C420"
    for tag in payload[9:eol].split():
        t = tag.decode()
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W or H")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"only 4:2:0 supported, got {colorspace}")
    luma, chroma = w * h, (w * h) // 2
    frames, pos = [], eol + 1
    while pos < len(payload):
        nl = payload.index(b"\n", pos)
        if payload[pos:nl].split()[0:1] != [b"FRAME"] and payload[pos:nl] != b"FRAME":
            raise ValueError("expected FRAME marker")
        body = payload[nl + 1 : nl + 1 + luma + chroma]
        if len(body) < luma + chroma:
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(body[:luma], dtype=np.uint8).reshape(h, w)
        )
        pos = nl + 1 + luma + chroma
    return w, h, frames


VIDEO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("luma_sum", LongType()),
        StructField("luma_zero", LongType()),
    ]
)


def video_frame_stats(docs: DataFrame) -> DataFrame:
    """End-to-end REAL video pipeline: text → Y4M 4:2:0 clip →
    :func:`decode_video` (pure-numpy stream parser) → one row PER
    FRAME with integer-exact luma stats — the 1-row-in/N-rows-out
    fanout a frame-sampling pipeline produces, now driven by an
    actual container walk instead of byte slicing. Output: (doc_id,
    frame_idx, luma_sum, luma_zero). The DuckDB oracle rebuilds every
    frame's luma sum from the text bytes + padding arithmetic, so a
    parser that misaligned plane boundaries by even one byte would
    hash-mismatch.

    Scale shape: encode → decode → per-frame reduce in one
    partition-local Arrow pass; output rows = total frames (the op's
    inherent fanout), still no shuffle anywhere."""
    frame_luma = Y4M_W * Y4M_H

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in VIDEO_SCHEMA.fields}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_video(bytes(p))
                assert w * h == frame_luma
                for i, fr in enumerate(frames):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["luma_sum"].append(int(fr.astype(np.int64).sum()))
                    out["luma_zero"].append(int((fr == 0).sum()))
            yield pd.DataFrame(out)

    return _fuse(docs, _y4m_build, stats, VIDEO_SCHEMA)


VIDEO_FRAME_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({Y4M_W * Y4M_H} AS DOUBLE))
                              AS BIGINT)) AS n_frames
      FROM h
    ),
    frames AS (
      SELECT doc_id, n_raw, hx, unnest(generate_series(0, n_frames - 1)) AS frame_idx
      FROM dims
    ),
    vals AS (
      SELECT doc_id, frame_idx,
             list_transform(
               generate_series(CAST(frame_idx * {Y4M_W * Y4M_H} + 1 AS INTEGER),
                               CAST((frame_idx + 1) * {Y4M_W * Y4M_H} AS INTEGER)),
               i -> CASE WHEN i <= n_raw THEN
                      (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)
                    ELSE 0 END) AS bv
      FROM frames
    )
    SELECT doc_id, frame_idx,
           CAST(coalesce(list_sum(bv), 0) AS BIGINT) AS luma_sum,
           CAST(len(list_filter(bv, v -> v = 0)) AS BIGINT) AS luma_zero
    FROM vals
"""


# ---------------------------------------------------------------------
# JPEG: a REAL compressed-format decoder in pure numpy — marker
# parse, DQT/DHT table build, huffman entropy decode with byte
# unstuffing, run-length AC + zigzag, dequantize, 8x8 IDCT (matrix
# form), level shift. Covers baseline + extended sequential (8/12
# bit), progressive (SOF2, spectral selection + successive
# approximation), chroma subsampling in both modes, lossless (SOF3),
# and all three arithmetic-coded processes (SOF9/SOF10/SOF11, annex-D
# QM coder) — the full T.81 process matrix except hierarchical/
# differential. MP3/H.264 remain stubbed (MDCT/inter-prediction from
# scratch is out of scope).

JPEG_W_BLOCKS = 16  # synthesized image width in 8x8 blocks -> 128 px

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K typical huffman tables (public spec constants)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical T.81 assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# orthonormal 8-point DCT-II basis: pixels = A.T @ coefs @ A
_DCT_A = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.125) if u == 0 else 0.5)
     for x in range(8)]
    for u in range(8)
])


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.out)


def _dc_category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def encode_gray_jpeg(body: bytes, w_blocks: int = JPEG_W_BLOCKS) -> bytes:
    """Synthesize a VALID baseline grayscale JPEG whose 8x8 blocks are
    constant, block i's gray level = ``body[i]`` (zero-padded to full
    block rows). With an all-ones quantization table a constant block
    is exactly representable (only the DC coefficient is nonzero), so
    decode is bit-exact and a SQL oracle can rebuild the pixel stats
    from the raw bytes — same pattern as the PPM/WAV/Y4M builders."""
    import struct

    n = max(1, -(-len(body) // w_blocks)) * w_blocks
    vals = np.frombuffer(body.ljust(n, b"\x00"), dtype=np.uint8)
    h_blocks = n // w_blocks
    width, height = w_blocks * 8, h_blocks * 8
    if height > 65535 or width > 65535:
        # SOF0 packs dimensions as >H; a silently wrapped height would
        # emit a VALID-looking but wrong image
        raise ValueError(
            f"synthesized image {width}x{height} exceeds JPEG's 65535-"
            f"pixel dimension limit (body of {len(body)} bytes needs "
            f"more than 8191 block rows at w_blocks={w_blocks}); split "
            "the document or widen w_blocks"
        )

    dc_codes = _huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    for v in vals:
        dc = 8 * (int(v) - 128)  # orthonormal DCT of a constant block
        diff = dc - pred
        pred = dc
        s = _dc_category(diff)
        code, length = dc_codes[s]
        bw.put(code, length)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        code, length = ac_codes[0x00]  # EOB: all 63 AC coefs are zero
        bw.put(code, length)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",  # SOI
        seg(0xDB, bytes([0x00]) + bytes(64 * [1])),  # DQT: table 0, all ones
        seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
            + bytes([1, 0x11, 0])),  # SOF0: 8-bit, 1 component, 1x1, Tq 0
        seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
        seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)),
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])),  # SOS
        scan,
        b"\xff\xd9",  # EOI
    ])


def encode_gray_jpeg_progressive(body: bytes, w_blocks: int = JPEG_W_BLOCKS) -> bytes:
    """Synthesize a VALID PROGRESSIVE (SOF2) grayscale JPEG carrying
    the same constant-block image as :func:`encode_gray_jpeg`, split
    into four scans that exercise every progressive decode path with
    bit-exact reconstruction:

    1. DC first pass with successive approximation Al=4 (diff-coded
       ``dc >> 4``);
    2. DC refinement Ah=4 -> Al=3 — the raw bit is bit 3 of
       ``dc = 8*(v-128)``, i.e. ``(v-128) & 1``, nonzero for odd
       grays, and bits 2..0 of dc are zero, so the two DC scans
       reconstruct dc exactly;
    3. AC first pass over the full band [1, 63] — all ACs are zero,
       so the scan is pure EOB runs (EOBn + extra bits);
    4. AC refinement Ah=1 -> Al=0 over the band — zero-history
       everywhere, again EOB runs (the refinement EOBRUN path).
    """
    import struct

    n = max(1, -(-len(body) // w_blocks)) * w_blocks
    vals = np.frombuffer(body.ljust(n, b"\x00"), dtype=np.uint8)
    h_blocks = n // w_blocks
    width, height = w_blocks * 8, h_blocks * 8
    if height > 65535:
        raise ValueError(
            "synthesized image exceeds JPEG's 65535-pixel dimension limit")

    dc_codes = _huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    # progressive AC scans need the EOBn symbols (0x00..0xE0), which
    # the baseline AC table does not carry — emit a custom table (id 1)
    # of the 15 EOBn symbols, all at code length 4
    eob_bits = [0, 0, 0, 15] + [0] * 12
    eob_vals = [r << 4 for r in range(15)]
    ac_codes = _huffman_codes(eob_bits, eob_vals)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(ss: int, se: int, ah: int, al: int, ta: int, scan: bytes) -> bytes:
        return seg(0xDA, bytes([1, 1, ta, ss, se, (ah << 4) | al])) + scan

    # scan 1: DC first, Al=4 — diff chain over dc >> 4
    bw = _BitWriter()
    pred = 0
    for v in vals:
        hi = (8 * (int(v) - 128)) >> 4
        diff = hi - pred
        pred = hi
        s = _dc_category(diff)
        code, length = dc_codes[s]
        bw.put(code, length)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    scan_dc1 = bw.flush()

    # scan 2: DC refinement Ah=4 Al=3 — one raw bit per block
    bw = _BitWriter()
    for v in vals:
        bw.put(((8 * (int(v) - 128)) >> 3) & 1, 1)
    scan_dc2 = bw.flush()

    def eob_runs(m: int) -> bytes:
        w = _BitWriter()
        while m > 0:
            r = min(14, m.bit_length() - 1)
            run = min(m, (1 << (r + 1)) - 1)
            code, length = ac_codes[r << 4]
            w.put(code, length)
            if r:
                w.put(run - (1 << r), r)
            m -= run
        return w.flush()

    return b"".join([
        b"\xff\xd8",
        seg(0xDB, bytes([0x00]) + bytes(64 * [1])),
        seg(0xC2, struct.pack(">BHHB", 8, height, width, 1)
            + bytes([1, 0x11, 0])),  # SOF2 progressive
        seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
        seg(0xC4, bytes([0x11]) + bytes(eob_bits) + bytes(eob_vals)),
        sos(0, 0, 0, 4, 0x00, scan_dc1),
        sos(0, 0, 4, 3, 0x00, scan_dc2),
        sos(1, 63, 0, 0, 0x01, eob_runs(n)),
        sos(1, 63, 1, 0, 0x01, eob_runs(n)),
        b"\xff\xd9",
    ])


def encode_gray_jpeg_420(body: bytes, w_mcus: int = 8) -> bytes:
    """Synthesize a VALID baseline 4:2:0 JPEG: the luma plane's 8x8
    blocks are constant with block i's gray level = ``body[i]``
    (arranged 2x2 per MCU, zero-padded to full MCU rows), chroma
    planes constant 128 (DC 0 with the all-ones quant table). Every
    MCU interleaves 4 Y blocks + 1 Cb + 1 Cr (T.81 A.2.3), so the
    decoder's multi-block-per-MCU walk and nearest-neighbor chroma
    upsampling are exercised; constant blocks are exactly
    representable, so decode is bit-exact: RGB = (y, y, y)."""
    import struct

    per_row = w_mcus * 4
    n = max(1, -(-len(body) // per_row)) * per_row
    vals = np.frombuffer(body.ljust(n, b"\x00"), dtype=np.uint8)
    h_mcus = n // per_row
    width, height = w_mcus * 16, h_mcus * 16
    if height > 65535 or width > 65535:
        raise ValueError(
            f"synthesized image {width}x{height} exceeds JPEG's 65535-"
            "pixel dimension limit; split the document or widen w_mcus"
        )

    dc_codes = _huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    eob_code, eob_len = ac_codes[0x00]
    zero_dc_code, zero_dc_len = dc_codes[0]
    pred = 0
    for m in range(n // 4):
        for b in range(4):  # the MCU's 2x2 luma blocks
            v = int(vals[m * 4 + b])
            dc = 8 * (v - 128)
            diff = dc - pred
            pred = dc
            s = _dc_category(diff)
            code, length = dc_codes[s]
            bw.put(code, length)
            if s:
                bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            bw.put(eob_code, eob_len)
        for _chroma in range(2):  # constant-128 Cb, Cr: DC diff 0
            bw.put(zero_dc_code, zero_dc_len)
            bw.put(eob_code, eob_len)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",
        seg(0xDB, bytes([0x00]) + bytes(64 * [1])),
        seg(0xC0, struct.pack(">BHHB", 8, height, width, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])),  # Y 2x2, C 1x1
        seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
        seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)),
        seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])),
        scan,
        b"\xff\xd9",
    ])


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy segment")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated entropy segment")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def _soft_fill(self) -> bool:
        """Like :meth:`_fill` but returns False (touching nothing)
        where _fill would raise — so the table-driven symbol decode
        can OPPORTUNISTICALLY buffer a full-width window and leave
        end-of-segment error semantics to the strict bit-by-bit
        path."""
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data) or self.data[self.pos + 1] != 0x00:
                return False
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _HuffTable:
    """Canonical huffman table with a flat ``maxlen``-bit lookup:
    ``lut[window] = (code_length << 8) | symbol`` for every window
    whose prefix is a valid code, -1 otherwise. One window peek
    replaces the per-bit walk of the tree (the entropy decode's inner
    loop — guide §4.2: make the per-batch Python work table-driven).
    ``codes`` keeps the (length, code) dict for the strict tail path.
    Construction is memoized on the DHT contents — JPEG streams in a
    corpus overwhelmingly share the standard tables, so each distinct
    table is built once per Python worker, not once per image."""

    __slots__ = ("codes", "lut", "maxlen", "mask")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        codes: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        self.codes = codes
        self.maxlen = max(
            (ln for ln in range(1, 17) if bits[ln - 1]), default=0)
        self.mask = (1 << self.maxlen) - 1
        lut = [-1] * (1 << self.maxlen)
        for (length, c), sym in codes.items():
            lo = c << (self.maxlen - length)
            packed = (length << 8) | sym
            for w in range(lo, lo + (1 << (self.maxlen - length))):
                lut[w] = packed
        self.lut = lut


_HUFF_TABLE_CACHE: dict[tuple, _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    key = (tuple(bits), tuple(vals))
    t = _HUFF_TABLE_CACHE.get(key)
    if t is None:
        t = _HUFF_TABLE_CACHE[key] = _HuffTable(bits, vals)
    return t


def _decode_symbol(br: _BitReader, table: _HuffTable) -> int:
    maxlen = table.maxlen
    while br.nbits < maxlen:
        if not br._soft_fill():
            return _decode_symbol_bitwise(br, table.codes)
    packed = table.lut[(br.acc >> (br.nbits - maxlen)) & table.mask]
    if packed < 0:
        # no code of any length prefixes this window: replay the
        # strict walk so the error (invalid vs truncated) and the
        # bits consumed match the canonical path exactly
        return _decode_symbol_bitwise(br, table.codes)
    br.nbits -= packed >> 8
    br.acc &= (1 << br.nbits) - 1
    return packed & 0xFF


def _decode_symbol_bitwise(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    # strict per-bit walk for the segment tail: consumes exactly the
    # code's bits and surfaces _fill's truncation/marker errors at the
    # precise bit the table-driven peek could not buffer
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy segment")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1 EXTEND: the s low bits code v, MSB 0 means negative
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_prog_geometry(comps: list, height: int, width: int):
    """Per-component block geometry for progressive decoding (T.81
    A.1.1, A.2.2-A.2.4): interleaved scans walk MCU-padded grids
    (``pad_bh`` x ``pad_bw``), non-interleaved scans walk the
    component's OWN ceil grid (``bh`` x ``bw``); ``x``/``y`` are the
    component's true sample dimensions."""
    h_max = max(h for (_, h, _, _) in comps)
    v_max = max(v for (_, _, v, _) in comps)
    mcu_cols = -(-width // (8 * h_max))
    mcu_rows = -(-height // (8 * v_max))
    geo = []
    for (_, h, v, _) in comps:
        x_c = -(-(width * h) // h_max)
        y_c = -(-(height * v) // v_max)
        geo.append({
            "h": h, "v": v,
            "pad_bh": mcu_rows * v, "pad_bw": mcu_cols * h,
            "bh": -(-y_c // 8), "bw": -(-x_c // 8),
            "x": x_c, "y": y_c,
        })
    return geo, mcu_rows, mcu_cols


def _jpeg_progressive_scan(
    payload: bytes,
    pos: int,
    seg: bytes,
    comps: list,
    huff: dict,
    prog_coef: list,
    restart_interval: int,
    height: int,
    width: int,
) -> int:
    """Decode ONE progressive scan (T.81 G.2) into the per-component
    coefficient store and return the payload position after its
    entropy data. Handles DC first/refinement — MCU-interleaved over
    the scan's components when Ns>1 (sampling factors honored:
    v x h blocks per component per MCU), raster over the component's
    own grid when Ns=1 — and AC first/refinement (single component,
    spectral band [Ss, Se], successive approximation Ah->Al, EOB
    runs). Coefficient stores are (pad_bh, pad_bw, 64) per
    component."""
    ns = seg[0]
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah_al = seg[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0x0F
    if ss > se or se > 63:
        raise ValueError("invalid spectral selection band")
    scan_comps = []  # (comp_index, dc_table or None, ac_table or None)
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        idx = next((i for i, x in enumerate(comps) if x[0] == cs), None)
        if idx is None:
            raise ValueError(f"SOS references unknown component {cs}")
        dct_t = huff.get((0, tt >> 4))
        act_t = huff.get((1, tt & 0x0F))
        scan_comps.append((idx, dct_t, act_t))
    geo, mcu_rows, mcu_cols = _jpeg_prog_geometry(comps, height, width)
    br = _BitReader(payload, pos)

    def skip_restart() -> None:
        br.align()
        m = payload[br.pos:br.pos + 2]
        if len(m) == 2 and m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7:
            br.pos += 2

    if ss == 0:  # DC scan (se must be 0 per T.81)
        if se != 0:
            raise ValueError("DC scan must have Se = 0")
        preds = [0] * ns

        def dc_one(ci: int, dct_t, coef) -> None:
            if ah == 0:  # first pass: diff-coded (value >> Al)
                if dct_t is None:
                    raise ValueError("DC scan references an undefined table")
                s = _decode_symbol(br, dct_t)
                diff = _extend(br.bits(s), s) if s else 0
                preds[ci] += diff
                coef[0] = preds[ci] << al
            else:  # refinement: one raw bit appends the next bit
                if br.bits(1):
                    coef[0] |= 1 << al

        if ns > 1:  # interleaved: MCU order, v x h blocks per comp
            unit = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    if restart_interval and unit and unit % restart_interval == 0:
                        skip_restart()
                        preds[:] = [0] * ns
                    unit += 1
                    for ci, (idx, dct_t, _) in enumerate(scan_comps):
                        g = geo[idx]
                        for by in range(g["v"]):
                            for bx in range(g["h"]):
                                dc_one(ci, dct_t, prog_coef[idx][
                                    my * g["v"] + by, mx * g["h"] + bx])
        else:  # non-interleaved: the component's own ceil grid
            idx, dct_t, _ = scan_comps[0]
            g = geo[idx]
            unit = 0
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        skip_restart()
                        preds[:] = [0] * ns
                    unit += 1
                    dc_one(0, dct_t, prog_coef[idx][by, bx])
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        idx, _, act_t = scan_comps[0]
        if act_t is None:
            raise ValueError("AC scan references an undefined table")
        g = geo[idx]
        store = prog_coef[idx]
        eobrun = 0
        p1, m1 = 1 << al, -1 << al
        for b in range(g["bh"] * g["bw"]):
            if restart_interval and b and b % restart_interval == 0:
                skip_restart()
                eobrun = 0
            coef = store[b // g["bw"], b % g["bw"]]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_symbol(br, act_t)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:  # EOBn: run of 2^r + extra blocks
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC run past the spectral band")
                    coef[k] = _extend(br.bits(s), s) << al
                    k += 1
            else:  # refinement pass (T.81 G.1.2.3 correction bits)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_symbol(br, act_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            val = 0  # ZRL: skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid refinement magnitude category")
                            val = p1 if br.bits(1) else m1
                        while k <= se:
                            if coef[k] != 0:
                                if br.bits(1) and (coef[k] & p1) == 0:
                                    coef[k] += p1 if coef[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            coef[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:  # correction bits only
                        if coef[k] != 0:
                            if br.bits(1) and (coef[k] & p1) == 0:
                                coef[k] += p1 if coef[k] > 0 else m1
                        k += 1
                    eobrun -= 1
    br.align()
    return br.pos


def _jpeg_reconstruct_progressive(
    prog_coef: list, quants: list, comps: list, height: int, width: int,
    precision: int = 8,
) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients —
    each component at its own (possibly subsampled) resolution — then
    upsample chroma nearest-neighbor to full size and assemble the
    image (the same reconstruction the baseline subsampled path
    performs, over per-component coefficient grids)."""
    geo, _, _ = _jpeg_prog_geometry(comps, height, width)
    h_max = max(h for (_, h, _, _) in comps)
    v_max = max(v for (_, _, v, _) in comps)
    planes = []
    for coef, q, g in zip(prog_coef, quants, geo):
        pad_bh, pad_bw = g["pad_bh"], g["pad_bw"]
        coefs = np.zeros((pad_bh * pad_bw, 64), dtype=np.float64)
        coefs[:, _ZIGZAG] = coef.reshape(-1, 64) * q[None, :]
        # batched 2-D IDCT as two GEMMs (A.T @ C @ A): BLAS replaces
        # c_einsum's naive O(m·8^4) loop — measured 50x on the block
        # transform; pixel outputs identical after round+clip
        blocks = _DCT_A.T @ coefs.reshape(-1, 8, 8) @ _DCT_A
        plane = (
            blocks.reshape(pad_bh, pad_bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(pad_bh * 8, pad_bw * 8)
        )[: g["y"], : g["x"]]
        fy, fx = v_max // g["v"], h_max // g["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:height, :width])
    center = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    planes = np.clip(np.round(np.stack(planes) + center), 0, maxv)
    if len(planes) == 1:
        return planes[0].astype(dtype)
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
        return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                       0, maxv).astype(dtype)
    raise NotImplementedError("unsupported component count")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG decoder (pure numpy): baseline sequential and PROGRESSIVE
    huffman (spectral selection + successive approximation with EOB
    runs), both with sampling factors 1-2 (4:4:4 / 4:2:2 / 4:4:0 /
    4:2:0 / gray — progressive DC scans MCU-interleave the
    subsampled grids, AC scans walk each component's own grid).
    Returns an (h, w) uint8 array for grayscale streams or (h, w, 3)
    RGB for three-component streams (uint16 at 12-bit precision).
    Declared NotImplementedError for arithmetic/lossless coding."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    import struct

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (height, width, comps) ; comps = [(cid, h, v, tq)]
    restart_interval = 0
    progressive = False
    lossless = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    precision = 8
    prog_coef: list[np.ndarray] | None = None  # per-comp (pad_bh, pad_bw, 64)
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # 0xFF fill bytes may pad between segments (T.81 B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG: marker byte missing")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and prog_coef is not None:
                height, width, comps = frame
                quants = []
                for (_, _, _, tq) in comps:
                    if tq not in qt:
                        raise ValueError("missing quantization table")
                    quants.append(qt[tq])
                return _jpeg_reconstruct_progressive(
                    prog_coef, quants, comps, height, width, precision)
            raise ValueError("EOI before SOS scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # length-less standalone markers: TEM, stray RSTn, repeated
            # SOI — zero payload, keep walking
            continue
        if marker in (0xC6, 0xCE):
            raise NotImplementedError(
                "differential progressive JPEG is not implemented")
        if marker in (0xC5, 0xC7, 0xCD, 0xCF):
            raise NotImplementedError(
                "differential/hierarchical JPEG decode is not implemented")
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG: segment length missing")
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("truncated JPEG: segment body missing")
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 1:
                    table = np.frombuffer(
                        seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    table = np.frombuffer(
                        seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                if len(bits) < 16:
                    raise ValueError("truncated DHT segment")
                nvals = sum(bits)
                vals = list(seg[i + 17:i + 17 + nvals])
                if len(vals) < nvals:
                    raise ValueError("truncated DHT symbol table")
                huff[(tc, th)] = _huff_table(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            # SOF0/1 baseline, SOF2 progressive, SOF3 lossless,
            # SOF9 extended-sequential arithmetic, SOF10 progressive
            # arithmetic, SOF11 lossless arithmetic
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF component list")
            arith = marker in (0xC9, 0xCA, 0xCB)
            lossless = marker in (0xC3, 0xCB)
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError("lossless precision must be 2..16")
            elif prec not in (8, 12):
                raise NotImplementedError("only 8/12-bit precision decodes")
            precision = prec
            progressive = marker in (0xC2, 0xCA)
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                h_c, v_c = hv >> 4, hv & 0x0F
                if lossless and (h_c != 1 or v_c != 1):
                    raise NotImplementedError(
                        "subsampled lossless JPEG is not implemented")
                if h_c not in (1, 2) or v_c not in (1, 2):
                    raise NotImplementedError(
                        "only sampling factors 1 and 2 are implemented "
                        "(covers 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 / gray)")
                comps.append((cid, h_c, v_c, tq))
            frame = (height, width, comps)
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xCC:  # DAC — arithmetic conditioning (T.81 B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0x0F
                val = seg[i + 1]
                if tc == 0:
                    lo, hi = val & 0x0F, val >> 4
                    if lo > hi:
                        raise ValueError("DAC DC conditioning needs L <= U")
                    dc_cond[tb] = (lo, hi)
                else:
                    if not 1 <= val <= 63:
                        raise ValueError("DAC AC Kx must be in 1..63")
                    ac_cond[tb] = val
                i += 2
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            height, width, comps = frame
            if not seg:
                raise ValueError("truncated SOS header")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated SOS component list")
            if lossless and arith:
                return _jpeg_decode_arith_lossless(
                    payload, pos + seglen, seg, frame, dc_cond,
                    restart_interval, precision)
            if lossless:
                return _jpeg_decode_lossless(
                    payload, pos + seglen, seg, frame, huff,
                    restart_interval, precision)
            if arith and progressive:
                if len(seg) < 1 + 2 * ns + 3:
                    raise ValueError("truncated progressive SOS header")
                if prog_coef is None:
                    geo, _, _ = _jpeg_prog_geometry(comps, height, width)
                    prog_coef = [
                        np.zeros((g["pad_bh"], g["pad_bw"], 64),
                                 dtype=np.int64)
                        for g in geo
                    ]
                pos = _jpeg_decode_arith_progressive_scan(
                    payload, pos + seglen, seg, comps, dc_cond, ac_cond,
                    prog_coef, restart_interval, height, width,
                )
                continue
            if arith:
                return _jpeg_decode_arith_scan(
                    payload, pos + seglen, seg, frame, qt,
                    dc_cond, ac_cond, restart_interval, precision)
            if progressive:
                if len(seg) < 1 + 2 * ns + 3:
                    raise ValueError("truncated progressive SOS header")
                if prog_coef is None:
                    geo, _, _ = _jpeg_prog_geometry(comps, height, width)
                    prog_coef = [
                        np.zeros((g["pad_bh"], g["pad_bw"], 64),
                                 dtype=np.int64)
                        for g in geo
                    ]
                pos = _jpeg_progressive_scan(
                    payload, pos + seglen, seg, comps, huff,
                    prog_coef, restart_interval, height, width,
                )
                continue
            scan_tables = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in comps if x[0] == cs), None)
                if comp is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                (cid, h_c, v_c, tq) = comp
                dct_t = huff.get((0, tt >> 4))
                act_t = huff.get((1, tt & 0x0F))
                if dct_t is None or act_t is None or tq not in qt:
                    raise ValueError("SOS references an undefined table")
                scan_tables.append((dct_t, act_t, qt[tq], h_c, v_c))
            br = _BitReader(payload, pos + seglen)
            max_h = max(h for (_, _, _, h, _) in scan_tables)
            max_v = max(v for (_, _, _, _, v) in scan_tables)
            mcus_x = -(-width // (8 * max_h))
            mcus_y = -(-height // (8 * max_v))
            n_mcu = mcus_x * mcus_y
            preds = [0] * ns
            mcu = 0
            # entropy decode is inherently sequential (python loop);
            # an MCU interleaves h*v blocks per component (T.81 A.2.3);
            # dequant + IDCT batch over ALL blocks afterwards per
            # component — vectorized numpy, no per-block dispatch
            comp_zz = [
                np.zeros((n_mcu * h * v, 64), dtype=np.int64)
                for (_, _, _, h, v) in scan_tables
            ]
            for _my in range(mcus_y):
                for _mx in range(mcus_x):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        br.align()
                        m = payload[br.pos:br.pos + 2]
                        if len(m) == 2 and m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7:
                            br.pos += 2
                        preds = [0] * ns
                    for ci, (dct_, act_, q, h_c, v_c) in enumerate(scan_tables):
                        for blk in range(h_c * v_c):
                            zz = comp_zz[ci][mcu * h_c * v_c + blk]
                            s = _decode_symbol(br, dct_)
                            diff = _extend(br.bits(s), s) if s else 0
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _decode_symbol(br, act_)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                zz[k] = _extend(br.bits(s), s)
                                k += 1
                    mcu += 1
            planes = []
            for ci, (_, _, q, h_c, v_c) in enumerate(scan_tables):
                coefs = np.zeros((n_mcu * h_c * v_c, 64), dtype=np.float64)
                coefs[:, _ZIGZAG] = comp_zz[ci] * q[None, :]
                blocks = _DCT_A.T @ coefs.reshape(-1, 8, 8) @ _DCT_A
                # MCU-interleaved block order -> component plane:
                # block index = ((my*mcus_x + mx)*v + vy)*h + vx
                plane = (
                    blocks.reshape(mcus_y, mcus_x, v_c, h_c, 8, 8)
                    .transpose(0, 2, 4, 1, 3, 5)
                    .reshape(mcus_y * v_c * 8, mcus_x * h_c * 8)
                )
                if h_c < max_h or v_c < max_v:
                    # nearest-neighbor chroma upsampling
                    plane = np.repeat(
                        np.repeat(plane, max_v // v_c, axis=0),
                        max_h // h_c, axis=1,
                    )
                planes.append(plane[:height, :width])
            center = float(1 << (precision - 1))
            maxv = (1 << precision) - 1
            dtype = np.uint8 if precision == 8 else np.uint16
            planes = np.clip(np.round(np.stack(planes) + center), 0, maxv)
            if ns == 1:
                return planes[0].astype(dtype)
            if ns == 3:
                y, cb, cr = planes
                r = y + 1.402 * (cr - center)
                g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
                b = y + 1.772 * (cb - center)
                return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                               0, maxv).astype(dtype)
            raise NotImplementedError("unsupported component count")
        pos += seglen
    raise ValueError("no SOS scan found")


def with_jpeg_payload(docs: DataFrame) -> DataFrame:
    """Attach a VALID baseline JPEG payload built from each doc's
    UTF-8 bytes via :func:`encode_gray_jpeg` — partition-local
    ``mapInPandas``, same placement as the PPM/WAV/Y4M builders."""
    return docs.select("doc_id", "text").mapInPandas(
        _encode_build(encode_gray_jpeg), schema=_PAYLOAD_SCHEMA
    )


def jpeg_decode_stats(docs: DataFrame) -> DataFrame:
    """End-to-end compressed-decode pipeline: text → baseline JPEG →
    :func:`decode_jpeg` (huffman + dequant + IDCT) → per-image pixel
    stats, mirroring :func:`decode_stats`. Output: (doc_id,
    n_pixel_bytes, pixel_sum, zero_bin) — integer-exact because the
    synthesized blocks are constant, so the oracle rebuilds the same
    numbers from the raw text bytes × 64 px/block."""
    return _fuse(docs, _encode_build(encode_gray_jpeg),
                 _jpeg_pixel_stats, DECODE_SCHEMA)


JPEG_DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({JPEG_W_BLOCKS} AS DOUBLE)) AS BIGINT))
               * {JPEG_W_BLOCKS} AS n_blocks
      FROM h
    ),
    vals AS (
      SELECT doc_id, n_raw, n_blocks,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)) AS bv
      FROM dims
    )
    SELECT doc_id,
           n_blocks * 64 AS n_pixel_bytes,
           CAST(coalesce(list_sum(bv), 0) * 64 AS BIGINT) AS pixel_sum,
           CAST((len(list_filter(bv, v -> v % {HIST_BINS} = 0))
                 + (n_blocks - n_raw)) * 64 AS BIGINT) AS zero_bin
    FROM vals
"""


def jpeg_progressive_decode_stats(docs: DataFrame) -> DataFrame:
    """text → PROGRESSIVE (SOF2) JPEG — DC successive approximation
    split across two scans plus EOB-run AC scans — →
    :func:`decode_jpeg`'s multi-scan coefficient accumulation →
    pixel stats. The reconstructed image equals the baseline gray
    fixture's, so the certified JPEG_DECODE_STATS_ORACLE pins the
    progressive path with the identical byte algebra."""
    return _fuse(docs, _encode_build(encode_gray_jpeg_progressive),
                 _jpeg_pixel_stats, DECODE_SCHEMA)


def jpeg_arith_decode_stats(docs: DataFrame) -> DataFrame:
    """text → arithmetic-coded (SOF9) JPEG (T.81 QM coder, annex-D
    encoder / annex-E decoder, conformance-pinned both directions
    against libjpeg in tests/test_properties.py) →
    :func:`decode_jpeg`'s QM scan path → pixel stats. The constant-
    block image model equals the baseline gray fixture's, so the
    certified JPEG_DECODE_STATS_ORACLE pins the arithmetic path with
    the identical byte algebra. Partition-local mapInPandas — no
    shuffle, scales with the documents scan."""
    return _fuse(docs, _encode_build(encode_gray_jpeg_arith),
                 _jpeg_pixel_stats, DECODE_SCHEMA)


def jpeg420_decode_stats(docs: DataFrame) -> DataFrame:
    """text → baseline 4:2:0 JPEG (2x2 luma per MCU + constant
    chroma) → :func:`decode_jpeg`'s multi-block-per-MCU walk + chroma
    upsampling → pixel stats over the (h, w, 3) RGB. Constant blocks
    decode bit-exactly to RGB=(y,y,y), so every stat is the gray
    algebra × 192 (64 px/block × 3 channels)."""
    return _fuse(docs, _encode_build(encode_gray_jpeg_420),
                 _jpeg_pixel_stats, DECODE_SCHEMA)


JPEG420_DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / 32.0) AS BIGINT)) * 32 AS n_blocks
      FROM h
    ),
    vals AS (
      SELECT doc_id, n_raw, n_blocks,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)) AS bv
      FROM dims
    )
    SELECT doc_id,
           n_blocks * 192 AS n_pixel_bytes,
           CAST(coalesce(list_sum(bv), 0) * 192 AS BIGINT) AS pixel_sum,
           CAST((len(list_filter(bv, v -> v % {HIST_BINS} = 0))
                 + (n_blocks - n_raw)) * 192 AS BIGINT) AS zero_bin
    FROM vals
"""


# ---------------------------------------------------------------------
# PNG: a REAL lossless decoder — chunk parse with CRC32 verification,
# from-scratch INFLATE (RFC 1951: stored + fixed + dynamic huffman
# blocks, LZ77 length/distance back-references), zlib wrapper with
# adler32 verification (RFC 1950), and the five PNG scanline filters
# (RFC 2083). Pure numpy/stdlib-free-of-codecs: zlib/binascii are NOT
# used for the decode path (crc32/adler32 are recomputed with numpy
# table arithmetic) so this stands as an actual decompressor, not a
# wrapper. PNG is lossless, so the synthesized grayscale payloads
# round-trip the raw text bytes exactly and the DuckDB oracle pins the
# decoded pixels byte-for-byte — a stronger statement than the JPEG
# constant-block construction.

PNG_W = 64  # synthesized image width in pixels (1 byte/px grayscale)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CRC_TABLE = None


def _crc32(data: bytes) -> int:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, 0xEDB88320 ^ (t >> 1), t >> 1).astype(np.uint32)
        _CRC_TABLE = t
    crc = np.uint32(0xFFFFFFFF)
    table = _CRC_TABLE
    for b in data:
        crc = table[(int(crc) ^ b) & 0xFF] ^ (crc >> np.uint32(8))
    return int(crc) ^ 0xFFFFFFFF


def _adler32(data: np.ndarray) -> int:
    # vectorized mod-65521 running sums (numpy, chunked to avoid
    # overflow): a = 1 + Σd, b = Σa-prefixes
    a, b = 1, 0
    arr = data.astype(np.int64)
    for i in range(0, len(arr), 5000):
        chunk = arr[i:i + 5000]
        b = (b + len(chunk) * a + int(np.cumsum(chunk).sum())) % 65521
        a = (a + int(chunk.sum())) % 65521
    return (b << 16) | a


class _LSBBitReader:
    """DEFLATE is LSB-first — unlike JPEG's MSB-first reader."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated deflate stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def align_byte(self) -> None:
        self.acc = 0
        self.nbits = 0


def _build_huffman(lengths: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol from the RFC 1951 canonical code."""
    out: dict[tuple[int, int], int] = {}
    max_len = max(lengths) if lengths else 0
    code = 0
    for length in range(1, max_len + 1):
        for sym, sl in enumerate(lengths):
            if sl == length:
                out[(length, code)] = sym
                code += 1
        code <<= 1
    return out


def _read_code(br: _LSBBitReader, table: dict[tuple[int, int], int]) -> int:
    # canonical huffman codes are read MSB-first even in the LSB-first
    # deflate stream (RFC 1951 §3.1.1)
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in deflate stream")


_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
             51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
              4, 4, 4, 4, 5, 5, 5, 5, 0]
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
              385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
              16385, 24577]
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
               9, 9, 10, 10, 11, 11, 12, 12, 13, 13]

_CLEN_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


def _inflate_consume(data: bytes) -> tuple[bytes, int]:
    """RFC 1951 DEFLATE decompression: stored, fixed-huffman, and
    dynamic-huffman blocks with LZ77 back-references. Returns
    (decompressed bytes, compressed bytes consumed) so container
    formats with trailers (gzip) can locate what follows the deflate
    stream without reimplementing the block loop."""
    br = _LSBBitReader(data)
    out = bytearray()
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align_byte()
            if br.pos + 4 > len(data):
                raise ValueError("truncated stored block header")
            ln = data[br.pos] | (data[br.pos + 1] << 8)
            nlen = data[br.pos + 2] | (data[br.pos + 3] << 8)
            if ln ^ 0xFFFF != nlen:
                raise ValueError("stored block LEN/NLEN mismatch")
            br.pos += 4
            if br.pos + ln > len(data):
                raise ValueError("truncated stored block body")
            out += data[br.pos:br.pos + ln]
            br.pos += ln
        elif btype in (1, 2):
            if btype == 1:  # fixed tables (RFC 1951 §3.2.6)
                lit_lengths = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
                dist_lengths = [5] * 30
            else:  # dynamic tables
                hlit = br.bits(5) + 257
                hdist = br.bits(5) + 1
                hclen = br.bits(4) + 4
                clen = [0] * 19
                for i in range(hclen):
                    clen[_CLEN_ORDER[i]] = br.bits(3)
                clt = _build_huffman(clen)
                lengths: list[int] = []
                while len(lengths) < hlit + hdist:
                    sym = _read_code(br, clt)
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        if not lengths:
                            raise ValueError("repeat with no previous length")
                        lengths += [lengths[-1]] * (3 + br.bits(2))
                    elif sym == 17:
                        lengths += [0] * (3 + br.bits(3))
                    else:
                        lengths += [0] * (11 + br.bits(7))
                lit_lengths = lengths[:hlit]
                dist_lengths = lengths[hlit:hlit + hdist]
            lit_table = _build_huffman(lit_lengths)
            dist_table = _build_huffman(dist_lengths)
            while True:
                sym = _read_code(br, lit_table)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"invalid length symbol {sym}")
                    length = _LEN_BASE[sym - 257] + br.bits(_LEN_EXTRA[sym - 257])
                    dsym = _read_code(br, dist_table)
                    dist = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("back-reference before stream start")
                    for _ in range(length):  # may overlap itself
                        out.append(out[-dist])
        else:
            raise ValueError("reserved deflate block type 3")
        if bfinal:
            # br.pos already counts the byte holding the final bits;
            # trailing partial bits are padding per the RFC
            return bytes(out), br.pos


def inflate(data: bytes) -> bytes:
    """RFC 1951 DEFLATE decompression (see :func:`_inflate_consume`)."""
    return _inflate_consume(data)[0]


def _zlib_decompress(data: bytes) -> bytes:
    """RFC 1950 wrapper: header check + inflate + adler32 verify."""
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib CM is not deflate")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise NotImplementedError("preset dictionaries are not supported")
    raw = inflate(data[2:-4])
    want = int.from_bytes(data[-4:], "big")
    got = _adler32(np.frombuffer(raw, dtype=np.uint8))
    if got != want:
        raise ValueError(f"adler32 mismatch: {got:#x} != {want:#x}")
    return raw


def _deflate_fixed_literals(raw: bytes) -> bytes:
    """Minimal REAL deflate compressor: one fixed-huffman block of
    pure literals (valid per RFC 1951; no back-references emitted, so
    the decoder's LZ77 path is exercised by tests instead). LSB-first
    bit packing with MSB-first code emission."""
    acc = 1  # bfinal=1 (bit 0)
    nbits = 1
    acc |= 1 << 1  # btype=01 fixed, LSB-first -> bits (1,0)
    nbits = 3
    out = bytearray()

    def put_code(code: int, length: int) -> None:
        nonlocal acc, nbits
        for i in range(length - 1, -1, -1):  # MSB first
            acc |= ((code >> i) & 1) << nbits
            nbits += 1
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

    for b in raw:
        if b < 144:
            put_code(0x30 + b, 8)
        else:
            put_code(0x190 + (b - 144), 9)
    put_code(0, 7)  # end-of-block (symbol 256)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gray_png(body: bytes, width: int = PNG_W) -> bytes:
    """Synthesize a VALID 8-bit grayscale PNG whose pixel bytes are
    ``body`` (zero-padded to full rows, filter 0 per scanline), with
    real CRC32/adler32 and a real fixed-huffman deflate stream."""
    import struct

    h = max(1, -(-len(body) // width))
    pixels = body.ljust(h * width, b"\x00")
    raw = b"".join(
        b"\x00" + pixels[r * width:(r + 1) * width] for r in range(h)
    )
    deflated = _deflate_fixed_literals(raw)
    cmf_flg = b"\x78\x01"  # deflate, 32k window, FCHECK-valid
    zstream = cmf_flg + deflated + _adler32(
        np.frombuffer(raw, dtype=np.uint8)
    ).to_bytes(4, "big")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", _crc32(tag + payload))
        )

    ihdr = struct.pack(">IIBBBBB", width, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zstream)
        + chunk(b"IEND", b"")
    )


_ADAM7_PASSES = [  # (x0, y0, dx, dy) per PNG §8.2
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters over ``height`` lines of
    ``stride`` bytes each (filters operate on BYTES, with the left
    neighbor ``bpp`` bytes back regardless of depth — PNG §9.2)."""
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated filtered scanlines")
    img = np.zeros((height, stride), dtype=np.uint8)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int64)
        prior = img[r - 1].astype(np.int64) if r else np.zeros(stride, np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prior) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth need left recursion
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid filter type {ftype}")
        img[r] = rec.astype(np.uint8)
    return img


def encode_palette_png(
    body: bytes, palette: np.ndarray, width: int = PNG_W,
    trns: np.ndarray | None = None,
) -> bytes:
    """Synthesize a VALID 8-bit indexed-palette PNG: ``body`` bytes
    are palette indices (reduced modulo the palette size, zero-padded
    to full rows), ``palette`` is an (n, 3) uint8 RGB table emitted as
    the PLTE chunk. ``trns`` (optional, uint8, len <= n) emits a tRNS
    alpha table."""
    import struct

    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    n = len(palette)
    idx = np.frombuffer(body.ljust(
        max(1, -(-len(body) // width)) * width, b"\x00"), dtype=np.uint8) % n
    h = idx.size // width
    raw = b"".join(
        b"\x00" + idx[r * width:(r + 1) * width].tobytes() for r in range(h)
    )
    deflated = _deflate_fixed_literals(raw)
    zstream = (b"\x78\x01" + deflated
               + _adler32(np.frombuffer(raw, dtype=np.uint8)).to_bytes(4, "big"))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", _crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", width, h, 8, 3, 0, 0, 0)  # indexed, 8-bit
    trns_chunk = (
        chunk(b"tRNS", np.asarray(trns, dtype=np.uint8).tobytes())
        if trns is not None else b""
    )
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette.tobytes())
            + trns_chunk + chunk(b"IDAT", zstream) + chunk(b"IEND", b""))


def encode_graysub_png(
    body: bytes, depth: int, width: int = PNG_W,
    interlace: bool = False, trns_key: int | None = None,
) -> bytes:
    """Synthesize a VALID sub-byte (1/2/4-bit) grayscale PNG: ``body``
    bytes are reduced modulo 2^depth into raw samples, packed
    MSB-first with byte-padded rows (PNG §7.2), filter 0 per
    scanline. ``interlace`` emits the Adam7 layout; ``trns_key`` emits
    a grayscale transparent-color-key tRNS chunk."""
    import struct

    if depth not in (1, 2, 4):
        raise ValueError("sub-byte depth must be 1, 2, or 4")
    n = max(1, -(-len(body) // width)) * width
    samples = np.zeros(n, dtype=np.uint8)
    samples[: len(body)] = np.frombuffer(body, dtype=np.uint8) % (1 << depth)
    h = n // width
    grid = samples.reshape(h, width)

    def pack_rows(rows: np.ndarray) -> bytes:
        bits = (
            (rows[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
        ).astype(np.uint8).reshape(rows.shape[0], -1)
        return b"".join(
            b"\x00" + np.packbits(bits[r]).tobytes() for r in range(rows.shape[0])
        )

    if interlace:
        raw = b""
        for (x0, y0, dx, dy) in _ADAM7_PASSES:
            sub = grid[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            raw += pack_rows(sub)
    else:
        raw = pack_rows(grid)
    deflated = _deflate_fixed_literals(raw)
    zstream = (b"\x78\x01" + deflated
               + _adler32(np.frombuffer(raw, dtype=np.uint8)).to_bytes(4, "big"))
    ihdr = struct.pack(">IIBBBBB", width, h, depth, 0, 0, 0, int(interlace))
    chunks = [(b"IHDR", ihdr)]
    if trns_key is not None:
        chunks.append((b"tRNS", struct.pack(">H", trns_key)))
    chunks += [(b"IDAT", zstream), (b"IEND", b"")]
    return _png_chunks(chunks)


def _png_chunks(tag_payloads) -> bytes:
    import struct

    out = bytearray(_PNG_SIG)
    for tag, payload in tag_payloads:
        out += (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", _crc32(tag + payload)))
    return bytes(out)


def encode_gray16_png(samples: np.ndarray, width: int = PNG_W) -> bytes:
    """Synthesize a VALID 16-bit grayscale PNG from a uint16 sample
    array (zero-padded to full rows, filter 0, big-endian samples)."""
    import struct

    samples = np.asarray(samples, dtype=np.uint16).ravel()
    n = max(1, -(-samples.size // width)) * width
    px = np.zeros(n, dtype=np.uint16)
    px[:samples.size] = samples
    h = n // width
    be = px.astype(">u2").tobytes()
    stride = width * 2
    raw = b"".join(
        b"\x00" + be[r * stride:(r + 1) * stride] for r in range(h)
    )
    deflated = _deflate_fixed_literals(raw)
    zstream = (b"\x78\x01" + deflated
               + _adler32(np.frombuffer(raw, dtype=np.uint8)).to_bytes(4, "big"))
    ihdr = struct.pack(">IIBBBBB", width, h, 16, 0, 0, 0, 0)
    return _png_chunks([(b"IHDR", ihdr), (b"IDAT", zstream), (b"IEND", b"")])


def encode_gray_png_adam7(body: bytes, width: int = PNG_W) -> bytes:
    """Synthesize a VALID Adam7-interlaced 8-bit grayscale PNG: the
    de-interlaced image equals :func:`encode_gray_png`'s (body bytes
    row-major, zero-padded), but the stream carries the seven
    independently filtered passes."""
    import struct

    n = max(1, -(-len(body) // width)) * width
    px = np.frombuffer(body.ljust(n, b"\x00"), dtype=np.uint8).reshape(-1, width)
    h = px.shape[0]
    raw = bytearray()
    for (x0, y0, dx, dy) in _ADAM7_PASSES:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in range(sub.shape[0]):
            raw += b"\x00" + sub[r].tobytes()
    raw = bytes(raw)
    deflated = _deflate_fixed_literals(raw)
    zstream = (b"\x78\x01" + deflated
               + _adler32(np.frombuffer(raw, dtype=np.uint8)).to_bytes(4, "big"))
    ihdr = struct.pack(">IIBBBBB", width, h, 8, 0, 0, 0, 1)  # interlace 1
    return _png_chunks([(b"IHDR", ihdr), (b"IDAT", zstream), (b"IEND", b"")])


def _png_unpack_bits(rows: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Unpack sub-byte PNG samples: each row of packed bytes holds
    ``width`` samples of ``depth`` bits, MSB-first, padded to a byte
    boundary (PNG §7.2). Returns (h, width) uint8 raw sample values
    (NOT scaled to 8-bit)."""
    bits = np.unpackbits(rows, axis=1)[:, : width * depth]
    groups = bits.reshape(rows.shape[0], width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (groups * weights).sum(axis=2).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decoder: grayscale/RGB/RGBA/gray+alpha/indexed-palette
    at 8/16-bit depth, sub-byte (1/2/4-bit) grayscale and palette,
    Adam7 interlacing (including sub-byte passes), and tRNS
    transparency — palette alpha table for color type 3, transparent
    color key for types 0/2 (PNG §11.3.2). Chunk walk with CRC
    verification, zlib/inflate, all five scanline filters
    (None/Sub/Up/Average/Paeth).

    Returns (h, w) for grayscale or (h, w, channels); palette images
    return the mapped (h, w, 3) RGB, or (h, w, 4) RGBA with a tRNS
    table; a tRNS color key adds an alpha plane (0 at keyed pixels).
    Sub-byte grayscale scales exactly to 8-bit (255/(2^d-1) is an
    integer for d in 1/2/4)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    import struct

    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if pos + 12 + ln > len(payload):
            raise ValueError(f"truncated PNG {tag!r} chunk")
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if _crc32(tag + data) != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            if ln != 13:
                raise ValueError("IHDR chunk must be 13 bytes")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        elif tag == b"PLTE":
            if ln == 0 or ln % 3:
                raise ValueError("PLTE length must be a positive multiple of 3")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = data
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid bit depth {depth}")
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"color type {color} is not supported")
    if depth < 8 and color not in (0, 3):
        raise ValueError(f"bit depth {depth} is only valid for grayscale/palette")
    if color == 3 and palette is None:
        raise ValueError("palette color type without a PLTE chunk")
    if color == 3 and depth == 16:
        raise ValueError("palette images cannot be 16-bit")
    if trns is not None and color in (4, 6):
        raise ValueError("tRNS is invalid for color types that carry alpha")
    if trns is not None and color == 3 and len(trns) > len(palette):
        raise ValueError("tRNS table longer than the palette")
    if trns is not None and color == 0 and len(trns) != 2:
        raise ValueError("grayscale tRNS must be one 2-byte sample")
    if trns is not None and color == 2 and len(trns) != 6:
        raise ValueError("truecolor tRNS must be three 2-byte samples")
    raw = _zlib_decompress(bytes(idat))
    bps = depth // 8
    # filters operate on BYTES; for sub-byte depths the left neighbor
    # is 1 byte back (PNG §9.2)
    bpp = max(1, channels * bps)

    def row_bytes(w: int) -> int:
        return -(-w * channels * depth // 8)

    if interlace:
        # Adam7: seven independently filtered sub-images scattered on
        # the (x0, y0, dx, dy) grids; empty passes emit nothing.
        # Sub-byte passes unpack to raw samples before scattering.
        img = np.zeros(
            (height, width if depth < 8 else width * bpp), dtype=np.uint8
        )
        off = 0
        for (x0, y0, dx, dy) in _ADAM7_PASSES:
            w_p = -(-(width - x0) // dx) if width > x0 else 0
            h_p = -(-(height - y0) // dy) if height > y0 else 0
            if w_p <= 0 or h_p <= 0:
                continue
            stride_p = row_bytes(w_p)
            need = h_p * (stride_p + 1)
            sub = _png_unfilter(raw[off:off + need], h_p, stride_p, bpp)
            off += need
            rows = y0 + dy * np.arange(h_p)
            cols = x0 + dx * np.arange(w_p)
            if depth < 8:
                img[np.ix_(rows, cols)] = _png_unpack_bits(sub, w_p, depth)
            else:
                byte_cols = (cols[:, None] * bpp + np.arange(bpp)).ravel()
                img[np.ix_(rows, byte_cols)] = sub
        if off != len(raw):
            raise ValueError("decompressed size does not match Adam7 passes")
    else:
        stride = row_bytes(width)
        if len(raw) != height * (stride + 1):
            raise ValueError("decompressed size does not match dimensions")
        img = _png_unfilter(raw, height, stride, bpp)
        if depth < 8:
            img = _png_unpack_bits(img, width, depth)
    if color == 3:
        # indexed color: map each index through the PLTE triplets
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[img]  # (h, w, 3)
        if trns is None:
            return rgb
        alpha = np.full(len(palette), 255, dtype=np.uint8)
        table = np.frombuffer(trns, dtype=np.uint8)
        alpha[: len(table)] = table
        return np.dstack([rgb, alpha[img]])
    if depth < 8:  # grayscale sub-byte: exact scale to 8-bit
        scaled = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
        if trns is None:
            return scaled
        key = int.from_bytes(trns, "big")  # raw-sample color key
        return np.dstack(
            [scaled, np.where(img == key, 0, 255).astype(np.uint8)]
        )
    if bps == 2:  # 16-bit samples are big-endian byte pairs
        img = (
            img.reshape(height, width * channels, 2).astype(np.uint16)
        )
        img = (img[:, :, 0] << 8) | img[:, :, 1]
        img = img if channels == 1 else img.reshape(height, width, channels)
    elif channels == 1:
        pass  # (h, w) uint8 as unfiltered
    else:
        img = img.reshape(height, width, channels)
    if trns is None or color not in (0, 2):
        return img
    # transparent color key: alpha plane 0 where the pixel equals the
    # key, full-scale elsewhere (key stored as 16-bit samples; only
    # the low `depth` bits are significant)
    keys = np.frombuffer(trns, dtype=">u2").astype(np.uint16)
    full = np.uint16(65535) if depth == 16 else np.uint8(255)
    dtype = np.uint16 if depth == 16 else np.uint8
    if color == 0:
        key = keys[0] if depth == 16 else dtype(keys[0] & 0xFF)
        alpha = np.where(img == key, 0, full).astype(dtype)
        return np.dstack([img, alpha])
    key = keys if depth == 16 else (keys & 0xFF).astype(dtype)
    match = (img == key.reshape(1, 1, 3)).all(axis=2)
    alpha = np.where(match, 0, full).astype(dtype)
    return np.dstack([img, alpha])


def with_png_payload(docs: DataFrame) -> DataFrame:
    """Attach a VALID grayscale PNG payload built from each doc's
    UTF-8 bytes — partition-local ``mapInPandas``."""
    return docs.select("doc_id", "text").mapInPandas(
        _encode_build(encode_gray_png), schema=_PAYLOAD_SCHEMA
    )


def png_decode_stats(docs: DataFrame) -> DataFrame:
    """text → PNG (real deflate) → :func:`decode_png` (real inflate +
    unfilter) → pixel stats. PNG is LOSSLESS: the decoded pixels ARE
    the raw text bytes plus zero padding, so the DuckDB oracle pins
    the decoder byte-for-byte. Output mirrors :func:`decode_stats`."""
    return _fuse(docs, _encode_build(encode_gray_png),
                 _png_pixel_stats, DECODE_SCHEMA)


def png_adam7_decode_stats(docs: DataFrame) -> DataFrame:
    """text → Adam7-INTERLACED grayscale PNG → :func:`decode_png`'s
    seven-pass de-interlacer → pixel stats. The de-interlaced image
    equals the straight row-major one, so the certified
    PNG_DECODE_STATS_ORACLE pins this path with the identical
    byte algebra."""
    return _fuse(docs, _encode_build(encode_gray_png_adam7),
                 _png_pixel_stats, DECODE_SCHEMA)


_PALETTE_N = 64


def _fixture_palette() -> np.ndarray:
    """Deterministic 64-entry RGB palette shared by the Spark builder
    and the SQL oracle: P[i] = ((53i+7)%256, (97i+11)%256, (193i+23)%256)."""
    i = np.arange(_PALETTE_N, dtype=np.int64)
    return np.stack(
        [(53 * i + 7) % 256, (97 * i + 11) % 256, (193 * i + 23) % 256],
        axis=-1,
    ).astype(np.uint8)


def png_palette_decode_stats(docs: DataFrame) -> DataFrame:
    """text → indexed-palette PNG (PLTE + real deflate) →
    :func:`decode_png`'s palette mapping → pixel stats over the
    (h, w, 3) RGB. Indices are the text bytes mod 64 against the
    deterministic fixture palette, so every channel value is a closed
    form of the raw bytes (the SQL oracle)."""
    pal = _fixture_palette()
    return _fuse(docs,
                 _encode_build(lambda b: encode_palette_png(b, pal)),
                 _png_pixel_stats, DECODE_SCHEMA)


_SUBBYTE_TRNS_KEY = 5  # nonzero so row padding stays opaque


def png_subbyte_decode_stats(docs: DataFrame) -> DataFrame:
    """text → 4-bit grayscale Adam7-interlaced PNG with a tRNS
    color key → :func:`decode_png` → pixel stats over the (h, w, 2)
    gray+alpha output. One entry exercises all three round-8 decoder
    paths at once (sub-byte unpack, sub-byte Adam7 passes, gray color
    key); samples are text bytes mod 16, so gray = 17·s and
    alpha = 0 iff s equals the key — a closed form of the raw bytes
    (the SQL oracle)."""
    return _fuse(
        docs,
        _encode_build(lambda b: encode_graysub_png(
            b, 4, interlace=True, trns_key=_SUBBYTE_TRNS_KEY)),
        _png_pixel_stats, DECODE_SCHEMA)


PNG_SUBBYTE_DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({PNG_W} AS DOUBLE)) AS BIGINT))
               * {PNG_W} AS n_pix
      FROM h
    ),
    sv AS (
      SELECT doc_id, n_pix,
             list_transform(generate_series(1, CAST(n_pix AS INTEGER)),
               i -> CASE WHEN i <= n_raw THEN
                      ((strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1))
                      % 16
                    ELSE 0 END) AS s
      FROM dims
    )
    SELECT doc_id,
           n_pix * 2 AS n_pixel_bytes,
           CAST(coalesce(list_sum(list_transform(s, v -> 17 * v)), 0)
                + coalesce(list_sum(list_transform(s,
                    v -> CASE WHEN v = {_SUBBYTE_TRNS_KEY} THEN 0 ELSE 255 END)), 0)
                AS BIGINT) AS pixel_sum,
           CAST(len(list_filter(s, v -> v = 0))
                + len(list_filter(s, v -> v = {_SUBBYTE_TRNS_KEY}))
                AS BIGINT) AS zero_bin
    FROM sv
"""


PNG_PALETTE_DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({PNG_W} AS DOUBLE)) AS BIGINT))
               * {PNG_W} AS n_pix
      FROM h
    ),
    idx AS (
      SELECT doc_id, n_raw, n_pix,
             list_transform(generate_series(1, CAST(n_pix AS INTEGER)),
               i -> CASE WHEN i <= n_raw THEN
                      ((strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1))
                      % {_PALETTE_N}
                    ELSE 0 END) AS iv
      FROM dims
    ),
    chans AS (
      SELECT doc_id, n_pix,
             list_transform(iv, v -> (53 * v + 7) % 256) AS c0,
             list_transform(iv, v -> (97 * v + 11) % 256) AS c1,
             list_transform(iv, v -> (193 * v + 23) % 256) AS c2
      FROM idx
    )
    SELECT doc_id,
           n_pix * 3 AS n_pixel_bytes,
           CAST(coalesce(list_sum(c0), 0) + coalesce(list_sum(c1), 0)
                + coalesce(list_sum(c2), 0) AS BIGINT) AS pixel_sum,
           CAST(len(list_filter(c0, v -> v % {HIST_BINS} = 0))
                + len(list_filter(c1, v -> v % {HIST_BINS} = 0))
                + len(list_filter(c2, v -> v % {HIST_BINS} = 0))
                AS BIGINT) AS zero_bin
    FROM chans
"""


PNG_DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({PNG_W} AS DOUBLE)) AS BIGINT))
               * {PNG_W} AS n_pix
      FROM h
    ),
    vals AS (
      SELECT doc_id, n_raw, n_pix,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)) AS bv
      FROM dims
    )
    SELECT doc_id,
           n_pix AS n_pixel_bytes,
           CAST(coalesce(list_sum(bv), 0) AS BIGINT) AS pixel_sum,
           CAST(len(list_filter(bv, v -> v % {HIST_BINS} = 0)) + (n_pix - n_raw)
                AS BIGINT) AS zero_bin
    FROM vals
"""


# ---------------------------------------------------------------------
# gzip (RFC 1952): the container real training corpora actually ship
# (.jsonl.gz / .warc.gz) — a thin header/trailer wrapper over the same
# from-scratch INFLATE the PNG decoder uses, with CRC32 + ISIZE
# verification. gunzip_text_stats is the ingestion shape: compressed
# binary column in, decompressed per-doc text statistics out, one
# partition-local Arrow pass, no shuffle.


def gunzip(data: bytes) -> bytes:
    """RFC 1952 gzip decompression over :func:`inflate`, verifying the
    CRC32 and ISIZE trailer. Multi-member streams, FEXTRA/FNAME/
    FCOMMENT/FHCRC header fields are handled; reserved flags raise."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("not a gzip stream (bad magic)")
        if pos + 10 > len(data):
            raise ValueError("truncated gzip header")
        if data[pos + 2] != 8:
            raise ValueError("gzip CM is not deflate")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError("reserved gzip FLG bits set")
        p = pos + 10
        if flg & 0x04:  # FEXTRA
            if p + 2 > len(data):
                raise ValueError("truncated gzip FEXTRA")
            xlen = data[p] | (data[p + 1] << 8)
            p += 2 + xlen
        if flg & 0x08:  # FNAME
            p = data.index(b"\x00", p) + 1
        if flg & 0x10:  # FCOMMENT
            p = data.index(b"\x00", p) + 1
        if flg & 0x02:  # FHCRC
            p += 2
        if p > len(data):
            raise ValueError("truncated gzip header")
        # the shared inflate reports how many compressed bytes the
        # member's deflate stream consumed — the trailer follows it
        member, used = _inflate_consume(data[p:])
        trailer_at = p + used
        if trailer_at + 8 > len(data):
            raise ValueError("truncated gzip trailer")
        crc = int.from_bytes(data[trailer_at:trailer_at + 4], "little")
        isize = int.from_bytes(data[trailer_at + 4:trailer_at + 8], "little")
        if _crc32(bytes(member)) != crc:
            raise ValueError("gzip CRC32 mismatch")
        if isize != len(member) % (1 << 32):
            raise ValueError("gzip ISIZE mismatch")
        out += member
        pos = trailer_at + 8
    return bytes(out)


def gzip_compress(raw: bytes) -> bytes:
    """Minimal gzip writer over :func:`_deflate_fixed_literals` (MTIME
    0 for determinism)."""
    return (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + _deflate_fixed_literals(raw)
        + _crc32(raw).to_bytes(4, "little")
        + (len(raw) % (1 << 32)).to_bytes(4, "little")
    )


def with_gzip_payload(docs: DataFrame) -> DataFrame:
    """Attach a gzip-compressed payload of each doc's UTF-8 text."""
    return docs.select("doc_id", "text").mapInPandas(
        _encode_build(gzip_compress), schema=_PAYLOAD_SCHEMA
    )


def gunzip_text_stats(docs: DataFrame) -> DataFrame:
    """Compressed-corpus ingestion end-to-end: text → gzip →
    :func:`gunzip` (real inflate + CRC verify) → per-doc byte stats
    over the DECOMPRESSED text. gzip is lossless, so the oracle
    recomputes the same stats from the raw text — pinning the
    decompressor byte-for-byte. Output: (doc_id, n_bytes, byte_sum,
    crc_ok)."""
    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("crc_ok", LongType()),
    ])

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "byte_sum": [], "crc_ok": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = gunzip(bytes(p))  # raises on CRC/ISIZE mismatch
                arr = np.frombuffer(raw, dtype=np.uint8)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(int(arr.size))
                out["byte_sum"].append(int(arr.astype(np.int64).sum()))
                out["crc_ok"].append(1)
            yield pd.DataFrame(out)

    return _fuse(docs, _encode_build(gzip_compress), stats, out_schema)


GUNZIP_TEXT_STATS_ORACLE = """
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    )
    SELECT doc_id,
           n_raw AS n_bytes,
           CAST(coalesce(list_sum(
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1))), 0)
             AS BIGINT) AS byte_sum,
           CAST(1 AS BIGINT) AS crc_ok
    FROM h
"""


# ---------------------------------------------------------------------
# FLAC (RFC 9639 subset): compressed audio with a REAL entropy coder —
# Rice-coded residuals of fixed linear predictors, frame CRC-8/CRC-16
# verification, STREAMINFO parsing. Encoder emits fixed-predictor
# (order 2) mono 16-bit frames; decoder additionally handles constant,
# verbatim, and fixed orders 0-4 subframes and all standard block-size
# / sample-rate / sample-size header codes. LPC subframes, stereo
# decorrelation, and wasted-bits raise the declared
# NotImplementedError. No FLAC implementation exists in this
# container to cross-validate against (unlike zlib/gzip), so the
# validation story is: bit-exact roundtrip over adversarial sample
# patterns, header/CRC corruption tests, and the byte-level SQL
# oracle on the synthesized corpus.

FLAC_RATE = 8000
FLAC_BLOCK = 4096

_CRC8_TABLE = None
_CRC16_TABLE = None


def _flac_crc8(data: bytes) -> int:
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        t = []
        for b in range(256):
            c = b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            t.append(c)
        _CRC8_TABLE = t
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _flac_crc16(data: bytes) -> int:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        t = []
        for b in range(256):
            c = b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
            t.append(c)
        _CRC16_TABLE = t
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


class _MSBBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> bytes:
        if self.nbits:
            self.put(0, 8 - self.nbits)
        return bytes(self.out)


class _MSBBitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos          # byte position of next fill
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def unary(self) -> int:
        # RFC 9639: n zero bits followed by a one bit encode n
        n = 0
        while self.bits(1) == 0:
            n += 1
        return n

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def align_byte(self) -> None:
        self.nbits -= self.nbits % 8
        extra = self.nbits // 8
        self.pos -= extra
        self.acc = 0
        self.nbits = 0


def _rice_zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, 2 * res, -2 * res - 1).astype(np.int64)


def _rice_unzigzag(u: int) -> int:
    return u // 2 if u % 2 == 0 else -(u // 2) - 1


def _utf8_frame_number(n: int) -> bytes:
    # frame numbers use the UTF-8-style variable-length coding
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])
    raise ValueError("frame number too large for this encoder")


def encode_flac(
    samples: np.ndarray, rate: int = FLAC_RATE, wasted_bits: int = 0
) -> bytes:
    """Mono 16-bit FLAC with fixed-order-2 predictors and Rice-coded
    residuals (one partition per frame, parameter fitted to the mean
    residual magnitude). ``wasted_bits=k`` emits the RFC 9639 §9.2.2
    wasted-bits subframe field (every sample must have k trailing zero
    bits; the subframe codes the shifted signal at 16-k bits)."""
    import struct

    if wasted_bits:
        if not (0 < wasted_bits < 16):
            raise ValueError("wasted_bits must be in 1..15")
        if (samples.astype(np.int64) & ((1 << wasted_bits) - 1)).any():
            raise ValueError(
                f"every sample needs {wasted_bits} trailing zero bits"
            )

    samples = samples.astype(np.int64)
    out = bytearray(b"fLaC")
    # STREAMINFO, last-metadata flag set
    si = _MSBBitWriter()
    si.put(FLAC_BLOCK, 16)  # min block
    si.put(FLAC_BLOCK, 16)  # max block
    si.put(0, 24)           # min frame size unknown
    si.put(0, 24)           # max frame size unknown
    si.put(rate, 20)
    si.put(0, 3)            # channels - 1
    si.put(15, 5)           # bits per sample - 1
    si.put(len(samples), 36)
    body = si.pad_to_byte() + b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    # an empty input is a valid zero-frame stream (total samples 0 in
    # STREAMINFO) — parity with the WAV path's empty-doc behavior
    for fi in range(0, len(samples), FLAC_BLOCK):
        block = samples[fi:fi + FLAC_BLOCK]
        bs = block.size
        hdr = _MSBBitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)        # reserved
        hdr.put(0, 1)        # fixed-blocksize stream
        hdr.put(0b0111, 4)   # blocksize-1 follows as 16 bits
        hdr.put(0b0000, 4)   # sample rate: from STREAMINFO
        hdr.put(0b0000, 4)   # mono
        hdr.put(0b100, 3)    # 16 bits/sample
        hdr.put(0, 1)        # reserved
        header = hdr.pad_to_byte() + _utf8_frame_number(fi // FLAC_BLOCK)
        header += struct.pack(">H", bs - 1)
        header += bytes([_flac_crc8(header)])

        bw = _MSBBitWriter()
        order = 2 if bs > 2 else 0
        bw.put(0, 1)                      # subframe padding bit
        bw.put(0b001000 | order, 6)       # FIXED, order
        if wasted_bits:
            bw.put(1, 1)                  # wasted-bits flag
            for _ in range(wasted_bits - 1):
                bw.put(0, 1)              # unary k-1
            bw.put(1, 1)
            block = block >> wasted_bits
            eff_bits = 16 - wasted_bits
        else:
            bw.put(0, 1)                  # no wasted bits
            eff_bits = 16
        for w in block[:order]:
            bw.put(int(w) & ((1 << eff_bits) - 1), eff_bits)  # warmup
        if order == 2:
            res = block[2:] - 2 * block[1:-1] + block[:-2]
        else:
            res = block
        u = _rice_zigzag(res)
        mean = int(u.mean()) if u.size else 0
        param = min(14, max(0, int(mean).bit_length() - 1))
        bw.put(0b00, 2)      # rice method, 4-bit params
        bw.put(0, 4)         # partition order 0 -> one partition
        bw.put(param, 4)
        for val in u:
            q, r = divmod(int(val), 1 << param)
            for _ in range(q):
                bw.put(0, 1)
            bw.put(1, 1)
            if param:
                bw.put(r, param)
        frame = header + bw.pad_to_byte()
        frame += struct.pack(">H", _flac_crc16(frame))
        out += frame
    return bytes(out)


_FLAC_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}
_FLAC_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                    6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                    11: 96000}
_FLAC_BITS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_flac_residuals(br: _MSBBitReader, bs: int, order: int) -> list[int]:
    """Rice-coded residual section shared by FIXED and LPC subframes
    (RFC 9639 §9.2.7), incl. the raw-bits escape code."""
    method = br.bits(2)
    if method >= 2:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    porder = br.bits(4)
    res: list[int] = []
    for p in range(1 << porder):
        count = (bs >> porder) - (order if p == 0 else 0)
        param = br.bits(pbits)
        if param == (1 << pbits) - 1:  # escape: raw n-bit residuals
            raw_n = br.bits(5)
            res += [br.signed(raw_n) if raw_n else 0 for _ in range(count)]
        else:
            for _ in range(count):
                q = br.unary()
                r = br.bits(param) if param else 0
                res.append(_rice_unzigzag((q << param) | r))
    return res


def encode_flac_stereo(samples_lr: np.ndarray, rate: int = FLAC_RATE) -> bytes:
    """Stereo 16-bit FLAC with MID/SIDE decorrelation and LPC-coded
    subframes: mid = (l+r)>>1 (16-bit), side = l-r (17-bit, the extra
    bit RFC 9639 §9.1.3 assigns the side channel), each coded as an
    order-2 LPC subframe with quantized coefficients [2, -1] and shift
    0 — numerically the fixed-order-2 predictor, emitted through the
    LPC subframe syntax so :func:`decode_flac`'s coefficient/shift
    reconstruction path is exercised bit-exactly."""
    import struct

    if samples_lr.ndim != 2 or samples_lr.shape[1] != 2:
        raise ValueError("encode_flac_stereo expects an (n, 2) array")
    samples_lr = samples_lr.astype(np.int64)
    n = samples_lr.shape[0]
    out = bytearray(b"fLaC")
    si = _MSBBitWriter()
    si.put(FLAC_BLOCK, 16)
    si.put(FLAC_BLOCK, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(1, 3)             # channels - 1 = 1 (stereo)
    si.put(15, 5)            # bits per sample - 1
    si.put(n, 36)
    body = si.pad_to_byte() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    def put_subframe(bw: _MSBBitWriter, chan: np.ndarray, cbits: int) -> None:
        bs = chan.size
        order = 2 if bs > 2 else 0
        bw.put(0, 1)  # padding bit
        if order:
            bw.put(0b100000 | (order - 1), 6)  # LPC, order-1 coded
        else:
            bw.put(0b001000, 6)                # FIXED order 0 fallback
        bw.put(0, 1)  # no wasted bits
        for w in chan[:order]:
            bw.put(int(w) & ((1 << cbits) - 1), cbits)
        if order:
            bw.put(3, 4)   # coefficient precision - 1 -> 4 bits
            bw.put(0, 5)   # shift 0 (5-bit signed, non-negative)
            bw.put(2 & 0xF, 4)    # c0 = 2
            bw.put(-1 & 0xF, 4)   # c1 = -1
            res = chan[2:] - 2 * chan[1:-1] + chan[:-2]
        else:
            res = chan
        u = _rice_zigzag(res)
        mean = int(u.mean()) if u.size else 0
        param = min(14, max(0, int(mean).bit_length() - 1))
        bw.put(0b00, 2)
        bw.put(0, 4)
        bw.put(param, 4)
        for val in u:
            q, r = divmod(int(val), 1 << param)
            for _ in range(q):
                bw.put(0, 1)
            bw.put(1, 1)
            if param:
                bw.put(r, param)

    for fi in range(0, n, FLAC_BLOCK):
        block = samples_lr[fi:fi + FLAC_BLOCK]
        left, right = block[:, 0], block[:, 1]
        mid = (left + right) >> 1
        side = left - right
        bs = block.shape[0]
        hdr = _MSBBitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)
        hdr.put(0, 1)
        hdr.put(0b0111, 4)   # blocksize-1 follows as 16 bits
        hdr.put(0b0000, 4)   # sample rate from STREAMINFO
        hdr.put(0b1010, 4)   # mid/side stereo
        hdr.put(0b100, 3)    # 16 bits/sample
        hdr.put(0, 1)
        header = hdr.pad_to_byte() + _utf8_frame_number(fi // FLAC_BLOCK)
        header += struct.pack(">H", bs - 1)
        header += bytes([_flac_crc8(header)])
        bw = _MSBBitWriter()
        put_subframe(bw, mid, 16)
        put_subframe(bw, side, 17)
        frame = header + bw.pad_to_byte()
        frame += struct.pack(">H", _flac_crc16(frame))
        out += frame
    return bytes(out)


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """FLAC decoder (constant/verbatim/fixed/LPC subframes, mono,
    independent channels, or decorrelated stereo — left/side,
    right/side, mid/side — Rice partitions incl. the escape code,
    CRC-8/16 verification). Returns (sample_rate, samples) with
    samples shaped (n,) mono or (n, channels)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    import struct

    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        if btype == 0:
            streaminfo = payload[pos + 4:pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    sr = _MSBBitReader(streaminfo)
    sr.bits(16); sr.bits(16); sr.bits(24); sr.bits(24)
    si_rate = sr.bits(20)
    si_channels = sr.bits(3) + 1
    si_bits = sr.bits(5) + 1
    total = sr.bits(36)

    chunks: list[np.ndarray] = []
    rate = si_rate  # zero-frame streams report the STREAMINFO rate
    while pos < len(payload):
        frame_start = pos
        br = _MSBBitReader(payload, pos)
        sync = br.bits(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.bits(1)  # reserved
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        rate_code = br.bits(4)
        ch_code = br.bits(4)
        bits_code = br.bits(3)
        br.bits(1)
        # UTF-8 frame/sample number
        first = br.bits(8)
        n_cont = 0
        v = first
        if first >= 0xC0:
            while (v << n_cont) & 0x40:
                n_cont += 1
            for _ in range(n_cont):
                br.bits(8)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            bs = br.bits(8) + 1
        elif bs_code == 7:
            bs = br.bits(16) + 1
        else:
            bs = _FLAC_BS_TABLE[bs_code]
        if rate_code == 0:
            rate = si_rate
        elif rate_code in _FLAC_RATE_TABLE:
            rate = _FLAC_RATE_TABLE[rate_code]
        elif rate_code == 12:
            rate = br.bits(8) * 1000
        elif rate_code == 13:
            rate = br.bits(16)
        elif rate_code == 14:
            rate = br.bits(16) * 10
        else:
            raise ValueError("invalid sample-rate code")
        bits = si_bits if bits_code == 0 else _FLAC_BITS_TABLE.get(bits_code)
        if bits is None:
            raise ValueError("reserved sample-size code")
        # RFC 9639 §9.1.3: 1000 left/side, 1001 right/side (side is
        # channel 0), 1010 mid/side; the SIDE channel carries one
        # extra bit of sample depth
        if ch_code < 8:
            n_channels = ch_code + 1
            stereo_mode = None
            ch_bits = [bits] * n_channels
        elif ch_code == 8:
            n_channels, stereo_mode, ch_bits = 2, "LS", [bits, bits + 1]
        elif ch_code == 9:
            n_channels, stereo_mode, ch_bits = 2, "RS", [bits + 1, bits]
        elif ch_code == 10:
            n_channels, stereo_mode, ch_bits = 2, "MS", [bits, bits + 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align_byte()
        hdr_end = br.pos
        crc8 = br.bits(8)
        if _flac_crc8(payload[frame_start:hdr_end]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")

        frame_channels = []
        for _ch in range(n_channels):
            cbits = ch_bits[_ch]
            if br.bits(1):
                raise ValueError("subframe padding bit set")
            st = br.bits(6)
            # wasted-bits flag: k = unary count + 1 trailing zero bits
            # stripped before coding; decode at cbits-k and shift back
            # (RFC 9639 §9.2.2)
            wasted = br.unary() + 1 if br.bits(1) else 0
            if wasted:
                if wasted >= cbits:
                    raise ValueError("wasted bits exceed sample depth")
                cbits -= wasted
            if st == 0:  # CONSTANT
                val = br.signed(cbits)
                chan = np.full(bs, val, dtype=np.int64)
            elif st == 1:  # VERBATIM
                chan = np.array(
                    [br.signed(cbits) for _ in range(bs)], dtype=np.int64)
            elif 8 <= st <= 12:  # FIXED order st-8
                order = st - 8
                warm = [br.signed(cbits) for _ in range(order)]
                res = _read_flac_residuals(br, bs, order)
                s = warm + [0] * len(res)
                for i in range(len(res)):
                    j = i + order
                    if order == 0:
                        s[j] = res[i]
                    elif order == 1:
                        s[j] = res[i] + s[j - 1]
                    elif order == 2:
                        s[j] = res[i] + 2 * s[j - 1] - s[j - 2]
                    elif order == 3:
                        s[j] = res[i] + 3 * s[j - 1] - 3 * s[j - 2] + s[j - 3]
                    else:
                        s[j] = (res[i] + 4 * s[j - 1] - 6 * s[j - 2]
                                + 4 * s[j - 3] - s[j - 4])
                chan = np.array(s, dtype=np.int64)
            elif 32 <= st <= 63:  # LPC, order st-31 (RFC 9639 §9.2.4)
                order = st - 31
                warm = [br.signed(cbits) for _ in range(order)]
                prec = br.bits(4)
                if prec == 0b1111:
                    raise ValueError("invalid LPC precision escape")
                prec += 1
                shift = br.signed(5)
                if shift < 0:
                    raise ValueError("negative LPC shift is invalid")
                coefs = [br.signed(prec) for _ in range(order)]
                res = _read_flac_residuals(br, bs, order)
                s = warm + [0] * len(res)
                for i in range(len(res)):
                    j = i + order
                    pred = sum(coefs[k] * s[j - 1 - k] for k in range(order))
                    s[j] = res[i] + (pred >> shift)
                chan = np.array(s, dtype=np.int64)
            else:
                raise ValueError(f"reserved subframe type {st}")
            frame_channels.append(chan << wasted if wasted else chan)
        br.align_byte()
        if br.pos + 2 > len(payload):
            raise ValueError("truncated FLAC frame footer")
        crc = struct.unpack(">H", payload[br.pos:br.pos + 2])[0]
        if _flac_crc16(payload[frame_start:br.pos]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.pos + 2
        if stereo_mode is None:
            chunk = (frame_channels[0] if n_channels == 1
                     else np.stack(frame_channels, axis=-1))
        elif stereo_mode == "LS":
            left, side = frame_channels
            chunk = np.stack([left, left - side], axis=-1)
        elif stereo_mode == "RS":
            side, right = frame_channels
            chunk = np.stack([side + right, right], axis=-1)
        else:  # mid/side: l+r = 2*mid + (side & 1), side = l-r — exact
            mid, side = frame_channels
            m2 = (mid << 1) | (side & 1)
            chunk = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=-1)
        chunks.append(chunk)
    samples = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int64)
    if total and len(samples) > total:
        samples = samples[:total]
    return rate, samples


def with_flac_payload(docs: DataFrame) -> DataFrame:
    """Attach a FLAC payload of each doc's synthesized PCM16 waveform
    (same sample mapping as :func:`with_wav_payload`, so the two
    compressed/uncompressed audio paths share one oracle algebra)."""
    return docs.select("doc_id", "text").mapInPandas(
        _flac_build, schema=_PAYLOAD_SCHEMA
    )


def _pcm16_samples(body: bytes) -> np.ndarray:
    raw = np.frombuffer(body, dtype=np.uint8)
    offs = np.where(np.arange(raw.size) % 2 == 0, 64, -64)
    return (raw.astype(np.int64) - 128 + offs) * 128


def _flac_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            encode_flac(_pcm16_samples(t.encode("utf-8"))) for t in pdf["text"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _flac_stereo_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = []
        for txt in pdf["text"]:
            left = _pcm16_samples(txt.encode("utf-8"))
            right = np.append(left[1:], 0)
            payloads.append(encode_flac_stereo(np.stack([left, right], axis=-1)))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def with_flac_stereo_payload(docs: DataFrame) -> DataFrame:
    """Attach a STEREO mid/side LPC-coded FLAC payload: the left
    channel is the doc's synthesized PCM16 waveform (same mapping as
    :func:`with_wav_payload`), the right channel is the same waveform
    advanced by one sample (zero-padded tail) — two genuinely
    different channels, so mid and side both carry signal through the
    LPC subframes."""
    return docs.select("doc_id", "text").mapInPandas(
        _flac_stereo_build, schema=_PAYLOAD_SCHEMA
    )


def flac_stereo_audio_stats(docs: DataFrame) -> DataFrame:
    """text → stereo mid/side LPC FLAC → :func:`decode_flac` → audio
    stats over the interleaved (l0, r0, l1, r1, ...) sample stream.
    FLAC is lossless and right = left shifted by one sample, so every
    stat is a closed form of the raw text bytes (the SQL oracle):
    duplicated neighbors add no zero-crossings, and amp_sum is
    2*sum|l| - |l0|."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_flac(bytes(p))
                flat = s.ravel().astype(np.int64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(int(flat.size))
                out["sample_rate"].append(int(rate))
                out["amp_sum"].append(int(np.abs(flat).sum()))
                out["peak"].append(int(np.abs(flat).max()) if flat.size else 0)
                out["zero_crossings"].append(
                    int(((flat[:-1] * flat[1:]) < 0).sum()) if flat.size > 1 else 0
                )
            yield pd.DataFrame(out)

    return _fuse(docs, _flac_stereo_build, stats, AUDIO_SCHEMA)


FLAC_STEREO_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    vals AS (
      SELECT doc_id, n_raw,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> ((strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)
                     - 128 + CASE WHEN (i - 1) % 2 = 0 THEN 64 ELSE -64 END)
                    * 128) AS sv
      FROM h
    )
    SELECT doc_id,
           2 * n_raw AS n_samples,
           CAST({FLAC_RATE} AS BIGINT) AS sample_rate,
           CAST(2 * coalesce(list_sum(list_transform(sv, v -> abs(v))), 0)
                - coalesce(abs(sv[1]), 0) AS BIGINT) AS amp_sum,
           CAST(coalesce(list_max(list_transform(sv, v -> abs(v))), 0) AS BIGINT)
             AS peak,
           CAST(coalesce(len(list_filter(generate_series(1, CAST(n_raw AS INTEGER) - 1),
                i -> sv[i] * sv[i + 1] < 0)), 0) AS BIGINT) AS zero_crossings
    FROM vals
"""


def flac_audio_stats(docs: DataFrame) -> DataFrame:
    """text → FLAC (fixed predictor + Rice) → :func:`decode_flac` →
    the same integer-exact audio stats as :func:`audio_stats`; FLAC is
    lossless so the WAV oracle algebra pins this decoder too (an empty
    doc is a zero-frame stream on both paths)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_flac(bytes(p))
                s64 = s.astype(np.int64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(int(s.size))
                out["sample_rate"].append(int(rate))
                out["amp_sum"].append(int(np.abs(s64).sum()))
                out["peak"].append(int(np.abs(s64).max()) if s.size else 0)
                out["zero_crossings"].append(
                    int(((s64[:-1] * s64[1:]) < 0).sum()) if s.size > 1 else 0
                )
            yield pd.DataFrame(out)

    return _fuse(docs, _flac_build, stats, AUDIO_SCHEMA)


def encode_flac_multi(samples: np.ndarray, rate: int = FLAC_RATE) -> bytes:
    """N-channel 16-bit FLAC with INDEPENDENT channels (channel
    assignment code = n-1, RFC 9639 §9.1.3) — each channel its own
    fixed-order-2 subframe, Rice-coded like :func:`encode_flac`.
    ``samples``: (n_samples, n_channels) int array, 1 <= channels <= 8.
    Exercises the decoder's generic multichannel path (the stereo
    fixtures only cover decorrelated 2-channel assignments)."""
    import struct

    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim != 2 or not (1 <= samples.shape[1] <= 8):
        raise ValueError("samples must be (n, channels) with 1..8 channels")
    n, n_ch = samples.shape
    out = bytearray(b"fLaC")
    si = _MSBBitWriter()
    si.put(FLAC_BLOCK, 16)
    si.put(FLAC_BLOCK, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(n_ch - 1, 3)
    si.put(15, 5)
    si.put(n, 36)
    body = si.pad_to_byte() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi in range(0, n, FLAC_BLOCK):
        block = samples[fi:fi + FLAC_BLOCK]
        bs = block.shape[0]
        hdr = _MSBBitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)
        hdr.put(0, 1)
        hdr.put(0b0111, 4)
        hdr.put(0b0000, 4)
        hdr.put(n_ch - 1, 4)   # independent channels
        hdr.put(0b100, 3)
        hdr.put(0, 1)
        header = hdr.pad_to_byte() + _utf8_frame_number(fi // FLAC_BLOCK)
        header += struct.pack(">H", bs - 1)
        header += bytes([_flac_crc8(header)])

        bw = _MSBBitWriter()
        for c in range(n_ch):
            ch = block[:, c]
            order = 2 if bs > 2 else 0
            bw.put(0, 1)
            bw.put(0b001000 | order, 6)
            bw.put(0, 1)
            for w in ch[:order]:
                bw.put(int(w) & 0xFFFF, 16)
            res = ch[2:] - 2 * ch[1:-1] + ch[:-2] if order == 2 else ch
            u = _rice_zigzag(res)
            mean = int(u.mean()) if u.size else 0
            param = min(14, max(0, int(mean).bit_length() - 1))
            bw.put(0b00, 2)
            bw.put(0, 4)
            bw.put(param, 4)
            for val in u:
                q, r = divmod(int(val), 1 << param)
                for _ in range(q):
                    bw.put(0, 1)
                bw.put(1, 1)
                if param:
                    bw.put(r, param)
        frame = header + bw.pad_to_byte()
        frame += struct.pack(">H", _flac_crc16(frame))
        out += frame
    return bytes(out)


def encode_color_jpeg_420_progressive(body: bytes, w_mcus: int = 8) -> bytes:
    """Synthesize a VALID PROGRESSIVE 4:2:0 JPEG with the same image
    model as :func:`encode_gray_jpeg_420` (constant luma blocks from
    ``body``, chroma 128): SOF2 + three scan groups — one
    MCU-interleaved DC-first scan over the subsampled grids (4 Y
    blocks + Cb + Cr per MCU) and one AC-first scan per component
    over its OWN block grid (all-zero bands coded as one EOB per
    block). Exercises the combined progressive+subsampling geometry;
    decode must equal the baseline 4:2:0 encoding of the same body."""
    import struct

    per_row = w_mcus * 4
    n = max(1, -(-len(body) // per_row)) * per_row
    vals = np.frombuffer(body.ljust(n, b"\x00"), dtype=np.uint8)
    h_mcus = n // per_row
    width, height = w_mcus * 16, h_mcus * 16
    if height > 65535 or width > 65535:
        raise ValueError("synthesized image exceeds JPEG dimension limit")

    dc_codes = _huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    zero_dc_code, zero_dc_len = dc_codes[0]
    eob_code, eob_len = ac_codes[0x00]

    # scan 1: DC first, interleaved — per-component predictors
    bw = _BitWriter()
    pred_y = 0
    for m in range(n // 4):
        for b in range(4):
            v = int(vals[m * 4 + b])
            dc = 8 * (v - 128)
            diff = dc - pred_y
            pred_y = dc
            s = _dc_category(diff)
            code, length = dc_codes[s]
            bw.put(code, length)
            if s:
                bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        for _chroma in range(2):
            bw.put(zero_dc_code, zero_dc_len)
    dc_scan = bw.flush()

    def ac_scan(n_blocks: int) -> bytes:
        w = _BitWriter()
        for _ in range(n_blocks):
            w.put(eob_code, eob_len)
        return w.flush()

    y_blocks = (height // 8) * (width // 8)
    c_blocks = (height // 16) * (width // 16)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",
        seg(0xDB, bytes([0x00]) + bytes(64 * [1])),
        seg(0xC2, struct.pack(">BHHB", 8, height, width, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])),
        seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
        seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)),
        seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00])),
        dc_scan,
        seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])),
        ac_scan(y_blocks),
        seg(0xDA, bytes([1, 2, 0x00, 1, 63, 0x00])),
        ac_scan(c_blocks),
        seg(0xDA, bytes([1, 3, 0x00, 1, 63, 0x00])),
        ac_scan(c_blocks),
        b"\xff\xd9",
    ])


def jpeg_progressive_420_decode_stats(docs: DataFrame) -> DataFrame:
    """text → PROGRESSIVE 4:2:0 JPEG (MCU-interleaved DC-first scan
    over subsampled grids + per-component AC scans) →
    :func:`decode_jpeg` → pixel stats. The image model matches
    :func:`jpeg420_decode_stats` exactly (constant luma blocks,
    chroma 128 → RGB=(y,y,y) bit-exact), so the combined
    progressive+subsampling geometry shares the baseline 4:2:0
    oracle algebra."""
    return _fuse(docs, _encode_build(encode_color_jpeg_420_progressive),
                 _jpeg_pixel_stats, DECODE_SCHEMA)


# custom huffman tables for the 12-bit fixture: DC categories 0..15
# (12-bit DC diffs reach magnitude category 15) as 16 five-bit codes,
# and a single 1-bit EOB for the all-zero AC bands
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = list(range(16))
_AC12_BITS = [1] + [0] * 15
_AC12_VALS = [0x00]


def encode_gray12_jpeg(samples: np.ndarray, w_blocks: int = JPEG_W_BLOCKS) -> bytes:
    """Synthesize a VALID 12-bit extended-sequential grayscale JPEG
    (SOF1, precision 12): constant 8x8 blocks, block i's level =
    ``samples[i]`` (0..4095, zero-padded to full block rows). With
    the all-ones quant table a constant block is exactly
    representable, so decode returns the levels bit-exactly as
    uint16. Custom DHTs carry the 12-bit DC category range (0..15)
    the 8-bit tables lack."""
    import struct

    samples = np.asarray(samples, dtype=np.int64).ravel()
    if samples.size and (samples.min() < 0 or samples.max() > 4095):
        raise ValueError("12-bit samples must be in 0..4095")
    n = max(1, -(-max(samples.size, 1) // w_blocks)) * w_blocks
    vals = np.zeros(n, dtype=np.int64)
    vals[: samples.size] = samples
    h_blocks = n // w_blocks
    width, height = w_blocks * 8, h_blocks * 8

    dc_codes = _huffman_codes(_DC12_BITS, _DC12_VALS)
    ac_codes = _huffman_codes(_AC12_BITS, _AC12_VALS)
    eob_code, eob_len = ac_codes[0x00]
    bw = _BitWriter()
    pred = 0
    for v in vals:
        dc = 8 * (int(v) - 2048)
        diff = dc - pred
        pred = dc
        s = _dc_category(diff)
        code, length = dc_codes[s]
        bw.put(code, length)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        bw.put(eob_code, eob_len)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",
        seg(0xDB, bytes([0x10]) + b"".join(
            struct.pack(">H", 1) for _ in range(64))),  # pq=1: 16-bit ones
        seg(0xC1, struct.pack(">BHHB", 12, height, width, 1)
            + bytes([1, 0x11, 0])),
        seg(0xC4, bytes([0x00]) + bytes(_DC12_BITS) + bytes(_DC12_VALS)),
        seg(0xC4, bytes([0x10]) + bytes(_AC12_BITS) + bytes(_AC12_VALS)),
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])),
        scan,
        b"\xff\xd9",
    ])


# ---------------------------------------------------------------------------
# Lossless (SOF3) JPEG — T.81 annex H predictive coding. The reference
# repo has no codec layer (it windows events; see README.md); this backs
# the multimodal ingest tier's "decode opaque binary payloads" surface.
# ---------------------------------------------------------------------------

JPEG_LL_W = 32  # lossless fixture width in samples (one pixel per byte)
_DCLL_BITS = [0, 0, 0, 0, 17] + [0] * 11  # categories 0..16, 5 bits each
_DCLL_VALS = list(range(17))


def _lossless_reconstruct(d: np.ndarray, predictor: int, default: int) -> np.ndarray:
    """Undo T.81 H.1.2 prediction for one component plane of decoded
    differences ``d``. First row chains Ra from the ``default``
    top-left prediction; first column chains Rb; interior samples use
    the scan's predictor. All arithmetic is modulo 2^16 (H.1.2.1);
    linear predictors (1/2/4) vectorize as cumulative sums, 3/4 as
    per-row shifts, 5-7 (integer >>1 nonlinearity) walk per-sample."""
    h, w = d.shape
    r = np.zeros((h, w), dtype=np.int64)
    r[0] = (default + np.cumsum(d[0])) & 0xFFFF
    if h == 1:
        return r
    if predictor == 1:  # Ra
        col0 = (r[0, 0] + np.cumsum(d[1:, 0])) & 0xFFFF
        r[1:, 0] = col0
        if w > 1:
            r[1:, 1:] = (col0[:, None] + np.cumsum(d[1:, 1:], axis=1)) & 0xFFFF
    elif predictor == 2:  # Rb
        r[1:] = (r[0][None, :] + np.cumsum(d[1:], axis=0)) & 0xFFFF
    elif predictor == 3:  # Rc
        for y in range(1, h):
            r[y, 0] = (r[y - 1, 0] + d[y, 0]) & 0xFFFF
            if w > 1:
                r[y, 1:] = (r[y - 1, :-1] + d[y, 1:]) & 0xFFFF
    elif predictor == 4:  # Ra + Rb - Rc
        for y in range(1, h):
            r[y, 0] = (r[y - 1, 0] + d[y, 0]) & 0xFFFF
            if w > 1:
                t = d[y, 1:] + r[y - 1, 1:] - r[y - 1, :-1]
                r[y, 1:] = (r[y, 0] + np.cumsum(t)) & 0xFFFF
    else:  # 5, 6, 7 — predictions with integer right-shifts
        for y in range(1, h):
            r[y, 0] = (r[y - 1, 0] + d[y, 0]) & 0xFFFF
            row_p, row_c = r[y - 1], r[y]
            for x in range(1, w):
                ra, rb, rc = int(row_c[x - 1]), int(row_p[x]), int(row_p[x - 1])
                if predictor == 5:
                    px = ra + ((rb - rc) >> 1)
                elif predictor == 6:
                    px = rb + ((ra - rc) >> 1)
                else:
                    px = (ra + rb) >> 1
                row_c[x] = (px + d[y, x]) & 0xFFFF
    return r


def _jpeg_decode_lossless(
    payload: bytes,
    data_pos: int,
    seg: bytes,
    frame: tuple,
    huff: dict,
    restart_interval: int,
    precision: int,
) -> np.ndarray:
    """Lossless (SOF3) scan decode per T.81 annex H: every sample is a
    huffman-coded difference (DC-style category + EXTEND; category 16
    means +32768 with no extra bits) from a neighbor prediction,
    reconstructed modulo 2^16 and shifted left by the point
    transform. Components interleave one sample per MCU (all sampling
    factors are 1x1 — enforced at SOF3). Returns (h, w) for one
    component or (h, w, n) raw stacked components — T.81 defines no
    color transform for the lossless process."""
    height, width, comps = frame
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise ValueError("truncated SOS header")
    predictor = seg[1 + 2 * ns]
    pt = seg[3 + 2 * ns] & 0x0F
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    if pt >= precision:
        raise ValueError("point transform must be below sample precision")
    if restart_interval:
        raise NotImplementedError(
            "restart markers in lossless JPEG are not implemented")
    if ns != len(comps):
        raise NotImplementedError(
            "multi-scan lossless JPEG is not implemented")
    tables = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        if not any(x[0] == cs for x in comps):
            raise ValueError(f"SOS references unknown component {cs}")
        t = huff.get((0, tt >> 4))
        if t is None:
            raise ValueError("SOS references an undefined table")
        tables.append(t)
    br = _BitReader(payload, data_pos)
    # fast path: a table whose codes are all one length L decodes as a
    # fixed-width read (one bits(L) + dict hit per symbol instead of a
    # bit-by-bit tree walk) — our fixture's table is exactly that
    fixed = []
    for t in tables:
        lengths = {ln for (ln, _) in t.codes}
        fixed.append(lengths.pop() if len(lengths) == 1 else None)
    out = [[] for _ in range(ns)]
    bits = br.bits
    ext = _extend
    for _ in range(height * width):
        for ci in range(ns):
            fl = fixed[ci]
            if fl is not None:
                s = tables[ci].codes.get((fl, bits(fl)))
                if s is None:
                    raise ValueError("invalid huffman code in entropy segment")
            else:
                s = _decode_symbol(br, tables[ci])
            if s == 16:
                out[ci].append(32768)
            elif s:
                out[ci].append(ext(bits(s), s))
            else:
                out[ci].append(0)
    diffs = np.array(out, dtype=np.int64).reshape(ns, height, width)
    default = 1 << (precision - pt - 1)
    planes = [
        (_lossless_reconstruct(diffs[ci], predictor, default) << pt) & 0xFFFF
        for ci in range(ns)
    ]
    dtype = np.uint8 if precision <= 8 else np.uint16
    if ns == 1:
        return planes[0].astype(dtype)
    return np.stack(planes, axis=-1).astype(dtype)


def encode_lossless_jpeg(
    samples: np.ndarray,
    width: int = JPEG_LL_W,
    predictor: int = 1,
    precision: int = 8,
    pt: int = 0,
) -> bytes:
    """Synthesize a VALID lossless (SOF3) grayscale JPEG: one sample
    per pixel in raster order, zero-padded to full ``width``-sample
    rows. Lossless huffman coding round-trips any sample array
    bit-exactly, so a SQL oracle can rebuild pixel stats directly
    from the raw bytes — same pattern as the PPM/WAV/Y4M builders.
    ``pt``-point-transformed fixtures require samples that are
    multiples of ``2^pt`` (so the decode shift restores them)."""
    import struct

    samples = np.asarray(samples, dtype=np.int64).ravel()
    maxv = (1 << precision) - 1
    if samples.size and (samples.min() < 0 or samples.max() > maxv):
        raise ValueError(f"samples must be in 0..{maxv}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    if pt and samples.size and (samples & ((1 << pt) - 1)).any():
        raise ValueError("point-transformed fixtures need multiples of 2^pt")
    n = max(1, -(-max(samples.size, 1) // width)) * width
    vals = np.zeros(n, dtype=np.int64)
    vals[: samples.size] = samples
    grid = (vals >> pt).reshape(-1, width)
    h, w = grid.shape
    default = 1 << (precision - pt - 1)
    codes = _huffman_codes(_DCLL_BITS, _DCLL_VALS)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            if y == 0:
                px = default if x == 0 else int(grid[0, x - 1])
            elif x == 0:
                px = int(grid[y - 1, 0])
            else:
                ra = int(grid[y, x - 1])
                rb = int(grid[y - 1, x])
                rc = int(grid[y - 1, x - 1])
                px = (ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
                      rb + ((ra - rc) >> 1), (ra + rb) >> 1)[predictor - 1]
            d = (int(grid[y, x]) - px) % 65536
            if d > 32768:
                d -= 65536
            if d == 32768:
                code, length = codes[16]
                bw.put(code, length)
            else:
                s = _dc_category(d)
                code, length = codes[s]
                bw.put(code, length)
                if s:
                    bw.put(d if d > 0 else d + (1 << s) - 1, s)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",
        seg(0xC3, struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])),
        seg(0xC4, bytes([0x00]) + bytes(_DCLL_BITS) + bytes(_DCLL_VALS)),
        seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt])),
        scan,
        b"\xff\xd9",
    ])


def jpeg_lossless_decode_stats(docs: DataFrame) -> DataFrame:
    """text → lossless (SOF3) JPEG, one pixel per raw UTF-8 byte →
    :func:`decode_jpeg` (annex-H predictive huffman path) → per-image
    pixel stats, mirroring :func:`jpeg_decode_stats`. Lossless decode
    is bit-exact by construction, so the oracle is the identity
    algebra on the raw bytes zero-padded to full JPEG_LL_W-sample
    rows. Partition-local mapInPandas — no shuffle, scales with the
    documents scan."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_pixel_bytes": [], "pixel_sum": [], "zero_bin": []}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                flat = decode_jpeg(encode_lossless_jpeg(raw)).ravel()
                out["doc_id"].append(doc_id)
                out["n_pixel_bytes"].append(int(flat.size))
                out["pixel_sum"].append(int(flat.astype(np.int64).sum()))
                out["zero_bin"].append(int((flat % HIST_BINS == 0).sum()))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(stats, schema=DECODE_SCHEMA)


def jpeg_arith_lossless_decode_stats(docs: DataFrame) -> DataFrame:
    """text → arithmetic-coded lossless (SOF11) JPEG → the
    :func:`_jpeg_decode_arith_lossless` QM predictor path → pixel
    stats. SOF11 decode is bit-exact on arbitrary bytes (pinned
    against the huffman SOF3 twin in tests/test_properties.py), so
    the certified identity-algebra JPEG_LOSSLESS_DECODE_STATS_ORACLE
    pins this path unchanged. Partition-local mapInPandas — no
    shuffle, scales with the documents scan."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_pixel_bytes": [], "pixel_sum": [], "zero_bin": []}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                flat = decode_jpeg(encode_lossless_jpeg_arith(raw)).ravel()
                out["doc_id"].append(doc_id)
                out["n_pixel_bytes"].append(int(flat.size))
                out["pixel_sum"].append(int(flat.astype(np.int64).sum()))
                out["zero_bin"].append(int((flat % HIST_BINS == 0).sum()))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(stats, schema=DECODE_SCHEMA)


JPEG_LOSSLESS_DECODE_STATS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, octet_length(encode(text)) AS n_raw,
             lower(hex(encode(text))) AS hx
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_raw, hx,
             greatest(1, CAST(ceil(n_raw / CAST({JPEG_LL_W} AS DOUBLE)) AS BIGINT))
               * {JPEG_LL_W} AS n_px
      FROM h
    ),
    vals AS (
      SELECT doc_id, n_raw, n_px,
             list_transform(generate_series(1, CAST(n_raw AS INTEGER)),
               i -> (strpos('0123456789abcdef', substring(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1)) AS bv
      FROM dims
    )
    SELECT doc_id,
           n_px AS n_pixel_bytes,
           CAST(coalesce(list_sum(bv), 0) AS BIGINT) AS pixel_sum,
           CAST(len(list_filter(bv, v -> v % {HIST_BINS} = 0))
                + (n_px - n_raw) AS BIGINT) AS zero_bin
    FROM vals
"""


# ---------------------------------------------------------------------------
# Arithmetic-coded (SOF9) JPEG — the ITU-T T.81 QM coder (annexes D/E/F).
# The reference repo has no codec layer; this completes the JPEG matrix for
# the multimodal ingest tier (baseline/progressive/12-bit/lossless done
# above). State table = T.81 Table D.3 (Qe, NMPS, NLPS, SWITCH); row 113 is
# the conventional self-looping fixed-estimate state used for AC signs.
# Conformance is pinned by tests/test_properties.py against the system
# libjpeg (transcode-to-arithmetic + coefficient dump) when available.
# ---------------------------------------------------------------------------

_ARITAB = [
    (0x5a1d, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080b, 4, 18, 0),
    (0x03d8, 5, 20, 0), (0x01da, 6, 23, 0), (0x00e5, 7, 25, 0), (0x006f, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001a, 10, 33, 0), (0x000d, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5a7f, 15, 15, 1), (0x3f25, 16, 36, 0),
    (0x2cf2, 17, 38, 0), (0x207c, 18, 39, 0), (0x17b9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0cef, 21, 43, 0), (0x09a1, 22, 45, 0), (0x072f, 23, 46, 0), (0x055c, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01b1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00f5, 30, 57, 0), (0x00b7, 31, 59, 0), (0x008a, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004e, 34, 63, 0), (0x003b, 35, 32, 0), (0x002c, 9, 33, 0),
    (0x5ae1, 37, 37, 1), (0x484c, 38, 64, 0), (0x3a0d, 39, 65, 0), (0x2ef1, 40, 67, 0),
    (0x261f, 41, 68, 0), (0x1f33, 42, 69, 0), (0x19a8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0e74, 46, 74, 0), (0x0bfb, 47, 75, 0), (0x09f8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05cd, 51, 48, 0), (0x04de, 52, 50, 0),
    (0x040f, 53, 50, 0), (0x0363, 54, 51, 0), (0x02d4, 55, 52, 0), (0x025c, 56, 53, 0),
    (0x01f8, 57, 54, 0), (0x01a4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00f6, 61, 58, 0), (0x00cb, 62, 59, 0), (0x00ab, 63, 61, 0), (0x008f, 32, 61, 0),
    (0x5b12, 65, 65, 1), (0x4d04, 66, 80, 0), (0x412c, 67, 81, 0), (0x37d8, 68, 82, 0),
    (0x2fe8, 69, 83, 0), (0x293c, 70, 84, 0), (0x2379, 71, 86, 0), (0x1edf, 72, 87, 0),
    (0x1aa9, 73, 87, 0), (0x174e, 74, 72, 0), (0x1424, 75, 72, 0), (0x119c, 76, 74, 0),
    (0x0f6b, 77, 74, 0), (0x0d51, 78, 75, 0), (0x0bb6, 79, 77, 0), (0x0a40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4d1c, 82, 88, 0), (0x438e, 83, 89, 0), (0x3bdd, 84, 90, 0),
    (0x34ee, 85, 91, 0), (0x2eae, 86, 92, 0), (0x299a, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4ca9, 90, 95, 0), (0x44d9, 91, 96, 0), (0x3e22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32b4, 94, 99, 0), (0x2e17, 86, 93, 0), (0x56a8, 96, 95, 1),
    (0x4f46, 97, 101, 0), (0x47e5, 98, 102, 0), (0x41cf, 99, 103, 0), (0x3c3d, 100, 104, 0),
    (0x375e, 93, 99, 0), (0x5231, 102, 105, 0), (0x4c0f, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415e, 99, 103, 0), (0x5627, 106, 105, 1), (0x50e7, 107, 108, 0), (0x4b85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504f, 107, 111, 0), (0x5a10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59eb, 111, 112, 1), (0x5a1d, 113, 113, 0),
]


class _QMDecoder:
    """T.81 annex-E QM arithmetic decoder, software conventions: the
    MPS subinterval sits at the BOTTOM of [0, A), so a decision is MPS
    when Chigh < A - Qe. Entropy bytes use JPEG byte stuffing (0xFF00
    = literal 0xFF); once a marker or the end of data is reached the
    decoder feeds zero bytes (T.81 F.2.2.3). Context bins are
    two-item lists [state_index, mps]."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.bp = pos
        self.done = False
        # INITDEC: three bytes prime the compare window (the encoder's
        # INITENC starts CT=11 with byteout after the shift, so byte
        # boundaries sit 8 bits below the 16-bit interval grain);
        # conformance with libjpeg's codestream is pinned decision-by-
        # decision in tests/test_properties.py
        b0, b1, b2 = self._fetch(), self._fetch(), self._fetch()
        self.c = ((b0 << 16) | (b1 << 8) | b2) << 8
        self.ct = 8
        self.a = 0x10000

    def _fetch(self) -> int:
        if self.done:
            return 0
        d = self.data
        if self.bp >= len(d):
            self.done = True
            return 0
        b = d[self.bp]
        if b == 0xFF:
            # only the immediate two-byte pair FF 00 is a stuffed
            # literal (T.81 F.2.2.3); FF followed by anything else —
            # a marker, another FF, or truncation — ends the entropy
            # segment and the decoder feeds zeros. Fill FF bytes only
            # legally precede markers, so FF FF is never data.
            j = self.bp + 1
            if j < len(d) and d[j] == 0x00:
                self.bp = j + 1
                return 0xFF
            self.done = True
            return 0
        self.bp += 1
        return b

    def decode(self, st: list) -> int:
        qe, nmps, nlps, sw = _ARITAB[st[0]]
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return st[1]
            # MPS path needing renorm: conditional exchange (F.26)
            if self.a < qe:
                d = 1 - st[1]
                if sw:
                    st[1] = 1 - st[1]
                st[0] = nlps
            else:
                d = st[1]
                st[0] = nmps
        else:
            self.c -= self.a << 16
            # LPS path: conditional exchange (F.27)
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = 1 - st[1]
                if sw:
                    st[1] = 1 - st[1]
                st[0] = nlps
            self.a = qe
        while True:  # RENORMD (F.28)
            if self.ct == 0:
                self.c = (self.c + (self._fetch() << 8)) & 0xFFFFFFFF
                self.ct = 8
            self.a = (self.a << 1) & 0x1FFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


def _jpeg_decode_arith_scan(
    payload: bytes,
    data_pos: int,
    seg: bytes,
    frame: tuple,
    qt: dict,
    dc_cond: dict,
    ac_cond: dict,
    restart_interval: int,
    precision: int,
) -> np.ndarray:
    """Sequential arithmetic-coded (SOF9) scan decode per T.81 F.2.4:
    DC differences and AC coefficients are binary decision sequences
    on adaptive contexts (49 DC bins — 5 conditioning classes of 4
    plus the shared magnitude tree; 245 AC bins — SE/S0/X1 per
    spectral position plus low/high magnitude trees split at Kx), all
    driven by the QM coder. AC signs use the conventional
    self-looping fixed-estimate state. Fills per-component
    coefficient grids and reuses the shared dequant/IDCT/upsample
    reconstruction."""
    height, width, comps = frame
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise ValueError("truncated SOS header")
    scan = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        ci = next((i for i, x in enumerate(comps) if x[0] == cs), None)
        if ci is None:
            raise ValueError(f"SOS references unknown component {cs}")
        scan.append((ci, tt >> 4, tt & 0x0F))
    if ns != len(comps):
        raise NotImplementedError(
            "multi-scan sequential arithmetic JPEG is not implemented")
    for (_, _, _, tq) in comps:
        if tq not in qt:
            raise ValueError("missing quantization table")

    geo, _, _ = _jpeg_prog_geometry(comps, height, width)
    coef = [
        np.zeros((g["pad_bh"], g["pad_bw"], 64), dtype=np.int64) for g in geo
    ]
    max_h = max(h for (_, h, _, _) in comps)
    max_v = max(v for (_, _, v, _) in comps)
    mcus_x = -(-width // (8 * max_h))
    mcus_y = -(-height // (8 * max_v))

    def fresh_stats():
        dc = {t: [[0, 0] for _ in range(64)] for (_, t, _) in scan}
        ac = {t: [[0, 0] for _ in range(256)] for (_, _, t) in scan}
        return dc, ac

    dc_stats, ac_stats = fresh_stats()
    fixed = [113, 0]
    last_dc = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    dec = _QMDecoder(payload, data_pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # re-init coder + statistics at each restart (F.2.4.3)
                p = dec.bp
                while p + 1 < len(payload) and not (
                    payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(payload):
                    raise ValueError("missing restart marker")
                dec = _QMDecoder(payload, p + 2)
                dc_stats, ac_stats = fresh_stats()
                fixed = [113, 0]
                last_dc = [0] * len(comps)
                dc_ctx = [0] * len(comps)
            for ci, tdc, tac in scan:
                # sampling factors come from the frame component the
                # SOS entry RESOLVED to, not scan position — T.81
                # B.2.3 mandates frame order, but a malformed stream
                # must not silently pick up the wrong (h, v)
                _, h_c, v_c, _ = comps[ci]
                l_thr, u_thr = dc_cond.get(tdc, (0, 1))
                kx = ac_cond.get(tac, 5)
                dst = dc_stats[tdc]
                ast = ac_stats[tac]
                for blk in range(h_c * v_c):
                    by = my * v_c + blk // h_c
                    bx = mx * h_c + blk % h_c
                    zz = coef[ci][by, bx]
                    diff, dc_ctx[ci] = _arith_dc_diff(
                        dec, dst, dc_ctx[ci], l_thr, u_thr)
                    last_dc[ci] += diff
                    zz[0] = last_dc[ci]
                    _arith_ac_band(dec, ast, fixed, zz, 1, 63, kx, 0)
            mcu += 1
    quants = [qt[tq] for (_, _, _, tq) in comps]
    return _jpeg_reconstruct_progressive(
        coef, quants, comps, height, width, precision)


class _QMEncoder:
    """T.81 annex-D QM arithmetic encoder, the exact mirror of
    :class:`_QMDecoder` (INITENC A=0x10000, C=0, CT=11; byteout takes
    ``C >> 19`` after the renormalization shift; stacked-0xFF carry
    resolution per D.1.8; every emitted 0xFF byte-stuffs a 0x00).
    Cross-conformance with libjpeg's coder is pinned in
    tests/test_properties.py."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending committed byte (may absorb a carry)
        self.sc = 0       # stacked 0xFF bytes awaiting carry resolution
        self.out = bytearray()

    def _stuff(self, b: int) -> None:
        self.out.append(b & 0xFF)
        if (b & 0xFF) == 0xFF:
            self.out.append(0x00)

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the pending byte; stacked 0xFFs roll
            # over to 0x00
            if self.buffer >= 0:
                self._stuff(self.buffer + 1)
            for _ in range(self.sc):
                self._stuff(0x00)
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1
        else:
            if self.buffer >= 0:
                self._stuff(self.buffer)
            for _ in range(self.sc):
                self._stuff(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def encode(self, st: list, d: int) -> None:
        qe, nmps, nlps, sw = _ARITAB[st[0]]
        self.a -= qe
        if d == st[1]:  # MPS (bottom subinterval)
            if self.a & 0x8000:
                return
            if self.a < qe:  # conditional exchange
                self.c += self.a
                self.a = qe
            st[0] = nmps
            self._renorm()
        else:  # LPS (top subinterval)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            # else conditional exchange: keep the bottom interval
            if sw:
                st[1] = 1 - st[1]
            st[0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # D.1.8: pick the in-interval code point with the most
        # trailing zeros, then drain the register
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._stuff(self.buffer + 1)
            for _ in range(self.sc):
                self._stuff(0x00)
        else:
            if self.buffer >= 0:
                self._stuff(self.buffer)
            for _ in range(self.sc):
                self._stuff(0xFF)
        self.sc = 0
        if self.c & 0x7FFF800:
            self._stuff((self.c >> 19) & 0xFF)
            if self.c & 0x7F800:
                self._stuff((self.c >> 11) & 0xFF)
        return bytes(self.out)


def encode_gray_jpeg_arith(body: bytes, w_blocks: int = JPEG_W_BLOCKS) -> bytes:
    """Synthesize a VALID arithmetic-coded (SOF9) grayscale JPEG with
    the same constant-block image model as :func:`encode_gray_jpeg`
    (block i's gray level = ``body[i]``, all-ones quant table), so
    the decoded image is bit-identical to the baseline fixture's and
    the certified closed-form byte algebra pins the arithmetic path.
    DC differences are coded as T.81 F.1.4.4.1 decision sequences
    (default conditioning L=0, U=1); every block ends with an
    immediate EOB decision."""
    import struct

    n = max(1, -(-max(len(body), 1) // w_blocks)) * w_blocks
    vals = bytes(body) + b"\x00" * (n - len(body))
    h_blocks = n // w_blocks
    width, height = w_blocks * 8, h_blocks * 8

    enc = _QMEncoder()
    dc_bins = [[0, 0] for _ in range(64)]
    ac_bins = [[0, 0] for _ in range(256)]
    last = 0
    dc_ctx = 0
    for v in vals:
        dc = 8 * (int(v) - 128)
        diff = dc - last
        last = dc
        base = dc_ctx
        if diff == 0:
            enc.encode(dc_bins[base], 0)
            dc_ctx = 0
        else:
            enc.encode(dc_bins[base], 1)
            sign = 1 if diff < 0 else 0
            enc.encode(dc_bins[base + 1], sign)
            sz = abs(diff) - 1
            if sz == 0:
                enc.encode(dc_bins[base + 2 + sign], 0)
                m, xi = 0, base + 2 + sign
            else:
                enc.encode(dc_bins[base + 2 + sign], 1)
                m, xi = 1, 20
                while (m << 1) <= sz:
                    enc.encode(dc_bins[xi], 1)
                    m <<= 1
                    xi += 1
                enc.encode(dc_bins[xi], 0)
            # conditioning classification with default L=0, U=1
            dc_ctx = (12 if m > 1 else 4) + 4 * sign
            mb = xi + 14
            mi = m
            while mi > 1:
                mi >>= 1
                enc.encode(dc_bins[mb], 1 if (sz & mi) else 0)
        enc.encode(ac_bins[0], 1)  # EOB at k=1: constant block
    scan = enc.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",
        seg(0xDB, bytes([0x00]) + bytes([1] * 64)),
        seg(0xC9, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])),
        seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05])),  # DC L=0 U=1; AC Kx=5
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])),
        scan,
        b"\xff\xd9",
    ])


def _arith_dc_diff(dec, dst, base, l_thr, u_thr):
    """Decode one DC difference (T.81 F.2.4.1 decision tree) on the
    conditioning contexts at ``base``; returns (diff, new_context)."""
    if dec.decode(dst[base]) == 0:
        return 0, 0
    sign = dec.decode(dst[base + 1])
    m = dec.decode(dst[base + 2 + sign])
    xi = base + 2 + sign
    if m:
        xi = 20
        while dec.decode(dst[xi]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            xi += 1
    if m < ((1 << l_thr) >> 1):
        ctx = 0
    elif m > ((1 << u_thr) >> 1):
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    v = m
    mi, mb = m, xi + 14
    while mi > 1:
        mi >>= 1
        if dec.decode(dst[mb]):
            v |= mi
    v += 1
    return (-v if sign else v), ctx


def _arith_lossless_diff(dec, dst, ca, cb, l_thr, u_thr):
    """Decode one lossless prediction difference (T.81 annex H.1.1):
    the DC decision tree on a TWO-dimensional conditioning context —
    ``ca``/``cb`` are the 5-way classifications (0 zero, 1/2 small
    +/-, 3/4 large +/-) of the left and upper neighbors' differences,
    giving 25 context groups of 4 bins; the magnitude tree
    (X2..X15 / M2..M15) is selected by whether Db is large
    (Table H.1's two X/M conditioning states). Returns
    ``(diff, class)`` with the class feeding the neighbors' contexts.
    Statistics layout: bins [0,100) = 25 contexts x (zero, sign, sp,
    sn); [100,129) / [129,158) = small-Db / large-Db X+M trees."""
    base = 4 * (5 * cb + ca)
    if dec.decode(dst[base]) == 0:
        return 0, 0
    sign = dec.decode(dst[base + 1])
    m = dec.decode(dst[base + 2 + sign])
    xi = base + 2 + sign
    if m:
        xi = 100 + 29 * (1 if cb >= 3 else 0)
        while dec.decode(dst[xi]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic lossless magnitude overflow")
            xi += 1
    if m < ((1 << l_thr) >> 1):
        cls = 0
    elif m > ((1 << u_thr) >> 1):
        cls = 3 + sign
    else:
        cls = 1 + sign
    v = m
    mi, mb = m, xi + 14
    while mi > 1:
        mi >>= 1
        if dec.decode(dst[mb]):
            v |= mi
    v += 1
    return (-v if sign else v), cls


def _jpeg_decode_arith_lossless(
    payload: bytes,
    data_pos: int,
    seg: bytes,
    frame: tuple,
    dc_cond: dict,
    restart_interval: int,
    precision: int,
) -> np.ndarray:
    """Arithmetic-coded lossless (SOF11) scan decode — the last cell
    of the T.81 process matrix: the annex-H predictor walk of the
    SOF3 path driven by the annex-D QM coder of the SOF9 path, with
    the H.1.1 two-neighbor conditioning model
    (:func:`_arith_lossless_diff`). Statistics areas are per DC
    conditioning-table destination, as in the sequential coder;
    components interleave one sample per MCU (sampling enforced 1x1
    at SOF)."""
    height, width, comps = frame
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise ValueError("truncated SOS header")
    predictor = seg[1 + 2 * ns]
    pt = seg[3 + 2 * ns] & 0x0F
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    if pt >= precision:
        raise ValueError("point transform must be below sample precision")
    if restart_interval:
        raise NotImplementedError(
            "restart markers in lossless JPEG are not implemented")
    if ns != len(comps):
        raise NotImplementedError(
            "multi-scan lossless JPEG is not implemented")
    tdcs, conds = [], []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        if not any(x[0] == cs for x in comps):
            raise ValueError(f"SOS references unknown component {cs}")
        tdcs.append(tt >> 4)
        conds.append(dc_cond.get(tt >> 4, (0, 1)))
    stats = {t: [[0, 0] for _ in range(158)] for t in set(tdcs)}
    dec = _QMDecoder(payload, data_pos)
    diffs = np.zeros((ns, height, width), dtype=np.int64)
    above = [np.zeros(width, dtype=np.int64) for _ in range(ns)]
    for y in range(height):
        cur = [np.zeros(width, dtype=np.int64) for _ in range(ns)]
        for x in range(width):
            for ci in range(ns):
                ca = int(cur[ci][x - 1]) if x else 0
                cb = int(above[ci][x])
                l_thr, u_thr = conds[ci]
                d, cls = _arith_lossless_diff(
                    dec, stats[tdcs[ci]], ca, cb, l_thr, u_thr)
                diffs[ci, y, x] = d
                cur[ci][x] = cls
        above = cur
    default = 1 << (precision - pt - 1)
    planes = [
        (_lossless_reconstruct(diffs[ci], predictor, default) << pt) & 0xFFFF
        for ci in range(ns)
    ]
    dtype = np.uint8 if precision <= 8 else np.uint16
    if ns == 1:
        return planes[0].astype(dtype)
    return np.stack(planes, axis=-1).astype(dtype)


def encode_lossless_jpeg_arith(
    samples: np.ndarray,
    width: int = JPEG_LL_W,
    predictor: int = 1,
    precision: int = 8,
    pt: int = 0,
) -> bytes:
    """Synthesize a VALID arithmetic-coded lossless (SOF11) grayscale
    JPEG: the same raster/prediction model as
    :func:`encode_lossless_jpeg`, entropy-coded with the QM coder on
    the H.1.1 two-neighbor contexts — the exact mirror of
    :func:`_jpeg_decode_arith_lossless`. Ground truth for the decode
    tests is the huffman SOF3 twin of the same samples (lossless
    round-trips bit-exactly through BOTH entropy coders)."""
    import struct

    samples = np.asarray(samples, dtype=np.int64).ravel()
    maxv = (1 << precision) - 1
    if samples.size and (samples.min() < 0 or samples.max() > maxv):
        raise ValueError(f"samples must be in 0..{maxv}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    if pt and samples.size and (samples & ((1 << pt) - 1)).any():
        raise ValueError("point-transformed fixtures need multiples of 2^pt")
    n = max(1, -(-max(samples.size, 1) // width)) * width
    vals = np.zeros(n, dtype=np.int64)
    vals[: samples.size] = samples
    grid = (vals >> pt).reshape(-1, width)
    h, w = grid.shape
    default = 1 << (precision - pt - 1)
    l_thr, u_thr = 0, 1
    enc = _QMEncoder()
    stats = [[0, 0] for _ in range(158)]
    above = np.zeros(w, dtype=np.int64)
    for y in range(h):
        cur = np.zeros(w, dtype=np.int64)
        for x in range(w):
            if y == 0:
                px = default if x == 0 else int(grid[0, x - 1])
            elif x == 0:
                px = int(grid[y - 1, 0])
            else:
                ra = int(grid[y, x - 1])
                rb = int(grid[y - 1, x])
                rc = int(grid[y - 1, x - 1])
                px = (ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
                      rb + ((ra - rc) >> 1), (ra + rb) >> 1)[predictor - 1]
            d = (int(grid[y, x]) - px) % 65536
            if d > 32768:
                d -= 65536
            ca = int(cur[x - 1]) if x else 0
            cb = int(above[x])
            base = 4 * (5 * cb + ca)
            if d == 0:
                enc.encode(stats[base], 0)
                cls = 0
            else:
                enc.encode(stats[base], 1)
                sign = 1 if d < 0 else 0
                enc.encode(stats[base + 1], sign)
                sz = abs(d) - 1
                if sz == 0:
                    enc.encode(stats[base + 2 + sign], 0)
                    m = 0
                    xi = base + 2 + sign
                else:
                    enc.encode(stats[base + 2 + sign], 1)
                    m = 1
                    xi = 100 + 29 * (1 if cb >= 3 else 0)
                    while (m << 1) <= sz:
                        enc.encode(stats[xi], 1)
                        m <<= 1
                        xi += 1
                    enc.encode(stats[xi], 0)
                if m < ((1 << l_thr) >> 1):
                    cls = 0
                elif m > ((1 << u_thr) >> 1):
                    cls = 3 + sign
                else:
                    cls = 1 + sign
                mb = xi + 14
                mi = m
                while mi > 1:
                    mi >>= 1
                    enc.encode(stats[mb], 1 if (sz & mi) else 0)
            cur[x] = cls
        above = cur
    scan = enc.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return b"".join([
        b"\xff\xd8",
        seg(0xCB, struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])),
        seg(0xCC, bytes([0x00, (u_thr << 4) | l_thr])),
        seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt])),
        scan,
        b"\xff\xd9",
    ])


def _arith_ac_band(dec, ast, fixed, zz, k_start, k_end, kx, al):
    """Decode AC coefficients over [k_start, k_end] (T.81 F.2.4.2 /
    G.2 first pass): per-position EOB decision, zero-run walk, fixed-
    estimate sign, magnitude tree split at Kx; values shifted << al
    into the zigzag store."""
    k = k_start
    while k <= k_end:
        sta = 3 * (k - 1)
        if dec.decode(ast[sta]):  # EOB
            break
        while dec.decode(ast[sta + 1]) == 0:
            k += 1
            if k > k_end:
                raise ValueError("arithmetic AC run past block end")
            sta = 3 * (k - 1)
        sign = dec.decode(fixed)
        m = dec.decode(ast[sta + 2])
        xi = sta + 2
        if m:
            if dec.decode(ast[sta + 2]):
                m = 2
                xi = 189 if k <= kx else 217
                while dec.decode(ast[xi]):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    xi += 1
        v = m
        mi, mb = m, xi + 14
        while mi > 1:
            mi >>= 1
            if dec.decode(ast[mb]):
                v |= mi
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _jpeg_decode_arith_progressive_scan(
    payload: bytes,
    pos: int,
    seg: bytes,
    comps: list,
    dc_cond: dict,
    ac_cond: dict,
    prog_coef: list,
    restart_interval: int,
    height: int,
    width: int,
) -> int:
    """Decode ONE progressive ARITHMETIC scan (SOF10; T.81 G.2 with
    the annex-G arithmetic decision procedures) into the per-component
    coefficient store and return the payload position after its
    entropy data. DC first scans run the sequential DC decision tree
    with diffs accumulated and shifted << Al; DC refinement appends
    one fixed-estimate decision bit per block; AC first scans are the
    sequential per-position AC procedure over [Ss, Se] with values
    << Al; AC refinement walks the band with the three per-position
    contexts — EOB beyond the previous stage's end-of-block,
    newly-nonzero (sign via the fixed estimate), and correction-bit.
    The QM decoder and every statistics bin re-initialize per scan
    and per restart interval."""
    ns = seg[0]
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah_al = seg[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0x0F
    if ss > se or se > 63:
        raise ValueError("invalid spectral selection band")
    scan_comps = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        idx = next((i for i, x in enumerate(comps) if x[0] == cs), None)
        if idx is None:
            raise ValueError(f"SOS references unknown component {cs}")
        scan_comps.append((idx, tt >> 4, tt & 0x0F))
    geo, mcu_rows, mcu_cols = _jpeg_prog_geometry(comps, height, width)

    state: dict = {}

    def reset_stats() -> None:
        state["dc"] = {
            t: [[0, 0] for _ in range(64)] for (_, t, _) in scan_comps}
        state["ac"] = {
            t: [[0, 0] for _ in range(256)] for (_, _, t) in scan_comps}
        state["fixed"] = [113, 0]
        state["last"] = [0] * ns
        state["ctx"] = [0] * ns

    reset_stats()
    dec = _QMDecoder(payload, pos)

    def at_restart(d: "_QMDecoder") -> "_QMDecoder":
        p = d.bp
        while p + 1 < len(payload) and not (
            payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
        ):
            p += 1
        if p + 1 >= len(payload):
            raise ValueError("missing restart marker")
        reset_stats()
        return _QMDecoder(payload, p + 2)

    if ss == 0:  # DC scan (Se must be 0)
        if se != 0:
            raise ValueError("DC scan must have Se = 0")

        def dc_one(si: int, coef) -> None:
            if ah == 0:
                tdc = scan_comps[si][1]
                l_thr, u_thr = dc_cond.get(tdc, (0, 1))
                diff, state["ctx"][si] = _arith_dc_diff(
                    dec, state["dc"][tdc], state["ctx"][si], l_thr, u_thr)
                state["last"][si] += diff
                coef[0] = state["last"][si] << al
            else:  # refinement: one fixed-estimate decision per block
                if dec.decode(state["fixed"]):
                    coef[0] |= 1 << al

        if ns > 1:
            unit = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    if restart_interval and unit and unit % restart_interval == 0:
                        dec = at_restart(dec)
                    unit += 1
                    for si, (idx, _, _) in enumerate(scan_comps):
                        g = geo[idx]
                        for by in range(g["v"]):
                            for bx in range(g["h"]):
                                dc_one(si, prog_coef[idx][
                                    my * g["v"] + by, mx * g["h"] + bx])
        else:
            idx = scan_comps[0][0]
            g = geo[idx]
            unit = 0
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        dec = at_restart(dec)
                    unit += 1
                    dc_one(0, prog_coef[idx][by, bx])
    else:  # AC scan: single component
        if ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        idx, _, tac = scan_comps[0]
        kx = ac_cond.get(tac, 5)
        g = geo[idx]
        store = prog_coef[idx]
        p1 = 1 << al
        m1v = -1 << al
        for b in range(g["bh"] * g["bw"]):
            if restart_interval and b and b % restart_interval == 0:
                dec = at_restart(dec)
            zz = store[b // g["bw"], b % g["bw"]]
            ast = state["ac"][tac]
            if ah == 0:  # first pass for this band
                _arith_ac_band(dec, ast, state["fixed"], zz, ss, se, kx, al)
            else:  # refinement (T.81 G.2 correction decisions)
                kex = 0
                for kk in range(se, 0, -1):
                    if zz[kk]:
                        kex = kk
                        break
                k = ss
                while k <= se:
                    sta = 3 * (k - 1)
                    if k > kex and dec.decode(ast[sta]):
                        break  # EOB for the refinement stage
                    while True:
                        if zz[k]:
                            if dec.decode(ast[sta + 2]):
                                zz[k] += m1v if zz[k] < 0 else p1
                            break
                        if dec.decode(ast[sta + 1]):
                            zz[k] = m1v if dec.decode(state["fixed"]) else p1
                            break
                        k += 1
                        if k > se:
                            raise ValueError(
                                "arithmetic refinement past the band")
                        sta = 3 * (k - 1)
                    k += 1
    # the flush may leave unread tail bytes: advance to the next marker
    p = dec.bp
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if payload[p + 1] == 0xFF:
                p += 1
                continue
            return p
        p += 1
    raise ValueError("truncated JPEG: scan terminator missing")
