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


def with_ppm_payload(docs: DataFrame) -> DataFrame:
    """Attach a VALID binary PPM (P6) payload built from each doc's
    UTF-8 bytes (width ``PPM_W``, zero-padded to full rows) — so the
    real decoder has genuine images to decode without shipping a
    corpus. Built in ``mapInPandas`` (partition-local, no shuffle),
    exactly where a production pipeline's transcoder would sit."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row_bytes = PPM_W * 3
        for pdf in batches:
            payloads = []
            for txt in pdf["text"]:
                body = txt.encode("utf-8")
                h = max(1, -(-len(body) // row_bytes))
                body = body.ljust(h * row_bytes, b"\x00")
                payloads.append(b"P6\n%d %d\n255\n" % (PPM_W, h) + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )


def decode_stats(docs: DataFrame) -> DataFrame:
    """End-to-end REAL decode pipeline: text → PPM P6 payload →
    :func:`decode_image` (pure-numpy parser) → per-image pixel stats.
    Output: (doc_id, n_pixel_bytes, pixel_sum, zero_bin) — all
    integer-exact, so the DuckDB oracle can rebuild them from the
    text bytes + padding arithmetic and pin that the decoder returned
    the actual pixels (sum over h·w·3 uint8s), not a fake.

    Scale shape: two chained ``mapInPandas`` stages fused into one
    partition-local pass over Arrow batches — no shuffle anywhere;
    the plan is scan → (encode → decode → reduce) per batch, the
    canonical CPU-bound media pipeline."""

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

    return with_ppm_payload(docs).mapInPandas(stats, schema=DECODE_SCHEMA)


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
    import struct

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return docs.select("doc_id", "text").mapInPandas(
        build,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )


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

    return with_wav_payload(docs).mapInPandas(stats, schema=AUDIO_SCHEMA)


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
    frame_luma = Y4M_W * Y4M_H
    chroma = frame_luma // 4

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return docs.select("doc_id", "text").mapInPandas(
        build,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )


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

    return with_y4m_payload(docs).mapInPandas(stats, schema=VIDEO_SCHEMA)


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
