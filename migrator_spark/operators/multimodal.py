"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode step is a
STUB (deterministic fake measurements derived from the bytes, or
``NotImplementedError`` when ``strict=True``). Everything around it —
binary column handling, explicit output schema, Arrow batch transfer,
partition-preserving mapInPandas — is the real production shape: swap
``_fake_decode`` for PIL/libvips/ffmpeg calls and nothing else changes.

Scale notes: payloads stay in the executor as Arrow buffers (never on
the driver); mapInPandas streams batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of table
size. Partitioning is inherited — repartition upstream by size class if
payload sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("phash", LongType()),
    ]
)


def to_binary_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a multimodal table: (id, payload binary, media_type).

    Here the payload is the utf-8 text bytes; in production it's the
    image/audio blob column read straight from parquet BinaryType.
    """
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for image decode (STUB — no image libs in
    this container). Returns (n_bytes, width, height, phash); the fake
    'perceptual hash' is the top 60 bits of MD5 so the DuckDB oracle
    can reproduce it."""
    import hashlib

    n = len(payload)
    phash = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return n, 320 + n % 320, 240 + n % 240, phash


def decode_metadata(payloads: DataFrame, strict: bool = False) -> DataFrame:
    """'Decode' each payload to typed metadata via mapInPandas.

    ``strict=True`` raises NotImplementedError where a real decoder
    (PIL / torchaudio / ffmpeg) would be invoked — marking exactly the
    line to replace in a fully-provisioned environment.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg (not in container); "
                    "use strict=False for the deterministic stub"
                )
            out = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": out.map(lambda t: t[0]),
                    "width": out.map(lambda t: t[1]),
                    "height": out.map(lambda t: t[2]),
                    "phash": out.map(lambda t: t[3]),
                }
            )

    return payloads.mapInPandas(batches, schema=DECODE_SCHEMA)


def frame_sample_plan(payloads: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index
    list per payload — the real decoder would emit one binary frame per
    index. Shows the fan-out schema/partitioning shape only."""
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    return (
        payloads.withColumn("n_frames", n_frames)
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("doc_id", "n_frames", "frame_idx")
    )


def resize_plan(
    metadata: DataFrame, box_w: int = 224, box_h: int = 224
) -> DataFrame:
    """Aspect-preserving fit-to-box resize targets from decoded
    metadata — the planning half of a resize stage, pure column math
    (JVM). The execution half is the same mapInPandas shape as
    ``decode_metadata`` with PIL's ``resize`` in place of the stub; at
    scale the plan column feeds it so each executor touches payload
    bytes exactly once.
    """
    scale = F.least(
        F.lit(float(box_w)) / F.col("width"), F.lit(float(box_h)) / F.col("height")
    )
    return metadata.select(
        "doc_id",
        "width",
        "height",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("long").alias("dst_w"),
        F.floor(F.col("height") * scale).cast("long").alias("dst_h"),
    )


FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dim", LongType()),
        StructField("value", DoubleType()),
    ]
)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Payload -> dense feature vector via Arrow-batched mapInPandas,
    exploded to (doc_id, dim, value) rows. The extractor is a
    deterministic stub (md5-byte features — no model runtimes in this
    container); swapping in a real encoder (CLIP/wav2vec) changes only
    the function body: schema, Arrow batching, and partition
    inheritance are the production shape. Exploded output keeps the
    result oracle-checkable and shuffle-friendly (fixed-width rows).
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = hashlib.md5(bytes(payload)).hexdigest()
                for d in range(FEATURE_DIM):
                    rows.append((doc_id, d, int(h[2 * d : 2 * d + 2], 16) / 255.0))
            yield pd.DataFrame(rows, columns=["doc_id", "dim", "value"])

    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)


def payload_dedup(payloads: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact multimodal dedup: group identical binary payloads by
    content hash — the image/audio counterpart of text dd1 (web-scale
    image corpora are first deduped by raw bytes before any perceptual
    hashing). Returns (payload_hash, keep_doc_id = min id, n_copies,
    n_bytes).

    One shuffle on the 60-bit hash of the bytes; payloads themselves
    never shuffle (the hash projects in the scan) — at 100 TB of media
    the exchange carries 8-byte hashes, not images.
    """
    h = F.conv(F.substring(F.md5(F.col("payload")), 1, 15), 16, 10).cast("long")
    return (
        payloads.select(F.col(id_col), h.alias("payload_hash"),
                        F.length("payload").alias("nb"))
        .groupBy("payload_hash")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("nb").alias("n_bytes"),
        )
    )


MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def _parse_bmp(payload: bytes):
    """Real BMP header parse (pure stdlib): BITMAPINFOHEADER width at
    byte 18, height at 22 (signed; negative = top-down)."""
    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = abs(int.from_bytes(payload[22:26], "little", signed=True))
    if width <= 0 or height <= 0:
        return None
    return ("image/bmp", width, height, None, None, None)


def _parse_wav(payload: bytes):
    """Real RIFF/WAVE chunk walk (pure stdlib): fmt chunk gives
    channels + sample rate + byte rate; data chunk size gives
    duration."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, channels, rate, byte_rate, data_size = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or not rate or not byte_rate or data_size is None:
        return None
    return ("audio/wav", None, None, channels, rate, data_size * 1000 // byte_rate)


def decode_media(payloads: DataFrame, strict: bool = False) -> DataFrame:
    """REAL media decode for uncompressed container formats — BMP
    image headers and RIFF/WAVE audio — parsed byte-by-byte with the
    stdlib inside the same Arrow ``mapInPandas`` shape as
    ``decode_metadata``. Unrecognized payloads (JPEG/PNG/MP4 need
    PIL/ffmpeg, absent in this container) fall back to the
    deterministic stub dimensions under ``media_type='unknown'``, or
    raise when ``strict=True`` — so the line to extend for compressed
    formats is exactly marked, and the two formats a pure-Python
    parser CAN handle are handled for real, end-to-end through Spark.
    """

    def decode_one(doc_id: int, payload: bytes) -> tuple:
        for parser in (_parse_bmp, _parse_wav):
            got = parser(payload)
            if got is not None:
                mt, w, h, ch, sr, dur = got
                return (doc_id, mt, len(payload), w, h, ch, sr, dur)
        if strict:
            raise NotImplementedError(
                "compressed media decode requires PIL/ffmpeg (not in container)"
            )
        n, w, h, _ph = _fake_decode(payload)
        return (doc_id, "unknown", n, w, h, None, None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                decode_one(i, p) for i, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return payloads.mapInPandas(batches, schema=MEDIA_SCHEMA)


def synth_wav_payloads(
    docs: DataFrame, rate: int = 8000, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """Synthesize REAL mono 16-bit PCM WAV files (one sample per char
    of the source doc, deterministic waveform from the sample index) —
    the encode half of the decode_media round-trip, and the stand-in
    for reading actual audio blobs from a parquet binary column.
    Arrow mapInPandas, payload never touches the driver."""
    import struct

    def build(n: int) -> bytes:
        data = struct.pack(
            "<" + "h" * n, *(((i * 37) % 8191 - 4096) for i in range(n))
        )
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": pdf[len_col].map(lambda n: build(int(n)))}
            )

    return docs.mapInPandas(batches, schema=schema)
