"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas.

Design for a real pipeline: image/audio/video live as `binary` columns with
a `media_type` tag; decode / feature-extract / resize / frame-sample are
Pandas functions over mapInPandas so the heavy per-item work streams
through Arrow batches without materializing rows JVM-side. The decode step
here is a clearly-marked deterministic STUB (the real codec libraries are
not in this container — see decode_media); everything around it (schema,
batch iteration, partitioning) is the production shape.

At 100 TB: payloads dominate row size, so (a) never shuffle the binary
column — derive metadata first, then drop or offload the payload;
(b) size spark.sql.execution.arrow.maxRecordsPerBatch so a batch of
payloads fits in worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("media_hash", StringType()),
    StructField("fake_width", IntegerType()),
    StructField("fake_height", IntegerType()),
    StructField("decode_status", StringType()),
])


def decode_media(payload: bytes) -> dict:
    """STUB decoder. A real deployment would dispatch on media_type to
    PIL/ffmpeg/torchaudio here; those libraries are not available in this
    environment, so this produces deterministic fake dimensions derived
    from the payload hash (portable: md5-based, reproducible anywhere).
    """
    h = hashlib.md5(payload).hexdigest()
    k = int(h[:8], 16)
    return {
        "n_bytes": len(payload),
        "media_hash": h,
        "fake_width": 64 + k % 1920,
        "fake_height": 64 + (k // 1920) % 1080,
        "decode_status": "stub_ok",
    }


def media_metadata(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_media(p) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(extract, MEDIA_META_SCHEMA)


FRAME_COUNT = 4     # frames sampled per media item (fake 4 "fps")
FRAME_WINDOW = 64   # bytes hashed per frame

MEDIA_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("byte_offset", LongType()),
    StructField("frame_hash", StringType()),
    StructField("ts_ms", IntegerType()),
])


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over binary media: k=FRAME_COUNT evenly-spaced byte
    offsets per payload, one output row per frame (a 1→N mapInPandas —
    the video analog of posexplode). A real deployment seeks ffmpeg to
    those offsets; here the "frame" is the md5 of the hex of a
    FRAME_WINDOW-byte slice (deterministic, oracle-reproducible), and the
    fan-out/batching/schema are the production shape. The payload is
    dropped on output — at 100 TB the frame rows shuffle, the binaries
    never do."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                n = len(p)
                for j in range(FRAME_COUNT):
                    off = (j * n) // FRAME_COUNT
                    window = p[off:off + FRAME_WINDOW]
                    rows.append((
                        did, j, off,
                        hashlib.md5(window.hex().encode()).hexdigest(),
                        j * 250,
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FRAME_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(sample, MEDIA_FRAME_SCHEMA)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a binary payload column from text (the test corpus has no real
    media; utf-8 bytes stand in so the binary-column path is exercised
    end-to-end with verifiable values)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


PHASH_BITS = 60          # signature width (fits signed 64 with headroom)
PHASH_CHUNKS = 4         # banding chunks (pigeonhole recall for dist <= 3)
PHASH_CHUNK_BITS = 15    # BITS / CHUNKS
PHASH_MAX_DIST = 3       # Hamming radius for "near-dup frames"

MEDIA_PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("phash", LongType()),
])


def phash_signature(payload: bytes) -> int:
    """Perceptual-hash STYLE signature over the stub decode: sample
    PHASH_BITS evenly-spaced bytes, threshold each against the sample
    median (interpolated for even counts — matching SQL median()), pack
    the > bits into an int. A real deployment would DCT the decoded
    luma plane here; the sampling/threshold/packing and the banded
    near-dup join around it are the production shape, and every step is
    byte-arithmetic an engine-independent oracle can replay."""
    import statistics

    n = len(payload)
    if n == 0:
        return 0
    vals = [payload[(i * n) // PHASH_BITS] for i in range(PHASH_BITS)]
    med = statistics.median(vals)
    sig = 0
    for i, v in enumerate(vals):
        if v > med:
            sig |= 1 << i
    return sig


def media_phash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched signature extraction; payloads never leave the map
    side — only the (id, int64) signature rows shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "phash": [phash_signature(bytes(p))
                          for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(
        extract, MEDIA_PHASH_SCHEMA)


AUDIO_WIN = 256      # bytes per analysis window
AUDIO_HOP = 128      # hop (50% overlap)
AUDIO_MAX_WINS = 6   # cap per item (head is enough for fingerprinting)

MEDIA_AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("win_idx", IntegerType()),
    StructField("byte_offset", LongType()),
    StructField("energy_sum", LongType()),
    StructField("window_hash", StringType()),
])


def audio_windows(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Overlapping fixed-width window features over binary media — the
    audio analog of frame sampling (STFT hop pattern): per window an
    integer energy proxy (byte-value sum; a real pipeline computes RMS
    of decoded PCM here) and a content hash. 1→N mapInPandas; windows
    shuffle, payloads never do."""

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                n = len(p)
                n_wins = min(AUDIO_MAX_WINS,
                             1 + max(0, n - AUDIO_WIN) // AUDIO_HOP)
                for j in range(n_wins):
                    off = j * AUDIO_HOP
                    chunk = p[off:off + AUDIO_WIN]
                    rows.append((
                        did, j, off, sum(chunk),
                        hashlib.md5(chunk.hex().encode()).hexdigest(),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_AUDIO_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        windows, MEDIA_AUDIO_SCHEMA)


THUMB_K = 16  # output "pixels" (sampled bytes) per thumbnail

MEDIA_THUMB_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("thumb_hex", StringType()),
])


def resize_thumbnail(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """Nearest-neighbor 'resize' of a binary payload to THUMB_K sampled
    bytes, emitted as a fixed-width hex string — the downsample step of
    an image/audio thumbnail pipeline (a real deployment resamples the
    decoded pixel/PCM plane; the index arithmetic i*n//K and the
    fixed-size output contract are identical). Map-only mapInPandas:
    payloads in, 2*K-char strings out — nothing wide ever shuffles."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                n = len(p)
                thumb = bytes(p[(i * n) // THUMB_K] for i in range(THUMB_K)) \
                    if n else b""
                rows.append((did, n, thumb.hex()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_THUMB_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(
        resize, MEDIA_THUMB_SCHEMA)
