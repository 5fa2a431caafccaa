"""Multimodal columns (BASELINE.json:6 mandate): image/audio/video as
opaque `binary` payloads + typed metadata, processed by Arrow-batched
`mapInPandas` pipelines.

The container has no external codecs (PIL/torchaudio/pyav), so payloads
use SIMG — a self-defined raw-gray image format (4-byte magic, big-
endian u16 width/height, row-major u8 pixels) whose pixel function is
deterministic in doc_id. That makes every stage REAL: the encoder packs
actual binary images, the decoder parses the header and pixel buffer
with numpy (magic check included), the resizer mean-pools real pixel
blocks — and every extracted feature is reproducible in pure SQL, so
the DuckDB oracle hash-checks values instead of row counts. Swapping
SIMG for JPEG means replacing only the two pure functions `_encode_img`
/ decode parsing; the Spark plumbing (binary column between two
mapInPandas stages, schema, batch iteration) is byte-for-byte what a
production image pipeline runs.

At 100 TB the pattern is: payload bytes stay columnar in parquet,
decode runs inside `mapInPandas` batches (one Python entry per Arrow
batch), and extracted features land in typed columns for downstream
relational ops — no row-at-a-time UDF, no driver traffic.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

FRAME_STRIDE = 50  # frame-sampling stride (every 50th frame)

IMG_MAGIC = b"SIMG"
# Intrinsic dims / pixels are affine-mod functions of doc_id so the SQL
# oracle can regenerate them: w in [16,64), h in [16,48),
# px[i] = (doc_id*7 + i*13) % 256 row-major.
_W_EXPR = "16 + doc_id % 48"
_H_EXPR = "16 + (doc_id * 3) % 32"


def _encode_img(doc_id: int) -> bytes:
    """Pack a real SIMG payload: magic + u16be dims + u8 pixel rows."""
    import numpy as np

    w, h = 16 + doc_id % 48, 16 + (doc_id * 3) % 32
    px = ((doc_id * 7 + 13 * np.arange(w * h, dtype=np.int64)) % 256).astype(
        np.uint8
    )
    return IMG_MAGIC + struct.pack(">HH", w, h) + px.tobytes()


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stage 1: rows -> binary image column (the ingest half)."""
    for pdf in batches:
        if not len(pdf):
            continue
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "payload": [_encode_img(int(d)) for d in pdf["doc_id"]],
            }
        )


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parallelism restore BEFORE the encode kernel: the fixture
    # documents parquet is one row group, so every downstream decode /
    # phash / resize kernel would run its whole Arrow-batch chain in a
    # single task (r10 stage audit flagged mm_phash_dedup's two ~1.1 s
    # 1-task stages). The shuffle moves only 8-byte doc_ids — payload
    # bytes are synthesized AFTER the exchange. On a real corpus the
    # binary column arrives pre-split across many files and the
    # repartition of the tiny id frame is still noise next to decode.
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.mapInPandas(_encode_batches, schema="doc_id long, payload binary")


def _parse_img(payload: bytes):
    """REAL decode: validate magic, unpack header, view pixel buffer."""
    import numpy as np

    if payload[:4] != IMG_MAGIC:
        raise ValueError("not a SIMG payload")
    w, h = struct.unpack(">HH", payload[4:8])
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
    return w, h, px


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stage 2 kernel: binary batch in, typed feature batch out.

    Empty batches are skipped: ``pd.DataFrame([])`` has zero columns,
    which would fail the declared output schema."""
    for pdf in batches:
        if not len(pdf):
            continue
        rows = []
        for payload in pdf["payload"]:
            w, h, px = _parse_img(bytes(payload))
            s = int(px.sum())
            rows.append(
                {
                    "width": w,
                    "height": h,
                    "n_px": w * h,
                    "px_sum": s,
                    "px_mean": s // (w * h),
                }
            )
        out = pd.DataFrame(
            rows, columns=["width", "height", "n_px", "px_sum", "px_mean"]
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register(
    "mm_decode_features",
    oracle=f"""
    SELECT doc_id, width, height, width * height AS n_px, px_sum,
           px_sum // (width * height) AS px_mean
    FROM (
        SELECT doc_id, width, height,
               CAST(list_aggregate(list_transform(
                        range(0, width * height),
                        i -> (doc_id * 7 + i * 13) % 256),
                    'sum') AS BIGINT) AS px_sum
        FROM (SELECT doc_id,
                     CAST({_W_EXPR} AS BIGINT) AS width,
                     CAST({_H_EXPR} AS BIGINT) AS height
              FROM documents)
    )
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image payload -> typed features, two mapInPandas stages:
    encode (rows -> SIMG binary column) then decode (parse magic +
    header + pixel buffer with numpy, emit width/height/pixel stats).

    The binary column genuinely crosses an Arrow boundary between the
    stages, and the decoder genuinely parses it — the oracle rebuilds
    the same features from the pixel-function definition in pure SQL,
    so this op is value-hash-checked end to end (it was rows-only while
    the decoder was a crc32 stub)."""
    return _payloads(spark, sf_dir).mapInPandas(
        _decode_batches,
        schema=(
            "doc_id long, width long, height long, n_px long, "
            "px_sum long, px_mean long"
        ),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(unnest(range(0, n_chars, {FRAME_STRIDE})) AS BIGINT)
               AS frame_idx,
           CAST(n_chars AS BIGINT) AS n_frames
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling shape: treat each doc as an n_chars-frame
    clip and emit every 50th frame index (sequence + explode — the
    row-expansion half of a frame-extract pipeline, minus the codec).
    """
    docs = t(spark, sf_dir, "documents")
    frames = F.sequence(
        F.lit(0).cast("long"),
        (F.col("n_chars") - 1).cast("long"),
        F.lit(FRAME_STRIDE).cast("long"),
    )
    return docs.select(
        "doc_id",
        F.explode(frames).alias("frame_idx"),
        F.col("n_chars").cast("long").alias("n_frames"),
    )


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for the resize stage: REAL 2x2 mean-pool over
    the decoded pixel grid (odd trailing row/col cropped, floor mean —
    the standard integer box filter)."""
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        rows = []
        for payload in pdf["payload"]:
            w, h, px = _parse_img(bytes(payload))
            ow, oh = w // 2, h // 2
            a = px.reshape(h, w)[: oh * 2, : ow * 2].astype(np.int64)
            pooled = (
                a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
            ) // 4
            rows.append(
                {
                    "in_w": w,
                    "in_h": h,
                    "out_w": ow,
                    "out_h": oh,
                    "out_px_sum": int(pooled.sum()),
                }
            )
        out = pd.DataFrame(
            rows, columns=["in_w", "in_h", "out_w", "out_h", "out_px_sum"]
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register(
    "mm_resize",
    oracle=f"""
    SELECT doc_id, width AS in_w, height AS in_h,
           width // 2 AS out_w, height // 2 AS out_h,
           CAST(list_aggregate(list_transform(
                    range(0, (width // 2) * (height // 2)),
                    j -> ((doc_id * 7 + ((j // (width // 2)) * 2 * width
                                         + (j % (width // 2)) * 2) * 13) % 256
                        + (doc_id * 7 + ((j // (width // 2)) * 2 * width
                                         + (j % (width // 2)) * 2 + 1) * 13) % 256
                        + (doc_id * 7 + (((j // (width // 2)) * 2 + 1) * width
                                         + (j % (width // 2)) * 2) * 13) % 256
                        + (doc_id * 7 + (((j // (width // 2)) * 2 + 1) * width
                                         + (j % (width // 2)) * 2 + 1) * 13) % 256
                          ) // 4),
                'sum') AS BIGINT) AS out_px_sum
    FROM (SELECT doc_id,
                 CAST({_W_EXPR} AS BIGINT) AS width,
                 CAST({_H_EXPR} AS BIGINT) AS height
          FROM documents)
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image payload -> 2x downsample via mapInPandas: decode the
    SIMG buffer, mean-pool 2x2 pixel blocks with numpy, emit the output
    geometry + pooled pixel sum. The oracle recomputes the identical
    box filter from the pixel-function definition in SQL (lambda over
    the output-pixel index space), so the resize arithmetic itself is
    hash-checked — this stopped being a truncate-and-md5 stub."""
    return _payloads(spark, sf_dir).mapInPandas(
        _resize_batches,
        schema=(
            "doc_id long, in_w long, in_h long, out_w long, out_h long, "
            "out_px_sum long"
        ),
    )


AUD_MAGIC = b"SAUD"
# Audio twin of SIMG: a self-defined PCM format whose sample function
# is affine-quadratic in (doc_id, i) so the SQL oracle can regenerate
# it: sr = 8000 + (doc_id%8)*1000 Hz, n = 256 + doc_id%256 samples,
# s[i] = ((doc_id*11 + 3*i*i) % 256) - 128 (signed 8-bit PCM).
_SR_EXPR = "8000 + (doc_id % 8) * 1000"
_N_EXPR = "256 + doc_id % 256"


def _encode_audio(doc_id: int) -> bytes:
    """Pack a real SAUD payload: magic + u16be rate + u32be count +
    signed 8-bit PCM samples."""
    import numpy as np

    sr = 8000 + (doc_id % 8) * 1000
    n = 256 + doc_id % 256
    i = np.arange(n, dtype=np.int64)
    s = ((doc_id * 11 + 3 * i * i) % 256 - 128).astype(np.int8)
    return AUD_MAGIC + struct.pack(">HI", sr, n) + s.tobytes()


def _audio_encode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "payload": [_encode_audio(int(d)) for d in pdf["doc_id"]],
            }
        )


def _audio_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL decode: magic check, header unpack, vectorized numpy
    feature extraction over the PCM buffer."""
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        rows = []
        for payload in pdf["payload"]:
            raw = bytes(payload)
            if raw[:4] != AUD_MAGIC:
                raise ValueError("not a SAUD payload")
            sr, n = struct.unpack(">HI", raw[4:10])
            s = np.frombuffer(raw[10 : 10 + n], dtype=np.int8).astype(np.int64)
            rms = float(np.sqrt(np.mean((s.astype(np.float64)) ** 2)))
            zc = int(np.sum(s[:-1] * s[1:] < 0))
            rows.append(
                {
                    "sample_rate": sr,
                    "n_samples": n,
                    "duration_ms": n * 1000 // sr,
                    "rms": float(np.floor(rms * 1e6 + 0.5) / 1e6),
                    "n_zero_cross": zc,
                }
            )
        out = pd.DataFrame(
            rows,
            columns=[
                "sample_rate",
                "n_samples",
                "duration_ms",
                "rms",
                "n_zero_cross",
            ],
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register(
    "mm_audio_features",
    oracle=f"""
    WITH params AS (
        SELECT doc_id,
               CAST({_SR_EXPR} AS BIGINT) AS sr,
               CAST({_N_EXPR} AS BIGINT) AS n
        FROM documents
    ), samples AS (
        SELECT p.doc_id, p.sr, p.n, t.i,
               ((p.doc_id * 11 + 3 * t.i * t.i) % 256) - 128 AS s
        FROM params p, range(0, 512) t(i)
        WHERE t.i < p.n
    ), lagged AS (
        SELECT doc_id, sr, n, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples
    )
    SELECT doc_id,
           CAST(any_value(sr) AS BIGINT) AS sample_rate,
           CAST(any_value(n) AS BIGINT) AS n_samples,
           any_value(n) * 1000 // any_value(sr) AS duration_ms,
           floor(sqrt(avg(CAST(s * s AS DOUBLE))) * 1000000 + 0.5)
               / 1000000 AS rms,
           CAST(sum(CASE WHEN prev IS NOT NULL AND prev * s < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
    FROM lagged GROUP BY doc_id
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary audio payload -> typed features (rate, duration, RMS
    loudness, zero-crossing count), same two-stage mapInPandas shape
    as mm_decode_features: encode packs real SAUD bytes, decode
    parses the header and runs vectorized numpy over the PCM buffer.

    Zero-crossings and RMS are the standard cheap audio screeners a
    training pipeline gates on before expensive transcription; the
    oracle regenerates both from the sample function in SQL, so the
    whole binary round trip is value-hash-checked."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        _audio_encode_batches, schema="doc_id long, payload binary"
    )
    return payloads.mapInPandas(
        _audio_decode_batches,
        schema=(
            "doc_id long, sample_rate long, n_samples long, "
            "duration_ms long, rms double, n_zero_cross long"
        ),
    )
