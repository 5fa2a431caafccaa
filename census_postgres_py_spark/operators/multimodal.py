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
    docs = t(spark, sf_dir, "documents").select("doc_id")
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
