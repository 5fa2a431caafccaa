"""Multimodal columns (BASELINE.json:6 mandate): image/audio/video as
opaque `binary` payloads + typed metadata, processed by Arrow-batched
`mapInPandas` pipelines.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real decoder (PIL / torchaudio / pyav) would implement —
the Spark-side plumbing (binary column, schema, batch iteration,
partition-parallel UDF) is real and tested. At 100 TB the pattern is:
payload bytes stay columnar in parquet, decode runs once per row
inside `mapInPandas` batches, and extracted features land in typed
columns for downstream relational ops.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

FRAME_STRIDE = 50  # frame-sampling stride (every 50th frame)


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder. A real build replaces this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` — everything around it
    (schema, batching, partitioning) is production-shaped. The fake is
    a pure function of the bytes, so results are deterministic.
    """
    crc = zlib.crc32(payload)
    return {
        "n_bytes": len(payload),
        "checksum": crc,
        "width": 320 + (crc % 1600),  # fake intrinsic size
        "height": 240 + ((crc >> 11) % 900),
    }


_FEATURE_COLS = ["n_bytes", "checksum", "width", "height"]


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in, feature batch out.

    Empty batches are skipped: ``pd.DataFrame([])`` has zero columns,
    which would fail the declared output schema."""
    for pdf in batches:
        if not len(pdf):
            continue
        feats = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats, columns=_FEATURE_COLS)
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register("mm_decode_features")  # stubbed decoder => rows-only check
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed features via mapInPandas.

    `documents.text` stands in for an image blob (cast to binary);
    every downstream step — Arrow batch iteration, feature schema,
    deterministic per-row decode — is exactly what a real image
    feature-extract job does.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _decode_batches,
        schema="doc_id long, n_bytes long, checksum long, width long, height long",
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


RESIZE_TARGET = (64, 64)  # thumbnail W x H a real resize would emit
RESIZE_BYTE_CAP = 256  # stub: output payload = first N chars re-encoded


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for the resize stage. The STUB 'resize'
    truncates the decoded payload to RESIZE_BYTE_CAP characters and
    fingerprints the result — a real build swaps the body for
    `PIL.Image.resize` and emits re-encoded bytes. Deterministic, so
    the oracle can reproduce the fingerprint from the source column."""
    import hashlib

    for pdf in batches:
        if not len(pdf):
            continue
        out_rows = []
        for payload in pdf["payload"]:
            text = bytes(payload).decode("utf-8")
            resized = text[:RESIZE_BYTE_CAP].encode("utf-8")
            out_rows.append(
                {
                    "n_bytes_in": len(payload),
                    "n_bytes_out": len(resized),
                    "resized_md5": hashlib.md5(resized).hexdigest(),
                    "out_w": RESIZE_TARGET[0],
                    "out_h": RESIZE_TARGET[1],
                }
            )
        out = pd.DataFrame(
            out_rows,
            columns=["n_bytes_in", "n_bytes_out", "resized_md5", "out_w", "out_h"],
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register(
    "mm_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
           CAST(octet_length(encode(substring(text, 1, {RESIZE_BYTE_CAP})))
               AS BIGINT) AS n_bytes_out,
           md5(substring(text, 1, {RESIZE_BYTE_CAP})) AS resized_md5,
           CAST({RESIZE_TARGET[0]} AS BIGINT) AS out_w,
           CAST({RESIZE_TARGET[1]} AS BIGINT) AS out_h
    FROM documents
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> resized payload metadata via mapInPandas (the
    resize stage of an image pipeline; decoder/encoder stubbed, the
    Spark-side batch plumbing real — see module docstring)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _resize_batches,
        schema=(
            "doc_id long, n_bytes_in long, n_bytes_out long, "
            "resized_md5 string, out_w long, out_h long"
        ),
    )
