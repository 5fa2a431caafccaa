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
