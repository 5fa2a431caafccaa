"""Round-4x extension operators (SURVEY.md §2.38).

Market-data, dedup-tuning and lake-maintenance reads: OHLC candles
(the open/high/low/close rollup every price dashboard draws),
an embedding near-dup threshold sweep (pick the dedup cutoff by
seeing the dup-rate curve BEFORE committing to one), and an
end-to-end manifest-pruned scan (write → manifest → prune → read
only matching files — the table-format zone-map workflow).

Contract discipline identical to the other extension modules: OHLC
open/close come from deterministic (ts, event_id) rank windows, the
sweep's cosine is the sequential JVM fold whose accumulation order
matches DuckDB bit-for-bit (dedup_embedding_cosine stage-2
precedent), and the pruning op's correctness statement is equality
with the unpruned oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_postgres_py_spark.operators.scans import _scratch
from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

_BUCKET_S = 21600  # 6-hour candle


# ---------------------------------------------------------------------------
# win_ohlc_candles — 6-hour OHLC per event type
# ---------------------------------------------------------------------------


@register(
    "win_ohlc_candles",
    oracle=f"""
    WITH pts AS (
        SELECT event_type, event_id,
               CAST(floor(epoch(ts) / {_BUCKET_S}) AS BIGINT) AS bucket,
               ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), ranked AS (
        SELECT event_type, bucket, cents,
               row_number() OVER (
                   PARTITION BY event_type, bucket
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type, bucket
                   ORDER BY ts DESC, event_id DESC) AS rn_z
        FROM pts
    )
    SELECT event_type, bucket,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open,
           CAST(max(cents) AS BIGINT) AS high,
           CAST(min(cents) AS BIGINT) AS low,
           CAST(max(CASE WHEN rn_z = 1 THEN cents END) AS BIGINT) AS close,
           CAST(count(*) AS BIGINT) AS n_trades,
           CAST(sum(cents) AS BIGINT) AS volume_cents
    FROM ranked GROUP BY event_type, bucket
    """,
)
def win_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour OHLC candles per event type — open, high, low, close,
    trade count and value volume, the standard market/price rollup.

    Open and close are the first/last rows under the TOTAL order
    (ts, event_id) — two rank windows partitioned by (type, bucket),
    deterministic even when timestamps collide, instead of engine-
    specific first()/arg_min semantics. The candle rollup itself is
    a combinable aggregation over integer cents. At 100 TB windows
    partition by (type, bucket) — bounded frames that scale with the
    candle width, never with history length.
    """
    pts = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.unix_timestamp("ts") / _BUCKET_S)
        .cast("long")
        .alias("bucket"),
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w_a = Window.partitionBy("event_type", "bucket").orderBy(
        "ts", "event_id"
    )
    w_z = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = pts.select(
        "event_type",
        "bucket",
        "cents",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_z).alias("rn_z"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
        .cast("long")
        .alias("open"),
        F.max("cents").cast("long").alias("high"),
        F.min("cents").cast("long").alias("low"),
        F.max(F.when(F.col("rn_z") == 1, F.col("cents")))
        .cast("long")
        .alias("close"),
        F.count("*").cast("long").alias("n_trades"),
        F.sum("cents").cast("long").alias("volume_cents"),
    )


# ---------------------------------------------------------------------------
# emb_dedup_sweep — dup-rate curve across cosine thresholds
# ---------------------------------------------------------------------------

_THRESHOLDS = (30, 40, 50, 60, 70)  # cosine × 100


@register(
    "emb_dedup_sweep",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               list_reduce(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                        * CAST(b.embedding[i] AS DOUBLE)),
                   (x, y) -> x + y)
               / sqrt(list_reduce(list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] AS DOUBLE)
                          * CAST(a.embedding[i] AS DOUBLE)),
                     (x, y) -> x + y))
               / sqrt(list_reduce(list_transform(range(1, 65),
                     i -> CAST(b.embedding[i] AS DOUBLE)
                          * CAST(b.embedding[i] AS DOUBLE)),
                     (x, y) -> x + y)) AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    ), th AS (
        SELECT CAST(unnest({list(_THRESHOLDS)}) AS BIGINT) AS th_x100
    )
    SELECT th.th_x100,
           CAST(count(CASE WHEN pairs.cos >= th.th_x100 / 100.0
                      THEN 1 END) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT CASE WHEN pairs.cos >= th.th_x100 / 100.0
                      THEN pairs.ib END) AS BIGINT) AS n_dropped
    FROM th CROSS JOIN pairs
    GROUP BY th.th_x100
    """,
)
def emb_dedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sweep over label-blocked embedding pairs:
    for each candidate cosine cutoff (0.30–0.70), how many pairs
    cross it and how many rows a keep-lowest-id dedup would drop —
    the curve you read BEFORE committing a dedup threshold to a
    100 TB corpus.

    Pairs are blocked by label (the shard-local dedup shape — the
    block-pair matmul of dedup_embedding_cosine is the unblocked
    path); each pair's cosine is computed ONCE with the sequential
    JVM zip_with/aggregate fold (bit-identical to DuckDB's
    list_reduce), then swept across all 5 thresholds by a broadcast
    cross join — the expensive similarity work is never repeated per
    threshold. n_dropped counts distinct higher-ids (keep-lowest
    survivorship).
    """
    import pandas as pd

    lowest = min(_THRESHOLDS) / 100.0

    def _candidates(pdf: pd.DataFrame):
        import numpy as np

        m = np.vstack(pdf["v"].to_numpy()).astype("float64")
        ids = pdf["vec_id"].to_numpy()
        norms = np.sqrt((m * m).sum(axis=1))
        sims = (m @ m.T) / norms[:, None] / norms[None, :]
        ii, jj = np.nonzero(np.triu(sims >= lowest - 0.001, k=1))
        lo_ids = np.minimum(ids[ii], ids[jj])
        hi_ids = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"ia": lo_ids, "ib": hi_ids})

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cand = e.groupBy("label").applyInPandas(
        _candidates, "ia long, ib long"
    )
    # exact rescore of the (sparse) candidate set: sequential JVM fold,
    # bit-identical to DuckDB's list_reduce — the BLAS pass above can
    # only OVER-select (0.001 slack ≫ any accumulation-order drift)
    sq = lambda v: F.aggregate(  # noqa: E731
        F.zip_with(v, v, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ev = e.withColumn("nrm", F.sqrt(sq(F.col("v"))))
    a = ev.select(
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = ev.select(
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        cand.join(a, "ia")
        .join(b, "ib")
        .select(
            "ib",
            (dot / F.col("na") / F.col("nb")).alias("cos"),
        )
        .filter(F.col("cos") >= lowest)
    )
    th = spark.createDataFrame(
        [(x,) for x in _THRESHOLDS], "th_x100 long"
    )
    # broadcast the 5-row threshold frame explicitly — without the hint
    # this planned a CartesianProduct (pairs ⨯ th materialized by
    # shuffle), the one plan shape banned repo-wide (tools/plan_sweep.py)
    return (
        pairs.crossJoin(F.broadcast(th))
        .groupBy("th_x100")
        .agg(
            F.count(
                F.when(F.col("cos") >= F.col("th_x100") / 100.0, 1)
            )
            .cast("long")
            .alias("n_pairs"),
            F.countDistinct(
                F.when(
                    F.col("cos") >= F.col("th_x100") / 100.0,
                    F.col("ib"),
                )
            )
            .cast("long")
            .alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_manifest_prune_e2e — zone-map write → prune → selective read
# ---------------------------------------------------------------------------


@register(
    "pipeline_manifest_prune_e2e",
    oracle="""
    WITH b AS (
        SELECT (max(o_orderkey) + 1) // 4 AS lo,
               (max(o_orderkey) + 1) // 2 - 1 AS hi
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders CROSS JOIN b
    WHERE o_orderkey BETWEEN b.lo AND b.hi
    GROUP BY o_orderpriority
    """,
)
def pipeline_manifest_prune_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end zone-map pruning: write orders range-partitioned on
    o_orderkey, collect a per-file (min, max) manifest, answer a key-
    range query by reading ONLY the files whose zone overlaps — the
    workflow behind every table format's file skipping, made explicit.

    The write range-partitions (repartitionByRange) so file zones are
    disjoint and the manifest is selective; the manifest itself is
    file-count-sized — reading it driver-side is the same metadata
    work a table format's planner does, NOT a data collect. The final
    aggregation runs on the pruned file list; the oracle computes the
    same answer from the unpruned table, so the hash-match IS the
    proof that pruning lost nothing.
    """
    # Query the second key octile-pair [N/4, N/2) — relative bounds so
    # the op is meaningful at every scale factor (keys are dense 0..N-1).
    n_keys = (
        t(spark, sf_dir, "orders").agg(F.max("o_orderkey")).collect()[0][0]
        + 1
    )
    lo, hi = n_keys // 4, n_keys // 2 - 1
    base = _scratch(f"orders_zoned_{os.path.basename(sf_dir)}")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (
            t(spark, sf_dir, "orders")
            .repartitionByRange(8, "o_orderkey")
            .write.mode("overwrite")
            .parquet(base)
        )
    files = [
        os.path.join(base, f)
        for f in os.listdir(base)
        if f.endswith(".parquet")
    ]
    manifest = (
        spark.read.parquet(*files)
        .select("o_orderkey", F.input_file_name().alias("path"))
        .groupBy("path")
        .agg(
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
        .collect()
    )
    keep = [
        r["path"].removeprefix("file://")
        for r in manifest
        if r["mx"] >= lo and r["mn"] <= hi
    ]
    assert 0 < len(keep) < len(files), "zone map must actually prune"
    pruned = spark.read.parquet(*keep).filter(
        F.col("o_orderkey").between(lo, hi)
    )
    return pruned.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("cents"),
    )
