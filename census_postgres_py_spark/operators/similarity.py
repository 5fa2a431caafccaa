"""Similarity search over the embedding column (BASELINE.json:6
"similarity search"; SURVEY.md §2.3 join_similarity_topk).

Two paths, same API shape:

* `join_similarity_topk` — brute-force cosine top-k: broadcast the
  (tiny) probe set against the full embedding table, window-rank. The
  CORRECTNESS baseline; per-probe cost is a linear scan, so it's fine
  whenever |probes| is small, even at 100 TB of vectors.
* `join_similarity_ann` — hyperplane-LSH (sign-random-projection)
  bucketed ANN: vectors land in 2^nbits buckets; probes search only
  their own bucket plus Hamming-1 neighbors (multiprobe). Sub-linear
  candidates; approximate recall => rows-only check, with tests
  asserting recall against the brute-force twin.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_postgres_py_spark.functions.vector import cosine, dot
from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

PROBE_IDS = [0, 100, 200, 300, 400]
TOP_K = 3
N_PLANES = 6  # 64 LSH buckets
_PLANE_SEED = 7


def _probe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(probe_id, probe_emb) x (vec_id, embedding), self excluded."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    return e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))


@register(
    "join_similarity_topk",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS probe_emb
        FROM embeddings WHERE vec_id IN ({", ".join(map(str, PROBE_IDS))})
    ), scored AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(p.probe_emb AS DOUBLE[])) AS cos_raw
        FROM embeddings e JOIN probes p ON e.vec_id <> p.probe_id
    ), ranked AS (
        SELECT probe_id, neighbor_id, cos_raw,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_raw DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT probe_id, neighbor_id, round(cos_raw, 6) AS cos_sim,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
)
def join_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k per probe (exact ANN baseline).

    Probes broadcast; cosine is a zip_with/aggregate fold (JVM-side);
    the per-probe top-k is a WindowGroupLimit — no global sort.
    """
    scored = _probe_join(spark, sf_dir).withColumn(
        "cos_raw", cosine(F.col("embedding"), F.col("probe_emb"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_raw", 6).alias("cos_sim"),
            "rn",
        )
    )


def _hyperplanes(dim: int = 64) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed — rerunnable)."""
    rng = np.random.RandomState(_PLANE_SEED)
    return rng.randn(N_PLANES, dim).tolist()


def _bucket_expr(emb_col: str) -> Column:
    """LSH bucket id: sign bit of <v, h_i> for each hyperplane."""
    planes = _hyperplanes()
    bits = []
    for i, plane in enumerate(planes):
        d = dot(F.col(emb_col), F.array(*[F.lit(x) for x in plane]))
        bits.append(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("long")


@register("join_similarity_ann")  # approximate recall => rows-only
def join_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-k (the 100 TB scale path).

    Index side: one pass computes each vector's 6-bit bucket (a plain
    column — at scale this is the partition key, written once).
    Query side: each probe expands to its bucket + the 6 Hamming-1
    buckets (multiprobe), equi-joins on bucket, and only candidates
    get exact cosine + rank. Deterministic (fixed hyperplane seed) but
    recall < 1 vs the exact twin — tests measure it.
    """
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _bucket_expr("embedding").alias("bucket")
    )
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_emb"),
        F.col("bucket").alias("probe_bucket"),
    )
    # multiprobe: own bucket + flip each of the 6 bits
    probe_buckets = probes.select(
        "probe_id",
        "probe_emb",
        F.explode(
            F.array(
                F.col("probe_bucket"),
                *[
                    F.col("probe_bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(N_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    cand = e.join(F.broadcast(probe_buckets), "bucket").filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cand.withColumn("cos_raw", cosine(F.col("embedding"), F.col("probe_emb")))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_raw", 6).alias("cos_sim"),
            "rn",
        )
    )
