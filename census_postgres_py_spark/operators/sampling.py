"""Deterministic sampling operators (training-pipeline extension;
BASELINE.json:6 scale mandate).

Random sampling (``df.sample``) is nondeterministic across retries and
partition layouts, which breaks both oracle comparison and exactly-once
pipeline re-runs. The scale-correct idiom is *hash sampling*: keep a row
iff a stable hash of its key lands under the stratum's rate threshold.
The sample is then a pure filter — no shuffle, fully pushdown-friendly,
reproducible on any cluster layout, and consistent across incremental
re-runs (the same key always makes the same in/out decision, which is
what a 100 TB training-data refresh needs).

The hash is ``md5`` of the decimal-rendered key and the threshold is a
hex-prefix compare, because md5 is bit-identical in every engine (the
DuckDB oracle runs the very same expression). Two hex chars give
1/256-granular rates; use more chars for finer strata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t


@register(
    "sample_hash_stratified",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
          < CASE WHEN o_orderpriority = '1-URGENT' THEN '80' ELSE '1a' END
    """,
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample of ``orders``: ~50% of URGENT
    orders ('80'/256), ~10% of everything else ('1a'/256).

    Plan shape: a single codegen'd filter over the scan — no shuffle,
    no RNG state. At 100 TB the per-stratum rates can come from a
    broadcast dimension instead of the inline CASE.
    """
    orders = t(spark, sf_dir, "orders")
    threshold = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.lit("80")
    ).otherwise(F.lit("1a"))
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    return orders.filter(bucket < threshold).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "sample_split_assign",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
                    THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                    THEN 'val'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~5% / ~5% / ~90% via
    md5 hex-prefix bands 00-0c / 0d-19 / 1a-ff).

    The split is a pure function of the document id — stable across
    runs, machines, and engine versions, so no document ever migrates
    between train and eval when the corpus is regenerated (the leakage
    failure mode of random splits at 100 TB). Codegen'd projection,
    no shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        F.when(b < "0d", F.lit("test"))
        .when(b < "1a", F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


_PER_GROUP_K = 40


@register(
    "sample_topk_per_group",
    oracle=f"""
    SELECT doc_id, source
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= {_PER_GROUP_K}
    """,
)
def sample_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample ("40 docs per source"):
    rank each group by the md5 of its key and keep the first k — the
    budget-capped variant of hash sampling (rates give you a FRACTION
    per stratum; this gives you a COUNT per stratum).

    The window never sorts whole groups at scale: rank-with-limit
    compiles to WindowGroupLimit, which keeps only a k-row heap per
    group on each side of the shuffle. Deterministic across re-runs
    and partition layouts — the same k rows survive every refresh, so
    a downstream incremental consumer sees a stable sample.
    """
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PER_GROUP_K)
        .select("doc_id", "source")
    )
