"""Change-data-capture / dimension-history operators (SURVEY.md §2.12).

The reference loads full snapshots; a warehouse engine also has to
consume CHANGE feeds — compact a changelog to current state, and build
slowly-changing-dimension history from it. Both are one-shuffle window
patterns here (hash partition on the business key, then WindowGroupLimit
or lead()), which is exactly their 100 TB shape: no driver state, no
iteration, skew bounded by the hottest key's change count.

The orders table stands in for the change feed: key = o_custkey,
change-sequence = (o_orderdate, o_orderkey), payload = o_totalprice,
and o_orderstatus 'P' marks a delete event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

SCD2_OPEN_END = "9999-12-31"  # open validity sentinel for current rows


@register(
    "cdc_apply",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus,
               CAST(o_orderdate AS DATE) AS updated_day,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey AS last_seq, o_totalprice AS price,
           updated_day
    FROM ranked WHERE rn = 1 AND o_orderstatus <> 'P'
    """,
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: latest change per key wins; keys whose
    latest change is a delete vanish. This is the MERGE-free way to
    materialize current state from an append-only CDC feed (Debezium /
    binlog shape): deterministic total order per key, one shuffle,
    `row_number = 1` which Spark 4 executes as WindowGroupLimit — a
    streaming top-1 per key, no full sort of the history.

    Scale: cost is one hash exchange of the feed; a key's history
    lands on one task, so the bound is the hottest key's change count
    (salt + two-level top-1 if a key is truly pathological)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    o = t(spark, sf_dir, "orders")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("o_orderstatus") != "P"))
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_seq"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").cast("date").alias("updated_day"),
        )
    )


@register(
    "dim_scd2",
    oracle=f"""
    SELECT o_custkey,
           CAST(row_number() OVER w AS BIGINT) AS version,
           o_totalprice AS price,
           CAST(o_orderdate AS DATE) AS valid_from,
           coalesce(CAST(lead(o_orderdate) OVER w AS DATE),
                    DATE '{SCD2_OPEN_END}') AS valid_to,
           lead(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each change opens a
    version valid [its date, next change's date), the last version is
    open-ended and flagged current. The classic warehouse pattern the
    reference's full-snapshot loads sidestep — and on Spark it is one
    window over one shuffle (lead + row_number share the same frame),
    not the correlated-subquery crawl the textbook SQL implies.

    The tie-break (o_orderdate, o_orderkey) makes version numbering
    total, so the oracle matches row for row."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf_dir, "orders")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.coalesce(nxt.cast("date"), F.lit(SCD2_OPEN_END).cast("date")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    )
