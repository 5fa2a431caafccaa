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


@register(
    "snapshot_diff",
    oracle="""
    WITH snap_a AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % 10 <> 7
    ), snap_b AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 10 = 3
                    THEN o_totalprice + 1.0 ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 4
    )
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_kind
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.o_totalprice <> b.o_totalprice
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot table diff: classify every key as added /
    removed / changed between two versions of a table (derived
    deterministically here: snapshot A drops keys ending in 7,
    snapshot B drops keys ending in 4 and perturbs prices ending
    in 3).

    The audit primitive behind incremental-load validation and
    time-travel debugging: ONE full-outer shuffle join on the key,
    change classification as a codegen'd projection, unchanged rows
    filtered before anything downstream materializes. At 100 TB both
    sides prune to (key + compared columns) at the scan, and AQE
    handles the skew; the alternative — hashing whole rows — reads
    every column instead.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_a = o.filter(F.col("o_orderkey") % 10 != 7)
    snap_b = o.filter(F.col("o_orderkey") % 10 != 4).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 3, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    a = snap_a.select(
        F.col("o_orderkey").alias("ak"),
        F.col("o_orderstatus").alias("a_status"),
        F.col("o_totalprice").alias("a_price"),
    )
    b = snap_b.select(
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderstatus").alias("b_status"),
        F.col("o_totalprice").alias("b_price"),
    )
    j = a.join(b, a.ak == b.bk, "full_outer")
    diff = j.filter(
        F.col("ak").isNull()
        | F.col("bk").isNull()
        | (F.col("a_status") != F.col("b_status"))
        | (F.col("a_price") != F.col("b_price"))
    )
    return diff.select(
        F.coalesce("ak", "bk").alias("o_orderkey"),
        F.when(F.col("ak").isNull(), "added")
        .when(F.col("bk").isNull(), "removed")
        .otherwise("changed")
        .alias("change_kind"),
    )
