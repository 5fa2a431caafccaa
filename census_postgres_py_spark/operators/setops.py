"""Sort / limit / set ops / exact dedup (SURVEY.md §2.6).

Reference behaviors re-expressed: multi-state stacking = UNION ALL
[PK], primary-key enforcement on load = keep-one dedup [PK]; the rest
are mandated extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. Spark compiles orderBy().limit(k) to TakeOrdered —
    per-partition heaps of size k, merged on the driver: no global
    sort, no full shuffle, O(n) scan at any scale. The tiebreak on
    o_orderkey makes the row SET deterministic (hash compare is
    order-insensitive but the cut line must be stable)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "union_all",
    oracle="""
    WITH stacked AS (
        SELECT l_returnflag, l_quantity FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT l_returnflag, l_quantity FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM stacked
    GROUP BY l_returnflag
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file stacking (the reference stacks per-state sequence
    files into one table [PK]). unionByName is plan-level — zero data
    movement; partitions of both inputs are simply concatenated."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_shipdate"
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    early = li.filter(F.col("l_shipdate") < cutoff)
    late = li.filter(F.col("l_shipdate") >= cutoff)
    return (
        early.unionByName(late)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 (set semantics)."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")

    def year(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).intersect(year(1996))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1995 but not 1996 (set difference).

    ``DataFrame.subtract`` is EXCEPT DISTINCT — any custkey present in
    1996 at all is removed, matching SQL EXCEPT. (``exceptAll`` is
    multiset subtraction and keeps keys whose 1995 count exceeds their
    1996 count — wrong semantics here.)
    """
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")

    def year(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).distinct().subtract(year(1996))


@register(
    "dedup_exact",
    oracle="""
    WITH doubled AS (
        SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem
    ), kept AS (
        SELECT *, row_number() OVER (
                    PARTITION BY l_orderkey, l_linenumber
                    ORDER BY l_partkey, l_suppkey, l_quantity,
                             l_extendedprice, l_discount, l_tax,
                             l_returnflag, l_linestatus, l_shipdate) AS rn
        FROM doubled
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM kept WHERE rn = 1
    GROUP BY l_returnflag
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact key dedup (PK enforcement on load [PK]).

    The fixture's (l_orderkey, l_linenumber) key groups carry DIFFERING
    payloads, so an arbitrary keep-one (``dropDuplicates``) is
    nondeterministic and can't hash-match any oracle. Instead keep-one
    is pinned to a total deterministic order over every remaining
    column — a window + ``rn = 1``, identical on both sides. Same scale
    shape as dropDuplicates: one hash shuffle on the key plus a
    per-partition sort.
    """
    li = t(spark, sf_dir, "lineitem")
    doubled = li.unionByName(li)
    order_cols = [
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ]
    w = (
        Window.partitionBy("l_orderkey", "l_linenumber")
        .orderBy(*[F.col(c) for c in order_cols])
    )
    return (
        doubled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@register(
    "dedup_keep_best",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_orderkey, l_linenumber
                   ORDER BY l_quantity DESC, l_extendedprice DESC) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup: one survivor per duplicate key, chosen by an
    explicit quality order — the production dedup shape (dedup_exact's
    keep-ANY is only safe when duplicates are byte-identical).

    The fixture's lineitem has ~12k duplicate (orderkey, linenumber)
    groups, so this genuinely drops rows. row_number over the quality
    order + rn=1 filter is one shuffle and Spark rewrites it to a
    WindowGroupLimit (top-1 per group pushed before the full sort
    materializes). The ORDER BY covers every exported column, so any
    remaining ties are byte-identical rows and the survivor multiset
    is deterministic — re-runnable at 100 TB.
    """
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.col("l_quantity").desc(), F.col("l_extendedprice").desc()
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _orders_year(o: DataFrame, y: int) -> DataFrame:
    return o.filter(
        (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
    ).select("o_custkey")


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): each customer keeps
    max(0, n_1995 - n_1996) copies — "how many MORE orders than last
    year", which set-EXCEPT (set_except) can't express. The round-1
    bug was using this where set semantics were wanted; both now exist
    as first-class operators with their exact SQL twins. Spark plans
    it as one hash aggregation on counts, not a sort."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return _orders_year(o, 1995).exceptAll(_orders_year(o, 1996))


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    INTERSECT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): min(n_1995, n_1996)
    copies per customer — the "matched activity volume" twin of
    set_intersect's membership test."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return _orders_year(o, 1995).intersectAll(_orders_year(o, 1996))
