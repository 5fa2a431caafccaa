"""Scalar-function families, round-3 extensions (SURVEY.md §2.14):
bitwise arithmetic, calendar/date arithmetic, and IPv4 parsing.

All three are pure codegen'd projections — zero shuffles, zero Python —
the shape that whole-stage-codegen fuses into the scan at any scale.
The reference's own scalar surface is SQL-side Postgres expressions
[PK — SURVEY.md §1.1]; these are the Spark-native equivalents a log /
warehouse workload leans on daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 1023            AS k_and,
           o_orderkey | 4096            AS k_or,
           xor(o_orderkey, 21845)       AS k_xor,
           o_orderkey << 3              AS k_shl,
           o_orderkey >> 5              AS k_shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS k_popcount,
           CASE WHEN (o_orderkey & (o_orderkey - 1)) = 0 AND o_orderkey > 0
                THEN true ELSE false END AS is_pow2
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops: mask/set/toggle, shifts, popcount, power-of-two test.

    The workhorse family behind bitmap indexes, flag columns, and
    hash-partition math. Every expression is a single JVM intrinsic
    inside WholeStageCodegen — the popcount is the same instruction
    `agg_bitmap_distinct` builds its distinct-count on.
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 1023").alias("k_and"),
        F.expr("o_orderkey | 4096").alias("k_or"),
        F.expr("o_orderkey ^ 21845").alias("k_xor"),
        F.shiftleft(k, 3).alias("k_shl"),
        F.shiftright(k, 5).alias("k_shr"),
        F.bit_count(k).alias("k_popcount"),
        ((k.bitwiseAND(k - 1) == 0) & (k > 0)).alias("is_pow2"),
    )


@register(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH
                AS DATE)                                     AS plus_3m,
           date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE))              AS days_since,
           last_day(CAST(o_orderdate AS DATE))               AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER)             AS q,
           CAST(isodow(o_orderdate) AS INTEGER)              AS iso_dow,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE))
                AS DATE)                                     AS week_start
    FROM orders
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic: month-add (end-of-month clamped), day
    diffs, month/week boundaries, ISO weekday, quarter.

    Pinned to the cross-engine-identical subset: ``add_months`` clamps
    Jan-31 + 1m to Feb-28 exactly like DuckDB's month interval;
    ``weekday()+1`` is DuckDB's ``isodow`` (Mon=1); both engines
    truncate weeks to Monday. (``months_between`` is deliberately NOT
    here — its fractional-month semantics are engine-specific.)
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("q"),
        (F.weekday(d) + 1).alias("iso_dow"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
    )


# IPv4 octets are affine functions of user_id so the oracle can
# regenerate the SAME address strings, then both engines parse them
# back — string parse, not the generator, is what's under test.
_OCT = (
    "CAST((user_id * 131 + 7) % 256 AS BIGINT)",
    "CAST((user_id * 17 + 3) % 256 AS BIGINT)",
    "CAST((user_id * 29 + 11) % 256 AS BIGINT)",
    "CAST((user_id * 53 + 23) % 256 AS BIGINT)",
)
_IP_CONCAT = (
    f"concat({_OCT[0]}, '.', {_OCT[1]}, '.', {_OCT[2]}, '.', {_OCT[3]})"
)


@register(
    "fn_ip_parse",
    oracle=f"""
    WITH src AS (SELECT DISTINCT user_id, {_IP_CONCAT} AS ip
                 FROM events),
    parts AS (
        SELECT user_id, ip,
               CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
               CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
               CAST(string_split(ip, '.')[3] AS BIGINT) AS o3,
               CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
        FROM src
    )
    SELECT user_id, ip,
           (o1 << 24) + (o2 << 16) + (o3 << 8) + o4 AS ip_num,
           (o1 << 8) + o2                           AS subnet16,
           CASE WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                     OR (o1 = 192 AND o2 = 168)
                THEN true ELSE false END            AS is_private
    FROM parts
    """,
)
def fn_ip_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 string -> numeric form, /16 subnet key, RFC-1918 check.

    The log-analytics staple: parse once at ingest into an integer,
    then every CIDR/range predicate downstream is integer comparison
    (range-joinable, pushdown-able) instead of string matching. Parse
    is split + cast + shifts — all codegen'd; dedup to one row per
    user_id is a single combinable shuffle.
    """
    ev = t(spark, sf_dir, "events").select("user_id").distinct()
    src = ev.withColumn("ip", F.expr(_IP_CONCAT))
    parts = src.select(
        "user_id",
        "ip",
        *[
            F.split("ip", r"\.").getItem(i).cast("long").alias(f"o{i + 1}")
            for i in range(4)
        ],
    )
    o1, o2, o3, o4 = (F.col(f"o{i}") for i in range(1, 5))
    return parts.select(
        "user_id",
        "ip",
        (
            F.shiftleft(o1, 24) + F.shiftleft(o2, 16) + F.shiftleft(o3, 8) + o4
        ).alias("ip_num"),
        (F.shiftleft(o1, 8) + o2).alias("subnet16"),
        (
            (o1 == 10)
            | ((o1 == 172) & o2.between(16, 31))
            | ((o1 == 192) & (o2 == 168))
        ).alias("is_private"),
    )
