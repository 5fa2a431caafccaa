"""Statistical / product-analytics aggregates (SURVEY.md §2.12).

Both operators follow the repo's exact-arithmetic oracle discipline:
anything summed is an INTEGER (cents, centered day offsets), so the
partial-aggregate combine order can't perturb a single bit, and the
only floating point is one final division evaluated identically by
Spark and DuckDB. That is also the 100 TB posture — integer sums are
combinable partials with no ULP drift across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

_X_EPOCH = "1995-01-01"  # x centered here to keep n*Sxy inside int64/decimal


@register(
    "agg_regression",
    oracle=f"""
    WITH s AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x * x) AS HUGEINT) AS sxx,
               CAST(sum(x * y) AS HUGEINT) AS sxy
        FROM (SELECT o_orderpriority,
                     datediff('day', DATE '{_X_EPOCH}',
                              CAST(o_orderdate AS DATE)) AS x,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
              FROM orders)
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
               / 1000000 AS slope_cents_per_day,
           floor((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 100 + 0.5)
               / 100 AS intercept_cents
    FROM s
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit (order price trend per priority class) from
    the five classic sufficient statistics — n, Σx, Σy, Σxx, Σxy — as
    EXACT integer sums (x = days since {_X_EPOCH}, y = price cents),
    carried in decimal(38,0) so n·Σxy (~1e20 at sf1) cannot overflow
    or round. slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) evaluated in one
    deterministic double division at the end.

    This is the mergeable-partials pattern for ANY moment-based
    statistic: the five sums combine associatively across partitions
    (one map-side-combinable shuffle), unlike a fit on gathered rows.
    Spark's regr_slope/regr_intercept exist but accumulate doubles —
    order-dependent ULPs — which is why the exact-sum form is both the
    scale answer and the hash-stable one."""
    o = t(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    x = F.datediff(F.col("o_orderdate").cast("date"), F.lit(_X_EPOCH).cast("date"))
    y = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    s = (
        o.select("o_orderpriority", x.alias("x"), y.alias("y"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").cast(d38).alias("sx"),
            F.sum("y").cast(d38).alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
        )
    )
    n38 = F.col("n").cast(d38)
    numer = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denom = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = numer / denom
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "o_orderpriority",
        "n",
        (F.floor(slope * 1000000 + F.lit(0.5)) / 1000000).alias(
            "slope_cents_per_day"
        ),
        (F.floor(intercept * 100 + F.lit(0.5)) / 100).alias("intercept_cents"),
    )


_COHORT_EPOCH = "2024-01-01"  # events span 2024-01; weeks = 7-day buckets


@register(
    "agg_retention_cohort",
    oracle=f"""
    WITH um AS (
        SELECT DISTINCT user_id,
               CAST(datediff('day', DATE '{_COHORT_EPOCH}', CAST(ts AS DATE))
                    // 7 AS INTEGER) AS w
        FROM events
    ),
    c AS (SELECT user_id, min(w) AS cw FROM um GROUP BY user_id)
    SELECT cw AS cohort_week, CAST(w - cw AS INTEGER) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM um JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted in each later week they return. The product-analytics
    staple (and a genuinely multi-stage plan: distinct -> min -> join
    -> count). Weekly 7-day buckets from a fixed epoch because the
    events fixture spans one month — the bucket arithmetic is pure
    integer (no date_trunc week-start or months_between semantics to
    disagree on).

    Scale shape: (user, week) distinct and the per-user min both
    shuffle on user_id, so AQE coalesces them into co-partitioned
    stages with no extra exchange for the join; the final count(*)
    needs no distinct because (user, week) was already deduped."""
    ev = t(spark, sf_dir, "events")
    w = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(_COHORT_EPOCH).cast("date"))
        / 7
    ).cast("int")
    um = ev.select("user_id", w.alias("w")).distinct()
    c = um.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        um.join(c, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("w") - F.col("cw")).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "win_moving_regression",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey, o_orderkey,
               datediff('day', DATE '{_X_EPOCH}',
                        CAST(o_orderdate AS DATE)) AS x,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders
    ), w AS (
        SELECT o_custkey, o_orderkey,
               CAST(count(*) OVER win AS BIGINT)  AS n,
               sum(x)     OVER win AS sx,
               sum(y)     OVER win AS sy,
               sum(x * x) OVER win AS sxx,
               sum(x * y) OVER win AS sxy
        FROM base
        WINDOW win AS (PARTITION BY o_custkey
                       ORDER BY x, o_orderkey
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey, n AS n_window,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE)
                           * 1000000 + 0.5) / 1000000
           END AS slope_cents_per_day
    FROM w
    """,
)
def win_moving_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling per-customer OLS price trend over the trailing 7 orders.

    The moving-regression trick: all five OLS sufficient statistics are
    WINDOW SUMS over the same ROWS frame, so the whole fit is one
    window pass of integer arithmetic (exact, merge-order-free) plus a
    final double division — no self-join against the trailing rows, no
    UDAF. One shuffle on o_custkey; the frame is bounded so state per
    row is O(1). The same five-sums shape computes rolling variance,
    covariance, and beta at 100 TB.
    """
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_X_EPOCH).cast("date")
        ).alias("x"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    win = (
        Window.partitionBy("o_custkey")
        .orderBy("x", "o_orderkey")
        .rowsBetween(-6, 0)
    )
    x, y = F.col("x"), F.col("y")
    w = base.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(win).alias("n"),
        F.sum(x).over(win).alias("sx"),
        F.sum(y).over(win).alias("sy"),
        F.sum(x * x).over(win).alias("sxx"),
        F.sum(x * y).over(win).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy).cast("double") / den.cast("double")
    return w.select(
        "o_custkey",
        "o_orderkey",
        n.alias("n_window"),
        F.when(
            den != 0, F.floor(slope * 1000000 + F.lit(0.5)) / 1000000
        ).alias("slope_cents_per_day"),
    )
