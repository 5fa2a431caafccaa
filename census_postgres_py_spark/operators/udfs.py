"""UDF / UDAF surface (SURVEY.md §2.9).

Policy (SURVEY.md §3.2): built-in functions first; when Python is
genuinely needed, Arrow-vectorized Pandas UDFs only — never
row-at-a-time `udf()`. Each operator here has a native-function twin
in its oracle SQL, so the harness double-checks the UDF path against
pure-SQL semantics (self-differential testing, SURVEY.md §5.2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t


@F.pandas_udf(DoubleType())
def _discounted_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Arrow-batched scalar UDF: whole columns in, whole columns out."""
    return price * (1.0 - discount)


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
               AS disc_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF vs the same math natively (the
    oracle IS the native twin — exact float-op-order equality).

    Rounding is ``floor(x*100 + 0.5)/100`` on both sides: Spark/DuckDB
    ``round(double, 2)`` disagree on half-cent boundaries (decimal-
    rendering HALF_UP vs binary-double rounding)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(_discounted_price("l_extendedprice", "l_discount") * 100 + 0.5) / 100)
        .alias("disc_price"),
    )


@F.pandas_udf(DoubleType())
def _weighted_avg(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: the whole group's columns arrive as one
    Arrow batch (requires groups to fit executor memory — fine for
    bounded group counts; for open-ended keys prefer the sum/sum
    decomposition)."""
    denom = qty.sum()
    return float((price * qty).sum() / denom) if denom else float("nan")


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
               AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (quantity-weighted mean price) as a grouped-agg
    Pandas UDF, checked against its sum/sum SQL decomposition."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_avg("l_extendedprice", "l_quantity"), 2).alias(
            "w_avg_price"
        )
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group map: z-score of event value within each user."""
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=1)  # stddev_samp semantics, matches SQL
    z = (pdf["value"] - mean) / std if std and std > 0 else pd.Series(
        [float("nan")] * len(pdf), index=pdf.index
    )
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(3)}
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 3) AS z
    FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map transform (per-user z-score), checked
    against the equivalent window-function SQL. Groups are streamed
    one Arrow batch per user — parallel across users, bounded by the
    largest single group."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _zscore, schema="event_id long, user_id long, z double"
    )
