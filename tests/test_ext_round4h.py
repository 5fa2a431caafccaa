"""Round-4h extension operators (SURVEY.md §2.22): semantic invariants
beyond the oracle hash — 4-4-5 band structure, decomposition identity,
partition-replace isolation — plus plan pins."""

from __future__ import annotations

import datetime as dt

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_fiscal_445_band_structure(spark, queries):
    df = queries["fn_fiscal_445"](spark, SF_T2).toPandas()
    assert df["fiscal_week"].between(1, 53).all()
    assert df["fiscal_quarter"].between(1, 4).all()
    assert df["fiscal_period"].between(1, 12).all()
    # quarter and period agree with the week by pure arithmetic
    for _, r in df.head(500).iterrows():
        wk = r["fiscal_week"]
        q = min((wk - 1) // 13, 3) + 1
        assert r["fiscal_quarter"] == q
        wk_in_q = wk - (q - 1) * 13
        p = (q - 1) * 3 + (1 if wk_in_q <= 4 else 2 if wk_in_q <= 8 else 3)
        assert r["fiscal_period"] == p
        # fiscal year starts Feb 1: day is within [Feb 1 FY, Feb 1 FY+1)
        d = dt.datetime.utcfromtimestamp(r["date_ms"] / 1000).date()
        start = dt.date(int(r["fiscal_year"]), 2, 1)
        assert start <= d < dt.date(int(r["fiscal_year"]) + 1, 2, 1)
        assert (d - start).days // 7 + 1 == wk


def test_fiscal_445_shuffle_free(spark, queries):
    plan = executed_plan(queries["fn_fiscal_445"](spark, SF_SMOKE))
    assert "Exchange" not in plan


def test_decompose_identity_and_coverage(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["ts_decompose_daily"](spark, SF_T2).toPandas()
    n_days = (
        t(spark, SF_T2, "events")
        .selectExpr("date_trunc('day', ts) AS d")
        .distinct()
        .count()
    )
    assert len(df) == n_days
    # exact reconstruction in milli-events
    assert (
        df["n"] * 1000 == df["trend_e3"] + df["seasonal_e3"] + df["residual_e3"]
    ).all()
    # seasonal depends only on dow
    assert (df.groupby("dow")["seasonal_e3"].nunique() == 1).all()
    # seasonal components of a balanced dow panel roughly cancel
    per_dow = df.groupby("dow")["seasonal_e3"].first()
    assert abs(per_dow.mean()) < 10_000


def test_dynamic_overwrite_replaces_only_target_partition(spark, queries):
    from census_postgres_py_spark.tables import t
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in queries["sink_dynamic_partition_overwrite"](
            spark, SF_T2
        ).collect()
    }
    src = (
        t(spark, SF_T2, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
            F.sum(
                F.floor(F.col("value") * 2 * 100 + F.lit(0.5)).cast("long")
            ).alias("cents2x"),
        )
        .collect()
    )
    for r in src:
        et = r["event_type"]
        assert got[et][0] == r["n"]  # row counts never change
        if et == "purchase":
            assert got[et][1] == r["cents2x"]  # replaced partition
        else:
            assert got[et][1] == r["cents"]  # untouched partitions
