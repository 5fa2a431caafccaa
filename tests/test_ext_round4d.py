"""Round-4d extension operators (SURVEY.md §2.18): semantic invariants
beyond the oracle hash — Benford digit coverage and ppm budget, Pareto
ordering, new+returning conservation, forecast backtest arithmetic —
plus plan pins for the single-aggregation claims."""

from __future__ import annotations

import math

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_benford_digits_and_expectations(spark, queries):
    df = queries["agg_benford"](spark, SF_T2).toPandas().set_index("digit")
    assert set(df.index) == set(range(1, 10))
    # shares sum to 1e6 within one rounding unit per digit
    assert abs(int(df["share_ppm"].sum()) - 1_000_000) <= 9
    for d in range(1, 10):
        want = math.floor(math.log10(1 + 1.0 / d) * 1e6 + 0.5)
        assert df.loc[d, "benford_ppm"] == want
        assert (
            df.loc[d, "deviation_ppm"]
            == df.loc[d, "share_ppm"] - df.loc[d, "benford_ppm"]
        )
    assert int(df["n_values"].sum()) > 0


def test_pareto_shares_monotone(spark, queries):
    row = queries["agg_pareto_share"](spark, SF_T2).collect()[0]
    assert 0 < row["top1pct_ppm"] <= row["top10pct_ppm"] <= row["top20pct_ppm"] <= 1_000_000
    assert 1 <= row["custs_for_80pct"] <= row["n_customers"]
    # concentration exists: top 1% holds more than 1% of revenue
    assert row["top1pct_ppm"] > 10_000


def test_new_vs_returning_conservation(spark, queries):
    df = queries["agg_new_vs_returning"](spark, SF_T2).toPandas().sort_values("week_ms")
    assert (df["new_users"] + df["returning_users"] == df["active_users"]).all()
    # week 1 is all-new by definition
    assert df.iloc[0]["new_share_ppm"] == 1_000_000
    assert df.iloc[0]["returning_users"] == 0
    # total new across weeks = distinct users ever active
    from census_postgres_py_spark.tables import t

    n_users = (
        t(spark, SF_T2, "events").select("user_id").distinct().count()
    )
    assert int(df["new_users"].sum()) == n_users


def test_forecast_backtest_arithmetic(spark, queries):
    df = queries["ts_forecast_naive"](spark, SF_T2).toPandas()
    assert len(df) <= 168
    assert (df["train_events"] + df["actual_last"] > 0).all()
    n_train = None
    for _, r in df.iterrows():
        fc = math.floor(r["train_events"] * 1e6 / 4 + 0.5)  # 5 weeks → 4 train
        if n_train is None:
            n_train = fc == r["forecast_ppm"]
        assert r["abs_err_ppm"] == abs(r["forecast_ppm"] - r["actual_last"] * 1_000_000)
    assert n_train  # fixture spans 5 ISO weeks → 4 train weeks


def test_forecast_single_aggregation_no_join(spark, queries):
    plan = executed_plan(queries["ts_forecast_naive"](spark, SF_SMOKE))
    # the only join is the 1-row broadcast of bounds
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_benford_is_single_pass(spark, queries):
    plan = executed_plan(queries["agg_benford"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
