"""Round-4ad extension operators (SURVEY.md §2.44): semantic
invariants beyond the oracle hash — Laspeyres base month = 1.0,
backlog conservation, seasonal strength bounds."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_laspeyres_base_month_is_unity(spark, queries):
    got = (
        queries["agg_price_index_laspeyres"](spark, SF_T2)
        .toPandas()
        .sort_values("month_ms")
        .reset_index(drop=True)
    )
    # the base (first) month re-prices its own basket: index exactly 1
    assert abs(got["laspeyres"].iloc[0] - 1.0) < 2e-6
    assert (got["laspeyres"] > 0).all()
    # matched-basket size can never exceed the base basket
    assert (got["n_parts"] <= got["n_parts"].iloc[0]).all()


def test_laspeyres_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_price_index_laspeyres"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("month_ms")
        .reset_index(drop=True)
    )
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    li["qty"] = li["l_quantity"].astype("int64")
    li["m"] = pd.to_datetime(li["l_shipdate"]).dt.to_period("M")
    pm = li.groupby(["l_partkey", "m"]).agg(
        cents=("cents", "sum"), qty=("qty", "sum")
    )
    bm = li["m"].min()
    base = pm.xs(bm, level="m")
    for _, r in got.iterrows():
        m = pd.to_datetime(r["month_ms"], unit="ms").to_period("M")
        cur = pm.xs(m, level="m")
        both = base.index.intersection(cur.index)
        num = sum(
            math.floor(
                cur.loc[p, "cents"] * base.loc[p, "qty"] / cur.loc[p, "qty"]
                + 0.5
            )
            for p in both
        )
        den = int(base.loc[both, "cents"].sum())
        assert r["n_parts"] == len(both)
        assert abs(r["laspeyres"] - math.floor(num / den * 1e6 + 0.5) / 1e6) < 1e-12


def test_backlog_conserves_to_zero(spark, queries):
    got = (
        queries["ts_backlog_value"](spark, SF_T2)
        .toPandas()
        .sort_values("day_ms")
        .reset_index(drop=True)
    )
    # last day is the day AFTER the final close: cumulative returns to 0
    assert got["backlog_cents"].iloc[-1] == 0
    assert (got["backlog_cents"].iloc[:-1] >= 0).all()
    assert got["backlog_cents"].max() > 0


def test_backlog_spot_check_direct(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["ts_backlog_value"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("day_ms")
        .reset_index(drop=True)
    )
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["s"] = pd.to_datetime(o["o_orderdate"])
    o["e"] = o["s"] + pd.to_timedelta(
        (o["o_orderkey"] % 30 + 1).astype(int), unit="D"
    )
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    got["d"] = pd.to_datetime(got["day_ms"], unit="ms")
    for i in range(0, len(got), max(1, len(got) // 20)):
        d = got["d"].iloc[i]
        direct = int(
            o.loc[(o["s"] <= d) & (d <= o["e"]), "cents"].sum()
        )
        assert got["backlog_cents"].iloc[i] == direct, str(d)


def test_seasonal_strength_bounds(spark, queries):
    got = queries["agg_seasonal_strength"](spark, SF_T2).toPandas()
    assert len(got) == 5
    assert got["seasonal_strength"].between(0.0, 1.0).all()
    assert (got["n"] > 20).all()
