"""Round-4v extension operators (SURVEY.md §2.36): semantic
invariants beyond the oracle hash — adstock kernel recompute, WAU vs
direct window counting, workdays vs python date loop."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_adstock_matches_kernel_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_adstock"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for et, g in ev.groupby("event_type"):
        s = g.groupby("d")["cents"].sum()
        sub = got[got["event_type"] == et]
        for _, r in sub.iterrows():
            d = pd.to_datetime(r["day_ms"], unit="ms")
            expected = sum(
                int(s.get(d - pd.Timedelta(days=k), 0)) * (2 ** (7 - k))
                for k in range(8)
            )
            assert r["adstock_x128"] == expected, (et, d)


def test_adstock_dominated_by_current_tap(spark, queries):
    got = queries["agg_adstock"](spark, SF_SMOKE).toPandas()
    # x128 scaling keeps every value a positive integer multiple of 1
    assert (got["adstock_x128"] > 0).all()


def test_wau_matches_direct_window_count(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_rolling_active_users"](spark, SF_T2)
        .toPandas()
        .sort_values("day_ms")
        .reset_index(drop=True)
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    days = pd.date_range(ev["d"].min(), ev["d"].max(), freq="D")
    assert len(got) == len(days)
    for i in range(0, len(days), max(1, len(days) // 15)):
        d = days[i]
        direct = ev.loc[
            (ev["d"] >= d - pd.Timedelta(days=6)) & (ev["d"] <= d),
            "user_id",
        ].nunique()
        assert got["wau"].iloc[i] == direct, str(d)


def test_wau_at_least_dau(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_rolling_active_users"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    dau = ev.groupby("d")["user_id"].nunique()
    got["d"] = pd.to_datetime(got["day_ms"], unit="ms")
    merged = got.merge(
        dau.rename("dau").reset_index(), on="d", how="inner"
    )
    assert (merged["wau"] >= merged["dau"]).all()


def test_workdays_matches_python_loop(spark, queries):
    got = queries["fn_workdays_between"](spark, SF_SMOKE).toPandas()
    from census_postgres_py_spark.tables import t

    o = t(spark, SF_SMOKE, "orders").toPandas().set_index("o_orderkey")
    for _, r in got.sample(n=min(400, len(got)), random_state=7).iterrows():
        start = pd.to_datetime(
            o.loc[r["o_orderkey"], "o_orderdate"]
        ).date()
        expected = sum(
            1
            for i in range(int(r["span_days"]))
            if (start + dt.timedelta(days=i)).weekday() < 5
        )
        assert r["workdays"] == expected, (r["o_orderkey"], start)


def test_workdays_bounds(spark, queries):
    got = queries["fn_workdays_between"](spark, SF_T2).toPandas()
    # 5 of every 7, rounded up/down
    assert (got["workdays"] <= got["span_days"]).all()
    assert (got["workdays"] >= got["span_days"] // 7 * 5).all()
    assert (got["s0"].between(0, 6)).all()
