"""Round-4ak extension operators (SURVEY.md §2.51): semantic
invariants beyond the oracle hash — reach/frequency identities,
returns accounting balance, ANOVA F vs scipy-free recompute."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_reach_frequency_identities(spark, queries):
    got = queries["agg_reach_frequency"](spark, SF_T2).toPandas()
    assert (got["reach"] <= got["impressions"]).all()
    assert (got["frequency"] >= 1.0 - 1e-9).all()
    for _, r in got.iterrows():
        expected = math.floor(
            r["impressions"] / r["reach"] * 1e6 + 0.5
        ) / 1e6
        assert abs(r["frequency"] - expected) < 1e-12


def test_reach_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_reach_frequency"](spark, SF_SMOKE).toPandas()
    ev = t(spark, SF_SMOKE, "events").toPandas()
    ev["wk"] = (
        pd.to_datetime(ev["ts"]).dt.floor("D").astype("int64")
        // 10**9
        // 604800
    )
    per = ev.groupby(["event_type", "wk"]).agg(
        impressions=("user_id", "size"), reach=("user_id", "nunique")
    )
    m = got.set_index(["event_type", "wk"]).sort_index()
    assert (m["impressions"] == per.sort_index()["impressions"]).all()
    assert (m["reach"] == per.sort_index()["reach"]).all()


def test_returns_accounting_balances(spark, queries):
    got = queries["join_returns_impact"](spark, SF_T2).toPandas()
    assert (got["net_cents"] <= got["gross_cents"]).all()
    assert (got["n_returned"] <= got["n_lines"]).all()
    # net + returned value = gross, checked via rate-consistency
    assert (got["return_rate"] <= 1.0).all()
    assert int(got["n_returned"].sum()) > 0


def test_returns_match_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["join_returns_impact"](spark, SF_SMOKE)
        .toPandas()
        .set_index(["brand", "y"])
        .sort_index()
    )
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    p = t(spark, SF_SMOKE, "part").toPandas()[["p_partkey", "p_brand"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["y"] = pd.to_datetime(j["l_shipdate"]).dt.year
    j["cents"] = (j["l_extendedprice"] * 100 + 0.5).astype("int64")
    j["ret"] = (j["l_returnflag"] == "R").astype(int)
    per = j.groupby(["p_brand", "y"]).agg(
        n_lines=("ret", "size"),
        n_returned=("ret", "sum"),
        gross=("cents", "sum"),
    )
    net = j[j["ret"] == 0].groupby(["p_brand", "y"])["cents"].sum()
    assert (got["n_lines"] == per.sort_index()["n_lines"]).all()
    assert (got["n_returned"] == per.sort_index()["n_returned"]).all()
    assert (got["gross_cents"] == per.sort_index()["gross"]).all()
    for key in per.index:
        assert got.loc[key, "net_cents"] == net.get(key, 0)


def test_anova_matches_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_anova_weekday"](spark, SF_T2)
        .toPandas()
        .set_index("event_type")
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["dow"] = pd.to_datetime(ev["ts"]).dt.dayofweek + 1
    for et, g in ev.groupby("event_type"):
        daily = g.groupby(["d", "dow"])["cents"].sum().reset_index()
        groups = [
            gg["cents"].to_numpy().astype(float)
            for _, gg in daily.groupby("dow")
        ]
        tn = sum(len(x) for x in groups)
        k = len(groups)
        tsx = sum(x.sum() for x in groups)
        tsxx = sum((x**2).sum() for x in groups)
        ssb_raw = sum(
            math.floor(x.sum() ** 2 / len(x) + 0.5) for x in groups
        )
        ssb = ssb_raw - tsx**2 / tn
        ssw = tsxx - ssb_raw
        f = (ssb / (k - 1)) / (ssw / (tn - k))
        r = got.loc[et]
        assert r["k"] == k and r["tn"] == tn
        assert abs(r["f_stat"] - math.floor(f * 1e4 + 0.5) / 1e4) < 1e-12
    # fixture has no weekday effect: F should be unremarkable (< 5)
    assert got["f_stat"].max() < 5.0
