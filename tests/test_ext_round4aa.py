"""Round-4aa extension operators (SURVEY.md §2.41): semantic
invariants beyond the oracle hash — feature snapshot leakage guard,
audit recovers injected corruption exactly, VMR vs numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_feature_store_no_leakage(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["pipeline_feature_store_e2e"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["d"] = pd.to_datetime(o["o_orderdate"])
    cut = o["d"].max().to_period("M").to_timestamp() - pd.DateOffset(
        months=3
    )
    pre = o[o["d"] < cut]
    # only customers with pre-cutoff orders appear
    assert set(got["c_custkey"]) == set(pre["o_custkey"])
    # recency is measured to the cutoff, never into the future
    assert (got["recency_days"] >= 0).all()
    by = pre.groupby("o_custkey")
    merged = got.set_index("c_custkey")
    for cust, g in by:
        r = merged.loc[cust]
        assert r["n_orders"] == len(g)
        assert r["recency_days"] == (cut - g["d"].max()).days
        assert r["active_months"] == g["d"].dt.to_period("M").nunique()


def test_feature_store_spend_matches(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["pipeline_feature_store_e2e"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["d"] = pd.to_datetime(o["o_orderdate"])
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    cut = o["d"].max().to_period("M").to_timestamp() - pd.DateOffset(
        months=3
    )
    spend = o[o["d"] < cut].groupby("o_custkey")["cents"].sum()
    merged = got.set_index("c_custkey")["spend_cents"]
    assert merged.sort_index().equals(spend.sort_index())


def test_temporal_audit_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_temporal_consistency"](spark, SF_T2).toPandas()
    li = t(spark, SF_T2, "lineitem").toPandas()
    o = t(spark, SF_T2, "orders").toPandas()[
        ["o_orderkey", "o_orderdate"]
    ]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["ship"] = pd.to_datetime(j["l_shipdate"])
    j["od"] = pd.to_datetime(j["o_orderdate"])
    j["viol"] = j["ship"] < j["od"]
    j["lead"] = (j["ship"] - j["od"]).dt.days
    per_year = j.groupby(j["od"].dt.year).agg(
        n_lines=("l_orderkey", "size"), n_violations=("viol", "sum")
    )
    worst = j[j["viol"]].groupby(j.loc[j["viol"], "od"].dt.year)[
        "lead"
    ].min()
    m = got.set_index("order_year").sort_index()
    assert (m["n_lines"] == per_year["n_lines"]).all()
    assert (m["n_violations"] == per_year["n_violations"]).all()
    for y, v in worst.items():
        assert m.loc[y, "worst_lead_days"] == v
    # the fixture genuinely contains impossible records — the audit
    # must surface them, not report a clean bill
    assert int(m["n_violations"].sum()) > 0
    assert (m["n_violations"] <= m["n_lines"]).all()


def test_vmr_matches_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_overdispersion"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for _, r in got.iterrows():
        x = (
            ev[ev["event_type"] == r["event_type"]]
            .groupby("d")
            .size()
            .to_numpy()
        )
        vmr = x.var(ddof=1) / x.mean()
        assert r["n"] == len(x)
        assert r["total"] == x.sum()
        assert abs(r["vmr"] - vmr) < 2e-6
