"""Round-4z extension operators (SURVEY.md §2.40): semantic
invariants beyond the oracle hash — attribution mass conservation,
Lorenz convexity, FK containment vs python sets."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_attribution_sums_to_10000_per_conversion(spark, queries):
    got = queries["win_attribution_position"](spark, SF_T2).toPandas()
    sums = got.groupby("conv_id")["credit_bps"].sum()
    assert (sums == 10000).all()
    assert (got["credit_bps"] > 0).all()


def test_attribution_u_shape(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["win_attribution_position"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["ts"] = pd.to_datetime(ev["ts"])
    clicks = ev[ev["event_type"] == "click"]
    purch = ev[ev["event_type"] == "purchase"]
    # rebuild one conversion's path and check the 40/20/40 split
    checked = 0
    for _, c in purch.iterrows():
        path = clicks[
            (clicks["user_id"] == c["user_id"])
            & (clicks["ts"] < c["ts"])
            & (clicks["ts"] >= c["ts"] - pd.Timedelta(days=3))
        ].sort_values(["ts", "event_id"])
        n = len(path)
        if n < 3:
            continue
        sub = got[got["conv_id"] == c["event_id"]].set_index("touch_id")
        assert len(sub) == n
        first, last = path["event_id"].iloc[0], path["event_id"].iloc[-1]
        assert sub.loc[first, "credit_bps"] == 4000
        assert sub.loc[last, "credit_bps"] == 4000
        mids = path["event_id"].iloc[1:-1]
        mid_credits = sub.loc[mids, "credit_bps"]
        assert mid_credits.sum() == 2000
        assert mid_credits.min() >= 2000 // (n - 2)
        checked += 1
        if checked >= 25:
            break
    assert checked > 0


def test_lorenz_curve_is_convex_and_complete(spark, queries):
    got = (
        queries["agg_lorenz_points"](spark, SF_T2)
        .toPandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    assert list(got["decile"]) == list(range(10))
    # cumulative share is increasing and ends at exactly 1
    assert (got["cum_share"].diff().dropna() > 0).all()
    assert abs(got["cum_share"].iloc[-1] - 1.0) < 2e-6
    assert abs(got["cum_pop"].iloc[-1] - 1.0) < 2e-6
    # Lorenz curve lies under the diagonal (poorest deciles first)
    assert (got["cum_share"] <= got["cum_pop"] + 2e-6).all()
    # convexity: per-decile share increases with decile
    shares = got["cum_share"].diff().dropna()
    assert (shares.diff().dropna() >= -2e-6).all()


def test_fk_inference_matches_python_sets(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_fk_inference"](spark, SF_SMOKE).toPandas()
    assert len(got) == 4
    tables = {
        n: t(spark, SF_SMOKE, n).toPandas()
        for n in ("orders", "customer", "lineitem", "part", "supplier", "events")
    }
    spec = {
        "orders.o_custkey": ("orders", "o_custkey"),
        "customer.c_custkey": ("customer", "c_custkey"),
        "lineitem.l_partkey": ("lineitem", "l_partkey"),
        "part.p_partkey": ("part", "p_partkey"),
        "lineitem.l_suppkey": ("lineitem", "l_suppkey"),
        "supplier.s_suppkey": ("supplier", "s_suppkey"),
        "events.user_id": ("events", "user_id"),
    }
    for _, r in got.iterrows():
        ct, cc = spec[r["child_col"]]
        pt, pc = spec[r["parent_col"]]
        child = set(tables[ct][cc])
        parent = set(tables[pt][pc])
        assert r["n_child_distinct"] == len(child)
        assert r["n_parent_distinct"] == len(parent)
        assert r["n_contained"] == len(child & parent)
    # the three real FKs are fully contained
    real = got[got["child_col"] != "events.user_id"]
    assert (real["containment"] == 1.0).all()
