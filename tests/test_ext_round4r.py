"""Round-4r extension operators (SURVEY.md §2.32): semantic
invariants beyond the oracle hash — waterfall identity, trimmed-mean
recompute, grid-KNN == brute-force nearest."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_growth_accounting_waterfall_identity(spark, queries):
    df = queries["agg_growth_accounting"](spark, SF_T2).toPandas()
    # net = new + expansion − contraction − churned, per month exactly
    for _, r in df.iterrows():
        assert (
            r["net_change_c"]
            == r["new_c"]
            + r["expansion_c"]
            - r["contraction_c"]
            - r["churned_c"]
        )
    # every component is a magnitude
    for col in ("new_c", "expansion_c", "contraction_c", "churned_c"):
        assert (df[col] >= 0).all()


def test_growth_accounting_first_month_all_new(spark, queries):
    df = (
        queries["agg_growth_accounting"](spark, SF_T2)
        .toPandas()
        .sort_values("month_ms")
    )
    first = df.iloc[0]
    assert first["expansion_c"] == 0
    assert first["contraction_c"] == 0
    assert first["churned_c"] == 0
    assert first["new_c"] == first["net_change_c"]


def test_trimmed_mean_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["agg_trimmed_mean"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    for _, r in df.iterrows():
        g = o[o["o_orderpriority"] == r["grp"]].sort_values(
            ["cents", "o_orderkey"]
        )
        n = len(g)
        k = n // 10
        kept = g["cents"].iloc[k : n - k]
        assert r["n_total"] == n
        assert r["n_kept"] == n - 2 * k
        assert r["trimmed_mean_cents"] == math.floor(
            kept.sum() / len(kept) + 0.5
        )
        assert r["trimmed_mean_floor_cents"] == kept.sum() // len(kept)


def test_trimmed_mean_between_quartiles(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["agg_trimmed_mean"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    for _, r in df.iterrows():
        v = o.loc[o["o_orderpriority"] == r["grp"], "cents"]
        assert v.quantile(0.1) <= r["trimmed_mean_cents"] <= v.quantile(0.9)


def test_nearest_facility_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_nearest_facility"](spark, SF_SMOKE).toPandas()

    def coords(k):
        lat = ((k * 37 + k * k * 13) % 1200) / 10.0 - 60.0
        lon = ((k * 73 + k * k * 29) % 3600) / 10.0 - 180.0
        return lat, lon

    def hav(p, q):
        R = 6371.0088
        la1, lo1 = map(math.radians, p)
        la2, lo2 = map(math.radians, q)
        a = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(a))

    custs = [
        r["c_custkey"]
        for r in t(spark, SF_SMOKE, "customer").select("c_custkey").collect()
    ]
    supps = [
        r["s_suppkey"]
        for r in t(spark, SF_SMOKE, "supplier").select("s_suppkey").collect()
    ]
    expected = {}
    for c in custs:
        best = None
        for s in supps:
            d = hav(coords(c), coords(s))
            if d <= 300.0:
                key = (math.floor(d * 1e4 + 0.5), s)
                if best is None or key < best:
                    best = key
        if best is not None:
            expected[c] = best
    got_map = {
        r["c_custkey"]: (r["dist_e4"], r["s_suppkey"])
        for _, r in got.iterrows()
    }
    assert got_map == expected


def test_nearest_facility_broadcasts_small_side(spark, queries):
    plan = (
        queries["join_nearest_facility"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
