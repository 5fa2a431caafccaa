"""Round-4ap extension operators (SURVEY.md §2.56): semantic
invariants beyond the oracle hash — destination vs python geodesic,
burn-rate math, conflict-rate recompute."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_geo_destination_matches_python(spark, queries):
    got = (
        queries["fn_geo_destination"](spark, SF_SMOKE)
        .toPandas()
        .set_index("c_custkey")
    )
    R = 6371.0088
    for k in list(got.index)[:200]:
        lat = math.radians(((k * 37 + k * k * 13) % 1200) / 10.0 - 60.0)
        lon = math.radians(((k * 73 + k * k * 29) % 3600) / 10.0 - 180.0)
        brg = math.radians(k % 360)
        ang = (k % 500 + 100) / R
        sin_lat2 = math.sin(lat) * math.cos(ang) + math.cos(
            lat
        ) * math.sin(ang) * math.cos(brg)
        dlat = math.degrees(math.asin(sin_lat2))
        dlon = math.degrees(
            lon
            + math.atan2(
                math.sin(brg) * math.sin(ang) * math.cos(lat),
                math.cos(ang) - math.sin(lat) * sin_lat2,
            )
        )
        r = got.loc[k]
        assert abs(r["dest_lat"] - math.floor(dlat * 1e4 + 0.5) / 1e4) < 1e-9
        assert abs(
            r["dest_lon_raw"] - math.floor(dlon * 1e4 + 0.5) / 1e4
        ) < 1e-9


def test_geo_destination_distance_roundtrip(spark, queries):
    # the destination must lie exactly the requested distance away
    got = (
        queries["fn_geo_destination"](spark, SF_SMOKE)
        .toPandas()
        .set_index("c_custkey")
    )
    R = 6371.0088

    def hav(p, q):
        la1, lo1 = map(math.radians, p)
        la2, lo2 = map(math.radians, q)
        a = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(a))

    for k in list(got.index)[:100]:
        lat = ((k * 37 + k * k * 13) % 1200) / 10.0 - 60.0
        lon = ((k * 73 + k * k * 29) % 3600) / 10.0 - 180.0
        want = k % 500 + 100
        r = got.loc[k]
        d = hav((lat, lon), (r["dest_lat"], r["dest_lon_raw"]))
        assert abs(d - want) < 0.1, k  # within 100 m of the asked distance


def test_burn_rate_math(spark, queries):
    got = queries["agg_error_budget_burn"](spark, SF_T2).toPandas()
    for _, r in got.iterrows():
        er = r["n_bad"] / r["n"]
        assert abs(r["error_rate"] - math.floor(er * 1e6 + 0.5) / 1e6) < 1e-12
        br = er / 0.4
        assert abs(r["burn_rate"] - math.floor(br * 1e4 + 0.5) / 1e4) < 1e-12
        assert r["page_alert"] == int(er > 0.8)
    # ~20% error mix: healthy against the loose objective, no pages
    assert (got["page_alert"] == 0).all()
    assert got["burn_rate"].between(0.3, 0.8).all()


def test_attribute_conflicts_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_attribute_conflicts"](spark, SF_T2).toPandas()
    c = t(spark, SF_T2, "customer").toPandas()
    c["hh"] = c["c_custkey"] // 3
    per = c.groupby("hh").agg(
        n_members=("c_custkey", "size"),
        n_nations=("c_nationkey", "nunique"),
    )
    for _, r in got.iterrows():
        sub = per[per["n_members"] == r["n_members"]]
        assert r["n_households"] == len(sub)
        assert r["n_conflicted"] == int((sub["n_nations"] > 1).sum())
    # dense keys → multi-member households exist and mostly conflict
    # (nation is custkey-derived, so siblings rarely match)
    multi = got[got["n_members"] > 1]
    assert (multi["conflict_rate"] > 0).all()
