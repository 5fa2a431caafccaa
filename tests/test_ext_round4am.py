"""Round-4am extension operators (SURVEY.md §2.53): semantic
invariants beyond the oracle hash — HHI vs share recompute, geomean
under arithmetic mean, denormalized column certified."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_hhi_matches_share_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_hhi_concentration"](spark, SF_T2)
        .toPandas()
        .set_index("y")
    )
    li = t(spark, SF_T2, "lineitem").toPandas()
    p = t(spark, SF_T2, "part").toPandas()[["p_partkey", "p_brand"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["y"] = pd.to_datetime(j["l_shipdate"]).dt.year
    j["cents"] = (j["l_extendedprice"] * 100 + 0.5).astype("int64")
    for y, g in j.groupby("y"):
        by_brand = g.groupby("p_brand")["cents"].sum().to_numpy(float)
        hhi = (by_brand**2).sum() * 1e4 / by_brand.sum() ** 2
        r = got.loc[y]
        assert r["n_brands"] == len(by_brand)
        assert abs(r["hhi"] - math.floor(hhi * 1e4 + 0.5) / 1e4) < 1e-12
    # 25 near-equal brands → HHI near 10000/25 = 400 (unconcentrated)
    assert got["hhi"].between(300, 600).all()


def test_geomean_below_arithmetic_mean(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["win_rolling_geomean"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for et, g in ev.groupby("event_type"):
        s = g.groupby("d")["cents"].sum().sort_index()
        sub = (
            got[got["event_type"] == et]
            .sort_values("day_ms")
            .reset_index(drop=True)
        )
        assert len(sub) == len(s)
        for i in range(len(sub)):
            lo = max(0, i - 6)
            window = s.iloc[lo : i + 1]
            # AM-GM: geometric mean never exceeds arithmetic mean
            assert sub["geomean_cents"].iloc[i] <= window.mean() + 1
            # and matches the e6-ln recompute exactly
            lsum = sum(
                math.floor(math.log(v) * 1e6 + 0.5) for v in window
            )
            gm = math.floor(math.exp(lsum / len(window) / 1e6) + 0.5)
            assert sub["geomean_cents"].iloc[i] == gm


def test_denormalized_audit_certifies_fixture(spark, queries):
    got = queries["dq_denormalized_field_audit"](spark, SF_T2).toPandas()
    # the fixture's n_chars is truthful — audit must report zero drift
    assert (got["n_stale"] == 0).all()
    assert got["worst_drift"].isna().all()
    assert (got["true_chars"] == got["claimed_chars"]).all()
    assert int(got["n_docs"].sum()) > 0


def test_denormalized_audit_detects_planted_drift(spark):
    # the audit logic itself must catch a stale value when one exists
    from pyspark.sql import functions as F
    from census_postgres_py_spark.tables import t

    d = t(spark, SF_SMOKE, "documents").withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 17 == 0, F.col("n_chars") + 5).otherwise(
            F.col("n_chars")
        ),
    )
    stale = (
        d.filter(F.col("n_chars") != F.length("text")).count()
    )
    planted = d.filter(F.col("doc_id") % 17 == 0).count()
    assert stale == planted > 0
