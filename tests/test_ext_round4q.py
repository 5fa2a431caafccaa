"""Round-4q extension operators (SURVEY.md §2.31): semantic
invariants beyond the oracle hash — skyline vs brute-force dominance,
concurrency curve vs direct interval counting, truncation-retention
bounds."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE


def test_skyline_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_skyline"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["dms"] = (
        pd.to_datetime(o["o_orderdate"]).astype("int64") // 10**6
    )
    pts = list(zip(o["o_orderkey"], o["cents"], o["dms"]))
    expected = {
        k
        for k, c, d in pts
        if not any(
            (qc <= c and qd >= d and (qc < c or qd > d))
            for _, qc, qd in pts
        )
    }
    assert set(got["o_orderkey"]) == expected


def test_skyline_is_pareto_antichain(spark, queries):
    got = queries["join_skyline"](spark, SF_SMOKE).toPandas()
    rows = list(zip(got["cents"], got["date_ms"]))
    for i, (c1, d1) in enumerate(rows):
        for c2, d2 in rows[i + 1 :]:
            # no member may dominate another
            assert not (c1 <= c2 and d1 >= d2 and (c1 < c2 or d1 > d2))
            assert not (c2 <= c1 and d2 >= d1 and (c2 < c1 or d2 > d1))


def test_active_intervals_match_direct_count(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["ts_active_intervals"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["s"] = pd.to_datetime(o["o_orderdate"])
    o["e"] = o["s"] + pd.to_timedelta(
        (o["o_orderkey"] % 30 + 1).astype(int), unit="D"
    )
    got["d"] = pd.to_datetime(got["day_ms"], unit="ms")
    # spot-check 25 evenly spaced days against a direct interval count
    for i in range(0, len(got), max(1, len(got) // 25)):
        d = got["d"].iloc[i]
        direct = int(((o["s"] <= d) & (d <= o["e"])).sum())
        assert got["n_active"].iloc[i] == direct, str(d)


def test_active_intervals_curve_sums_to_order_days(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["ts_active_intervals"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    # Σ_day active(day) = Σ_order (duration+1 days), when the curve
    # covers every day with an active order — fill gaps: days absent
    # from the curve carry the previous value, so integrate stepwise
    got = got.sort_values("day_ms").reset_index(drop=True)
    total = 0
    for i in range(len(got) - 1):
        span_days = (got["day_ms"][i + 1] - got["day_ms"][i]) // 86400000
        total += int(got["n_active"][i]) * int(span_days)
    total += int(got["n_active"].iloc[-1])  # final day (curve ends at 0-ish)
    dur = (o["o_orderkey"] % 30 + 2).astype(int)  # (k%30+1)+1 inclusive days
    assert total == int(dur.sum())


def test_truncation_retention_bounds(spark, queries):
    got = queries["emb_truncation_quality"](spark, SF_SMOKE).toPandas()
    assert (got["min_ret_e6"] >= 0).all()
    assert (got["avg_ret_e6"] <= 1000000).all()
    assert (got["min_ret_e6"] <= got["avg_ret_e6"]).all()


def test_truncation_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["emb_truncation_quality"](spark, SF_SMOKE).toPandas()
    rows = t(spark, SF_SMOKE, "embeddings").collect()
    per_label = {}
    for r in rows:
        v = r["embedding"]
        num = 0.0
        for x in v[:32]:
            num += float(x) * float(x)
        den = 0.0
        for x in v:
            den += float(x) * float(x)
        e6 = math.floor(math.sqrt(num / den) * 1e6 + 0.5)
        per_label.setdefault(r["label"], []).append(e6)
    for _, r in got.iterrows():
        vals = per_label[r["label"]]
        assert r["n"] == len(vals)
        assert r["min_ret_e6"] == min(vals)
        assert r["avg_ret_e6"] == math.floor(sum(vals) / len(vals) + 0.5)
