"""Round-4m extension operators (SURVEY.md §2.27): semantic
invariants beyond the oracle hash — ACF bounds/self-consistency,
CUSUM argmax recompute, VWAP telescoping — plus plan sanity."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, SF_T2


def test_autocorr_bounded_and_covers_lags(spark, queries):
    df = queries["ts_autocorr"](spark, SF_T2).toPandas()
    assert (df["acf"].abs() <= 1.0 + 1e-9).all()
    assert set(df["lag"]) == set(range(1, 8))
    # 5 event types × 7 lags, 30-day series → every pair has n>2
    assert len(df) == 35
    assert (df["n_pairs"] > 2).all()


def test_autocorr_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["ts_autocorr"](spark, SF_SMOKE).toPandas()
    ev = t(spark, SF_SMOKE, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = (
        ev.groupby(["event_type", "d"])["cents"].sum().reset_index()
    )
    for _, r in df.iterrows():
        s = daily[daily["event_type"] == r["event_type"]].set_index("d")[
            "cents"
        ]
        pairs = pd.DataFrame(
            {"x": s, "y": s.reindex(s.index - pd.Timedelta(days=r["lag"])).values}
        ).dropna()
        expected = pairs["x"].corr(pairs["y"])
        assert abs(r["acf"] - expected) < 1e-4, (r["event_type"], r["lag"])


def test_cusum_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["ts_cusum_changepoint"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for _, r in df.iterrows():
        s = (
            ev[ev["event_type"] == r["event_type"]]
            .groupby("d")["cents"]
            .sum()
            .sort_index()
        )
        n, sn = len(s), int(s.sum())
        stats = [
            abs(n * int(s.iloc[: k + 1].sum()) - (k + 1) * sn)
            for k in range(n)
        ]
        best = max(stats)
        first_idx = stats.index(best)
        assert int(r["n_days"]) == n
        assert int(r["cp_index"]) == first_idx + 1
        assert int(r["cusum_abs"]) == best
        assert (
            int(s.index[first_idx].timestamp() * 1000) == r["cp_day_ms"]
        )


def test_vwap_telescopes_to_group_total(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["win_vwap"](spark, SF_SMOKE).toPandas()
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    li["qty"] = li["l_quantity"].astype("int64")
    li["pc"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    totals = (
        li.assign(pq=li["pc"] * li["qty"])
        .groupby("l_partkey")[["qty", "pq"]]
        .sum()
    )
    last = (
        df.sort_values(["l_partkey", "ship_ms", "l_orderkey", "l_linenumber"])
        .groupby("l_partkey")
        .tail(1)
        .set_index("l_partkey")
    )
    for pk, row in last.iterrows():
        tq, tpq = int(totals.loc[pk, "qty"]), int(totals.loc[pk, "pq"])
        assert int(row["cum_qty"]) == tq
        assert int(row["vwap_cents"]) == int(tpq / tq + 0.5)


def test_vwap_cumulative_monotone(spark, queries):
    df = queries["win_vwap"](spark, SF_SMOKE).toPandas()
    g = df.sort_values(
        ["l_partkey", "ship_ms", "l_orderkey", "l_linenumber"]
    ).groupby("l_partkey")["cum_qty"]
    assert (g.diff().dropna() > 0).all()


def test_autocorr_lag_pairing_is_broadcast(spark, queries):
    plan = (
        queries["ts_autocorr"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
