"""Round-4s extension operators (SURVEY.md §2.33): semantic
invariants beyond the oracle hash — KS vs brute-force CDF sweep,
lift-table mass balance, rolling-corr vs pandas."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_ks_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_ks_statistic"](spark, SF_T2).toPandas().iloc[0]
    o = t(spark, SF_T2, "orders").toPandas()
    o = o[o["o_orderstatus"].isin(["O", "F"])]
    o["v"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    a = np.sort(o.loc[o["o_orderstatus"] == "O", "v"].to_numpy())
    b = np.sort(o.loc[o["o_orderstatus"] == "F", "v"].to_numpy())
    vals = np.unique(np.concatenate([a, b]))
    i = np.searchsorted(a, vals, side="right")
    j = np.searchsorted(b, vals, side="right")
    d_scaled = np.abs(i * len(b) - j * len(a))
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert got["d_scaled"] == d_scaled.max()
    assert got["at_cents"] == vals[d_scaled.argmax()]  # argmax is first max
    assert abs(
        got["d"] - d_scaled.max() / (len(a) * len(b))
    ) < 2e-6


def test_ks_statistic_invariant_to_bucket_width(spark, queries, monkeypatch):
    import census_postgres_py_spark.operators.ext_round4s as m

    base = queries["agg_ks_statistic"](spark, SF_SMOKE).toPandas()
    monkeypatch.setattr(m, "_KS_BUCKET", 1024)
    alt = m.agg_ks_statistic(spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), alt.reset_index(drop=True)
    )


def test_decile_lift_mass_balance(spark, queries):
    df = queries["agg_decile_lift"](spark, SF_T2).toPandas()
    assert sorted(df["decile"]) == list(range(10))
    from census_postgres_py_spark.tables import t

    n_cust = (
        t(spark, SF_T2, "orders").select("o_custkey").distinct().count()
    )
    assert int(df["n_cust"].sum()) == n_cust
    # deciles are near-equal (differ by at most 1)
    assert df["n_cust"].max() - df["n_cust"].min() <= 1
    # cumulative lift over all deciles converges to exactly 1
    last = df.sort_values("decile").iloc[-1]
    assert abs(last["cum_lift"] - 1.0) < 2e-6


def test_decile_lift_rates_consistent(spark, queries):
    df = queries["agg_decile_lift"](spark, SF_T2).toPandas()
    # response_rate is the per-decile rational, rendered half-up at 1e-6
    for _, r in df.iterrows():
        assert (
            abs(r["response_rate"] - r["responders"] / r["n_cust"]) < 2e-6
        )
    # the fixture's repurchase behavior is independent of spend, so
    # every cumulative lift stays near 1 (sanity band, not a model claim)
    assert df["cum_lift"].between(0.8, 1.2).all()


def test_rolling_corr_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["win_rolling_corr"](spark, SF_T2)
        .toPandas()
        .sort_values("day_ms")
        .reset_index(drop=True)
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = (
        ev.pivot_table(
            index="d",
            columns="event_type",
            values="cents",
            aggfunc="sum",
            fill_value=0,
        )
        .sort_index()
    )
    x = daily["click"].astype(float)
    y = daily["purchase"].astype(float)
    for idx in range(len(got)):
        lo = max(0, idx - 13)
        xs, ys = x.iloc[lo : idx + 1], y.iloc[lo : idx + 1]
        n = len(xs)
        assert got["n"].iloc[idx] == n
        if n >= 3:
            expected = np.corrcoef(xs, ys)[0, 1]
            assert abs(got["corr_14d"].iloc[idx] - expected) < 1e-4
        else:
            assert got["corr_14d"].iloc[idx] is None or math.isnan(
                got["corr_14d"].iloc[idx]
            )
