"""Round-4p extension operators (SURVEY.md §2.30): semantic
invariants beyond the oracle hash — fence-count recompute, E-S weight
bias direction, Bollinger flag recompute."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_iqr_fence_counts_match_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["dq_outlier_iqr"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    for _, r in df.iterrows():
        v = o.loc[o["o_orderpriority"] == r["grp"], "cents"].to_numpy()
        q1 = np.quantile(v, 0.25)
        q3 = np.quantile(v, 0.75)
        assert r["q1"] == q1 and r["q3"] == q3
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert r["n"] == len(v)
        assert r["n_low"] == int((v < lo).sum())
        assert r["n_high"] == int((v > hi).sum())


def test_weighted_sample_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["sample_weighted"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["w"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    keys = {}
    for _, r in o.iterrows():
        h = hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:13]
        u = (int(h, 16) + 1.0) / 4503599627370497.0
        keys[r["o_orderkey"]] = math.log(u) / r["w"]
    expected = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert list(got["o_orderkey"]) == [k for k, _ in expected]
    # ranked output column is the rounded key
    for (_, want), (_, r) in zip(expected, got.iterrows()):
        assert abs(r["es_key_r"] - want) < 2e-9


def test_weighted_sample_biases_toward_heavy_orders(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["sample_weighted"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    pop_mean = o["o_totalprice"].mean()
    samp_mean = (got["w_cents"] / 100.0).mean()
    # value-weighted sampling must overshoot the population mean
    assert samp_mean > pop_mean


def test_bollinger_flags_match_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["win_bollinger"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = (
        ev.groupby(["event_type", "d"])["cents"].sum().reset_index()
    )
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("d").reset_index(drop=True)
        sub = df[df["event_type"] == et].sort_values("day_ms").reset_index(
            drop=True
        )
        assert len(sub) == len(g)
        for i in range(len(g)):
            w = g["cents"].iloc[max(0, i - 6) : i + 1]
            n = len(w)
            mu = w.sum() / n
            var = (w**2).sum() / n - mu * mu
            x = g["cents"].iloc[i]
            up = int(n >= 3 and (x - mu) ** 2 > 4 * var and x > mu)
            dn = int(n >= 3 and (x - mu) ** 2 > 4 * var and x < mu)
            assert sub["breakout_up"].iloc[i] == up, (et, i)
            assert sub["breakout_down"].iloc[i] == dn, (et, i)
            assert sub["ma_cents"].iloc[i] == math.floor(mu + 0.5)


def test_weighted_sample_is_take_ordered(spark, queries):
    plan = (
        queries["sample_weighted"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
