"""Round-4u extension operators (SURVEY.md §2.35): semantic
invariants beyond the oracle hash — periodogram vs numpy recompute,
winsor band membership, rollup vs python tree walk."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_periodogram_matches_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["ts_periodogram"](spark, SF_T2)
        .toPandas()
        .set_index("p")
        .sort_index()
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = ev.groupby("d")["cents"].sum().sort_index()
    idx = (daily.index - daily.index.min()).days.to_numpy()
    x = daily.to_numpy().astype(float)
    for p in range(2, 15):
        cx = np.floor(x * np.cos(2 * np.pi * idx / p) + 0.5).sum()
        cy = np.floor(x * np.sin(2 * np.pi * idx / p) + 0.5).sum()
        amp = math.floor(math.hypot(cx, cy) / len(x) + 0.5)
        assert got.loc[p, "amp_cents"] == amp
        assert got.loc[p, "n"] == len(x)


def test_periodogram_covers_periods(spark, queries):
    got = queries["ts_periodogram"](spark, SF_SMOKE).toPandas()
    assert sorted(got["p"]) == list(range(2, 15))
    assert (got["amp_cents"] >= 0).all()


def test_winsorize_band_membership(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["transform_winsorize"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    assert len(got) == len(o)  # row-preserving
    for grp, g in o.groupby("o_orderpriority"):
        lo = np.quantile(g["cents"], 0.05)
        hi = np.quantile(g["cents"], 0.95)
        sub = got[got["grp"] == grp]
        assert (sub["winsor_cents"] >= math.ceil(lo)).all()
        assert (sub["winsor_cents"] <= math.floor(hi)).all()
        inside = sub[sub["clamped"] == 0]
        assert (inside["winsor_cents"] == inside["cents"]).all()
        out = sub[sub["clamped"] == 1]
        assert ((out["cents"] < lo) | (out["cents"] > hi)).all()


def test_winsorize_reduces_variance(spark, queries):
    got = queries["transform_winsorize"](spark, SF_T2).toPandas()
    assert got["winsor_cents"].var() < got["cents"].var()


def test_hier_rollup_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["hier_rollup_spend"](spark, SF_SMOKE)
        .toPandas()
        .set_index("c_custkey")
        .sort_index()
    )
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    spend = o.groupby("o_custkey")["cents"].sum().to_dict()
    keys = [
        r["c_custkey"]
        for r in t(spark, SF_SMOKE, "customer").select("c_custkey").collect()
    ]
    desc = {}
    for c in keys:
        a = c // 10
        while a >= 1:
            desc.setdefault(a, []).append(c)
            a //= 10
    assert set(got.index) == set(desc)
    for anc, ds in desc.items():
        r = got.loc[anc]
        assert r["n_desc"] == len(ds)
        assert r["desc_c"] == sum(spend.get(d, 0) for d in ds)
        assert r["own_c"] == spend.get(anc, 0)
        assert r["subtree_c"] == r["own_c"] + r["desc_c"]


def test_hier_rollup_root_dominates(spark, queries):
    got = queries["hier_rollup_spend"](spark, SF_SMOKE).toPandas()
    # ancestors higher in the tree aggregate more descendants
    top = got.sort_values("n_desc", ascending=False).iloc[0]
    assert top["n_desc"] >= got["n_desc"].median()
    assert (got["subtree_c"] == got["own_c"] + got["desc_c"]).all()
