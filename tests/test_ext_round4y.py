"""Round-4y extension operators (SURVEY.md §2.39): semantic
invariants beyond the oracle hash — RSI vs pandas recompute, hashing
trick determinism/width, dormancy state conservation."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_rsi_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["win_rsi"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for et, g in ev.groupby("event_type"):
        s = g.groupby("d")["cents"].sum().sort_index()
        delta = s.diff().dropna()
        gain = delta.clip(lower=0)
        loss = (-delta).clip(lower=0)
        sub = (
            got[got["event_type"] == et]
            .sort_values("day_ms")
            .reset_index(drop=True)
        )
        assert len(sub) == len(delta)
        for i in range(len(sub)):
            lo = max(0, i - 13)
            sg = int(gain.iloc[lo : i + 1].sum())
            sl = int(loss.iloc[lo : i + 1].sum())
            if sg + sl > 0:
                expected = math.floor(100.0 * sg / (sg + sl) * 1e4 + 0.5) / 1e4
                assert abs(sub["rsi"].iloc[i] - expected) < 1e-12
            else:
                assert pd.isna(sub["rsi"].iloc[i])


def test_rsi_range(spark, queries):
    got = queries["win_rsi"](spark, SF_T2).toPandas()
    ok = got["rsi"].dropna()
    assert ok.between(0, 100).all()


def test_feature_hashing_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["text_feature_hashing"](spark, SF_SMOKE).toPandas()
    docs = t(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        cells = Counter()
        for term in [w for w in r["text"].split(" ") if w]:
            h = hashlib.md5(term.encode()).hexdigest()
            bucket = int(h[:8], 16) % 64
            sign = 1 if int(h[8], 16) % 2 == 0 else -1
            cells[bucket] += sign
        for b, wgt in cells.items():
            if wgt != 0:
                expected[(r["doc_id"], b)] = wgt
    got_map = {
        (r["doc_id"], r["bucket"]): r["weight"] for _, r in got.iterrows()
    }
    assert got_map == expected


def test_feature_hashing_fixed_width(spark, queries):
    got = queries["text_feature_hashing"](spark, SF_T2).toPandas()
    assert got["bucket"].between(0, 63).all()
    assert (got["weight"] != 0).all()


def test_dormancy_states_conserve_user_months(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_dormancy_states"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["m"] = (
        pd.to_datetime(o["o_orderdate"]).dt.year * 12
        + pd.to_datetime(o["o_orderdate"]).dt.month
        - 1
    )
    cm = o[["o_custkey", "m"]].drop_duplicates()
    assert int(got["n_customers"].sum()) == len(cm)
    # first month of the dataset is all 'new'
    first_m = got["month_index"].min()
    first = got[got["month_index"] == first_m]
    assert set(first["state"]) == {"new"}
    # every customer's first-ever month contributes exactly one 'new'
    n_new = got.loc[got["state"] == "new", "n_customers"].sum()
    assert n_new == cm["o_custkey"].nunique()


def test_dormancy_states_match_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_dormancy_states"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["m"] = (
        pd.to_datetime(o["o_orderdate"]).dt.year * 12
        + pd.to_datetime(o["o_orderdate"]).dt.month
        - 1
    )
    expected = Counter()
    for _, g in o.groupby("o_custkey"):
        ms = sorted(g["m"].unique())
        for i, m in enumerate(ms):
            if i == 0:
                expected[(m, "new")] += 1
            elif m - ms[i - 1] == 1:
                expected[(m, "retained")] += 1
            else:
                expected[(m, "reactivated")] += 1
    got_map = {
        (r["month_index"], r["state"]): r["n_customers"]
        for _, r in got.iterrows()
    }
    assert got_map == dict(expected)
