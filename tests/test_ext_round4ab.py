"""Round-4ab extension operators (SURVEY.md §2.42): semantic
invariants beyond the oracle hash — SPRT linearity recompute,
split-half centroid sanity, projection vs python sets."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_sprt_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_sprt_decision"](spark, SF_T2)
        .toPandas()
        .set_index("expt")
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev = ev[ev["event_type"].isin(["purchase", "click"])]
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["k"] = (ev["event_type"] == "purchase").astype(int)
    a = math.log(0.55 / 0.50)
    b = math.log(0.45 / 0.50)
    bound = math.log(19.0)
    for expt, g in ev.groupby(ev["user_id"] % 8):
        daily = g.groupby("d").agg(dk=("k", "sum"), dn=("k", "size"))
        daily = daily.sort_index()
        k = daily["dk"].cumsum()
        n = daily["dn"].cumsum()
        llr = k * a + (n - k) * b
        hit_days = [i + 1 for i, v in enumerate(llr) if abs(v) >= bound]
        r = got.loc[expt]
        assert r["k_final"] == k.iloc[-1]
        assert r["n_final"] == n.iloc[-1]
        expected_llr = math.floor(llr.iloc[-1] * 1e6 + 0.5) / 1e6
        assert abs(r["llr_final"] - expected_llr) < 1e-12
        if hit_days:
            assert r["decision_day"] == hit_days[0]
        else:
            assert pd.isna(r["decision_day"])


def test_centroid_drift_bounded_and_complete(spark, queries):
    got = queries["emb_centroid_drift"](spark, SF_T2).toPandas()
    assert len(got) == 10  # one row per label
    assert got["centroid_cos"].between(-1.0 - 1e-9, 1.0 + 1e-9).all()
    # fixture labels are NOT tight clusters (near-random vectors), so
    # split-half centroids are mostly noise — the monitor must report
    # that honestly rather than a flattering ~1.0
    assert got["centroid_cos"].abs().mean() < 0.5


def test_centroid_drift_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["emb_centroid_drift"](spark, SF_SMOKE)
        .toPandas()
        .set_index("label")
    )
    rows = t(spark, SF_SMOKE, "embeddings").collect()
    sums = defaultdict(lambda: [[0] * 64, 0])  # (label, half) -> [sumvec, n]
    for r in rows:
        key = (r["label"], r["vec_id"] % 2)
        s = sums[key]
        for i, x in enumerate(r["embedding"]):
            s[0][i] += math.floor(float(x) * 1e6 + 0.5)
        s[1] += 1
    labels = {k[0] for k in sums}
    for lab in labels:
        ca = [v / sums[(lab, 0)][1] for v in sums[(lab, 0)][0]]
        cb = [v / sums[(lab, 1)][1] for v in sums[(lab, 1)][0]]
        dot = sum(x * y for x, y in zip(ca, cb))
        na = math.sqrt(sum(x * x for x in ca))
        nb = math.sqrt(sum(y * y for y in cb))
        expected = math.floor(dot / na / nb * 1e6 + 0.5) / 1e6
        assert abs(got.loc[lab, "centroid_cos"] - expected) < 2e-6


def test_bipartite_projection_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_bipartite_projection"](spark, SF_SMOKE).toPandas()
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    cp = set(zip(j["o_custkey"], j["l_partkey"]))
    by_part = defaultdict(set)
    for c, p in cp:
        by_part[p].add(c)
    common = defaultdict(int)
    for p, custs in by_part.items():
        if len(custs) > 50:
            continue
        cl = sorted(custs)
        for i in range(len(cl)):
            for k in range(i + 1, len(cl)):
                common[(cl[i], cl[k])] += 1
    expected = {pair: n for pair, n in common.items() if n >= 3}
    got_map = {
        (r["cust_a"], r["cust_b"]): r["n_common"] for _, r in got.iterrows()
    }
    assert got_map == expected


def test_bipartite_projection_is_canonical(spark, queries):
    got = queries["join_bipartite_projection"](spark, SF_SMOKE).toPandas()
    assert (got["cust_a"] < got["cust_b"]).all()
    assert (got["n_common"] >= 3).all()
