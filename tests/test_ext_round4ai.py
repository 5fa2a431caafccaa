"""Round-4ai extension operators (SURVEY.md §2.49): semantic
invariants beyond the oracle hash — bridge identity, sampling
coordination proof, balanced-sample shape."""

from __future__ import annotations

import hashlib

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_pvm_bridge_identity(spark, queries):
    got = queries["agg_pvm_bridge"](spark, SF_T2).toPandas()
    assert len(got) > 0
    # decomposition sums exactly: price + volume + cross = ΔR
    for _, r in got.iterrows():
        assert (
            r["price_effect_c"]
            + r["volume_effect_c"]
            + r["cross_effect_c"]
            == r["delta_cents"]
        )
        assert r["n_parts"] > 0


def test_pvm_bridge_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_pvm_bridge"](spark, SF_SMOKE)
        .toPandas()
        .set_index("brand")
    )
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    p = t(spark, SF_SMOKE, "part").toPandas()[["p_partkey", "p_brand"]]
    li = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    li["y"] = pd.to_datetime(li["l_shipdate"]).dt.year
    li = li[li["y"].isin([1997, 1998])]
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    li["qty"] = li["l_quantity"].astype("int64")
    py = li.groupby(["p_brand", "l_partkey", "y"]).agg(
        cents=("cents", "sum"), qty=("qty", "sum")
    )
    import math

    per_brand = {}
    for (brand, part, y) in py.index:
        if y != 1997 or (brand, part, 1998) not in py.index:
            continue
        c0, q0 = py.loc[(brand, part, 1997)]
        c1, q1 = py.loc[(brand, part, 1998)]
        price = math.floor((c1 / q1 - c0 / q0) * q0 + 0.5)
        vol = math.floor(c0 / q0 * (q1 - q0) + 0.5)
        agg = per_brand.setdefault(brand, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += c1 - c0
        agg[2] += price
        agg[3] += vol
    assert set(got.index) == set(per_brand)
    for brand, (n, dr, pr, vo) in per_brand.items():
        r = got.loc[brand]
        assert r["n_parts"] == n
        assert r["delta_cents"] == dr
        assert r["price_effect_c"] == pr
        assert r["volume_effect_c"] == vo


def test_consistent_sampling_has_zero_inconsistency(spark, queries):
    got = queries["fn_consistent_sampling"](spark, SF_T2).toPandas().iloc[0]
    assert got["n_inconsistent"] == 0  # the whole point
    assert 0 < got["n_orders_keys"] < got["n_orders_total"]
    assert 0 < got["n_events_keys"] < got["n_events_total"]
    # roughly 20% of entities sampled (binomial slack)
    frac = got["n_orders_keys"] / got["n_orders_total"]
    assert 0.1 < frac < 0.3


def test_consistent_sampling_matches_python_hash(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["fn_consistent_sampling"](spark, SF_SMOKE).toPandas().iloc[0]
    o = t(spark, SF_SMOKE, "orders").toPandas()

    def keep(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 100 < 20

    expected = {k for k in o["o_custkey"].unique() if keep(k)}
    assert got["n_orders_keys"] == len(expected)


def test_balanced_classes_shape(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["sample_balanced_classes"](spark, SF_T2).toPandas()
    sizes = got.groupby("label").size()
    emb = t(spark, SF_T2, "embeddings").toPandas()
    avail = emb.groupby("label").size()
    for lab, n in sizes.items():
        assert n == min(30, avail[lab])
    # deterministic: re-running returns the identical sample
    again = queries["sample_balanced_classes"](spark, SF_T2).toPandas()
    a = set(zip(got["label"], got["vec_id"]))
    b = set(zip(again["label"], again["vec_id"]))
    assert a == b
