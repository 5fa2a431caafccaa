"""Round-4ah extension operators (SURVEY.md §2.48): semantic
invariants beyond the oracle hash — FIFO vs a procedural simulator,
burstiness vs dense numpy, elasticity recompute."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_fifo_matches_procedural_simulation(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["join_fifo_matching"](spark, SF_SMOKE)
        .toPandas()
        .set_index("part")
    )
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    li["d"] = pd.to_datetime(li["l_shipdate"])
    li["q"] = li["l_quantity"].astype("int64")
    expected = {}
    for part, g in li.groupby("l_partkey"):
        g = g.sort_values(["d", "l_orderkey", "l_linenumber"])
        lots = [
            (r["d"], r["q"])
            for _, r in g[g["l_orderkey"] % 2 == 0].iterrows()
        ]
        demands = [
            (r["d"], r["q"])
            for _, r in g[g["l_orderkey"] % 2 == 1].iterrows()
        ]
        # procedural FIFO: consume oldest lot units first
        li_idx, left_in_lot = 0, lots[0][1] if lots else 0
        matched = n_matches = qty_age = 0
        for dd, dq in demands:
            need = dq
            while need > 0 and li_idx < len(lots):
                take = min(need, left_in_lot)
                if take > 0:
                    matched += take
                    n_matches += 1
                    qty_age += take * (dd - lots[li_idx][0]).days
                need -= take
                left_in_lot -= take
                if left_in_lot == 0:
                    li_idx += 1
                    left_in_lot = (
                        lots[li_idx][1] if li_idx < len(lots) else 0
                    )
        if matched or n_matches:
            r = got.loc[part]
            assert r["matched_qty"] == matched, part
            assert r["n_matches"] == n_matches, part
            assert r["qty_age_days"] == qty_age, part
        else:
            assert part not in got.index


def test_fifo_matched_qty_bounded(spark, queries):
    from census_postgres_py_spark.tables import t
    from pyspark.sql import functions as F

    got = queries["join_fifo_matching"](spark, SF_T2).toPandas()
    li = t(spark, SF_T2, "lineitem").toPandas()
    li["q"] = li["l_quantity"].astype("int64")
    supply = (
        li[li["l_orderkey"] % 2 == 0].groupby("l_partkey")["q"].sum()
    )
    demand = (
        li[li["l_orderkey"] % 2 == 1].groupby("l_partkey")["q"].sum()
    )
    for _, r in got.iterrows():
        cap = min(
            supply.get(r["part"], 0), demand.get(r["part"], 0)
        )
        assert r["matched_qty"] == cap  # overlap matches min(supply, demand)


def test_burstiness_matches_dense_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["text_burstiness"](spark, SF_SMOKE)
        .toPandas()
        .set_index("term")
    )
    docs = t(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    n = len(docs)
    counts = defaultdict(dict)
    for r in docs:
        for term, c in Counter(
            w for w in r["text"].split(" ") if w
        ).items():
            counts[term][r["doc_id"]] = c
    for term, per_doc in counts.items():
        total = sum(per_doc.values())
        if total < 50:
            assert term not in got.index
            continue
        x = np.zeros(n)
        x[: len(per_doc)] = list(per_doc.values())  # zeros elsewhere
        vmr = x.var(ddof=1) / x.mean()
        r = got.loc[term]
        assert r["df"] == len(per_doc)
        assert r["total"] == total
        assert abs(r["burstiness"] - vmr) < 2e-6


def test_elasticity_near_zero_for_random_prices(spark, queries):
    got = queries["agg_price_elasticity"](spark, SF_T2).toPandas()
    assert len(got) > 0
    # fixture prices are independent of demand: estimates hover near 0
    assert got["elasticity"].abs().max() < 2.0
    assert (got["n"] > 2).all()
