"""Round-4af extension operators (SURVEY.md §2.46): semantic
invariants beyond the oracle hash — ECE recompute, float32 audit vs
numpy casting, complement table vs python."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_calibration_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_calibration_error"](spark, SF_T2).toPandas().iloc[0]
    ev = t(spark, SF_T2, "events").toPandas()
    ev["segment"] = ev["user_id"] % 97
    ev["fold"] = ev["user_id"] % 2
    ev["k"] = (ev["event_type"] == "purchase").astype(int)
    tr = ev[ev["fold"] == 0].groupby("segment")["k"].agg(["sum", "size"])
    ho = ev[ev["fold"] == 1].groupby("segment")["k"].agg(["sum", "size"])
    p0 = tr["sum"].sum() / tr["size"].sum()
    total_gap = 0
    total_n = 0
    n_seg = 0
    for seg in tr.index:
        if seg not in ho.index:
            continue
        pred = (tr.loc[seg, "sum"] + 50 * p0) / (tr.loc[seg, "size"] + 50)
        obs = ho.loc[seg, "sum"] / ho.loc[seg, "size"]
        gap_e6 = math.floor(abs(pred - obs) * 1e6 + 0.5)
        total_gap += gap_e6 * ho.loc[seg, "size"]
        total_n += ho.loc[seg, "size"]
        n_seg += 1
    assert got["n_segments"] == n_seg
    assert got["n_holdout_events"] == total_n
    assert abs(got["ece"] - math.floor(total_gap / total_n + 0.5) / 1e6) < 1e-12


def test_calibration_is_small_for_honest_model(spark, queries):
    got = queries["agg_calibration_error"](spark, SF_T2).toPandas().iloc[0]
    # the fixture's segments share one true rate, so the smoothed
    # prediction should be close to holdout reality (ECE ≪ the rate)
    assert 0 <= got["ece"] < 0.2


def test_float32_audit_matches_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["fn_float32_precision_audit"](spark, SF_T2)
        .toPandas()
        .set_index("order_year")
        .sort_index()
    )
    o = t(spark, SF_T2, "orders").toPandas()
    exact = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    narrowed = np.floor(
        o["o_totalprice"].to_numpy().astype("float32").astype("float64")
        * 100
        + 0.5
    ).astype("int64")
    o["lossy"] = exact != narrowed
    o["err"] = np.abs(narrowed - exact)
    o["y"] = pd.to_datetime(o["o_orderdate"]).dt.year
    per = o.groupby("y").agg(
        n=("lossy", "size"), n_lossy=("lossy", "sum")
    )
    assert (got["n"] == per["n"]).all()
    assert (got["n_lossy"] == per["n_lossy"]).all()
    # high-value orders genuinely lose cents at float32
    assert int(got["n_lossy"].sum()) > 0
    worst = o[o["lossy"]].groupby("y")["err"].max()
    for y, v in worst.items():
        assert got.loc[y, "max_cents_error"] == v


def test_complement_rank_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_complement_rank"](spark, SF_SMOKE).toPandas()
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    op = set(zip(li["l_orderkey"], li["l_partkey"]))
    orders = defaultdict(set)
    part_n = Counter()
    for ok, pk in op:
        orders[ok].add(pk)
        part_n[pk] += 1
    total = len(orders)
    together = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for x in ps:
            for y in ps:
                if x != y:
                    together[(x, y)] += 1
    scored = defaultdict(list)
    for (x, y), c in together.items():
        if c < 3:
            continue
        lift_e6 = math.floor(c * total / (part_n[x] * part_n[y]) * 1e6 + 0.5)
        scored[x].append((-lift_e6, y, c))
    expected = {}
    for anchor, cands in scored.items():
        for rn, (neg_l, partner, c) in enumerate(sorted(cands)[:3], 1):
            expected[(anchor, partner)] = (c, -neg_l, rn)
    got_map = {
        (r["anchor"], r["partner"]): (
            r["together"],
            r["lift_e6"],
            r["rn"],
        )
        for _, r in got.iterrows()
    }
    assert got_map == expected


def test_complement_rank_shape(spark, queries):
    got = queries["join_complement_rank"](spark, SF_T2).toPandas()
    assert got.groupby("anchor")["rn"].max().le(3).all()
    assert (got["together"] >= 3).all()
    assert (got["anchor"] != got["partner"]).all()
