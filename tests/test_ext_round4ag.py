"""Round-4ag extension operators (SURVEY.md §2.47): semantic
invariants beyond the oracle hash — BCG quadrant rules, ABC mass
boundaries, progressive duty vs python."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_bcg_quadrant_rules(spark, queries):
    got = queries["agg_bcg_matrix"](spark, SF_T2).toPandas()
    for y, g in got.groupby("y"):
        best = g["rev_cents"].max()
        for _, r in g.iterrows():
            leader = r["rev_cents"] == best
            if r["quadrant"] == "new":
                assert pd.isna(r["grew"])
                continue
            if leader and r["grew"] == 1:
                assert r["quadrant"] == "star"
            elif leader:
                assert r["quadrant"] == "cash_cow"
            elif r["grew"] == 1:
                assert r["quadrant"] == "question"
            else:
                assert r["quadrant"] == "dog"
            assert 0 < r["rel_share"] <= 1.0
            if leader:
                assert abs(r["rel_share"] - 1.0) < 1e-9


def test_bcg_first_year_all_new(spark, queries):
    got = queries["agg_bcg_matrix"](spark, SF_T2).toPandas()
    first_y = got["y"].min()
    assert (got.loc[got["y"] == first_y, "quadrant"] == "new").all()


def test_abc_xyz_covers_all_parts(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_abc_xyz"](spark, SF_T2).toPandas()
    n_parts = (
        t(spark, SF_T2, "lineitem").select("l_partkey").distinct().count()
    )
    assert int(got["n_parts"].sum()) == n_parts
    assert set(got["abc"]).issubset({"A", "B", "C"})
    assert set(got["xyz"]).issubset({"X", "Y", "Z"})
    # the A class (top 80% mass) holds most of the revenue
    by_abc = got.groupby("abc")["rev_cents"].sum()
    assert by_abc.get("A", 0) > by_abc.get("C", 0)


def test_abc_boundaries_match_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_abc_xyz"](spark, SF_SMOKE).toPandas()
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    pr = (
        li.groupby("l_partkey")["cents"]
        .sum()
        .reset_index()
        .sort_values(["cents", "l_partkey"], ascending=[False, True])
    )
    tot = int(pr["cents"].sum())
    cum = 0
    abc_count = {"A": 0, "B": 0, "C": 0}
    for _, r in pr.iterrows():
        cum += int(r["cents"])
        if cum * 100 <= tot * 80:
            abc_count["A"] += 1
        elif cum * 100 <= tot * 95:
            abc_count["B"] += 1
        else:
            abc_count["C"] += 1
    by_abc = got.groupby("abc")["n_parts"].sum()
    for k, v in abc_count.items():
        assert by_abc.get(k, 0) == v, k


def _duty(v: int) -> int:
    x10 = (
        max(min(v, 15000000) - 5000000, 0) * 1
        + max(min(v, 30000000) - 15000000, 0) * 2
        + max(v - 30000000, 0) * 3
    )
    return x10 // 10


def test_tax_brackets_match_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["fn_tax_brackets"](spark, SF_T2)
        .toPandas()
        .set_index("y")
        .sort_index()
    )
    o = t(spark, SF_T2, "orders").toPandas()
    o["v"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["duty"] = o["v"].map(_duty)
    o["yy"] = pd.to_datetime(o["o_orderdate"]).dt.year
    per = o.groupby("yy").agg(n=("v", "size"), duty=("duty", "sum"), v=("v", "sum"))
    assert (got["n"] == per["n"]).all()
    assert (got["duty_total_cents"] == per["duty"]).all()
    for y in per.index:
        expected = math.floor(per.loc[y, "duty"] / per.loc[y, "v"] * 1e6 + 0.5) / 1e6
        assert abs(got.loc[y, "effective_rate"] - expected) < 1e-12
    # marginal structure: some orders are below the first bracket
    assert (o["duty"] < o["v"] * 0.3).all()
    assert int(per["duty"].sum()) > 0


def test_duty_is_monotone_and_continuous(spark):
    # piecewise-marginal duty must be monotone and continuous at knots
    for v in (4999999, 5000000, 5000001, 14999999, 15000000, 15000001,
              29999999, 30000000, 30000001):
        assert _duty(v + 1) >= _duty(v)
    for knot in (5000000, 15000000, 30000000):
        assert abs(_duty(knot + 1) - _duty(knot)) <= 1
