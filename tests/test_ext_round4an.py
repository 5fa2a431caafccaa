"""Round-4an extension operators (SURVEY.md §2.54): semantic
invariants beyond the oracle hash — DiD placebo near zero, Simpson
screen vs numpy signs, reconciliation accounts for every order."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_did_placebo_near_zero(spark, queries):
    got = queries["agg_did_estimate"](spark, SF_T2).toPandas().iloc[0]
    assert got["n_cells"] == 4
    # no treatment was applied: the DiD estimate is a placebo and
    # should be a tiny fraction of the ~310000-cent mean unit price
    assert abs(got["did_cents"]) < 20000


def test_did_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_did_estimate"](spark, SF_SMOKE).toPandas().iloc[0]
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    p = t(spark, SF_SMOKE, "part").toPandas()[["p_partkey", "p_brand"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["treated"] = j["p_brand"].str.contains("1").astype(int)
    j["post"] = (
        pd.to_datetime(j["l_shipdate"]).dt.year >= 1998
    ).astype(int)
    j["cents"] = (j["l_extendedprice"] * 100 + 0.5).astype("int64")
    j["qty"] = j["l_quantity"].astype("int64")
    cells = j.groupby(["treated", "post"]).agg(
        c=("cents", "sum"), q=("qty", "sum")
    )
    up = (cells["c"] / cells["q"]).to_dict()
    did = (up[(1, 1)] - up[(1, 0)]) - (up[(0, 1)] - up[(0, 0)])
    assert abs(got["did_cents"] - math.floor(did * 1e4 + 0.5) / 1e4) < 1e-9


def test_simpson_screen_matches_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_simpson_flip"](spark, SF_T2).toPandas().iloc[0]
    o = t(spark, SF_T2, "orders").toPandas()
    c = t(spark, SF_T2, "customer").toPandas()[
        ["c_custkey", "c_nationkey", "c_acctbal"]
    ]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = np.floor(j["c_acctbal"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    j["y"] = (j["o_totalprice"] * 100 + 0.5).astype("int64")
    def sgn(g):
        n = len(g)
        num = n * (g["x"] * g["y"]).sum() - g["x"].sum() * g["y"].sum()
        return 1 if num > 0 else -1
    per = {
        nk: sgn(g)
        for nk, g in j.groupby("c_nationkey")
        if len(g) > 2
    }
    overall = sgn(j)
    agreeing = sum(1 for s in per.values() if s == overall)
    assert got["overall_sgn"] == overall
    assert got["n_strata"] == len(per)
    assert got["n_agreeing"] == agreeing
    assert got["simpson_flip"] == int(agreeing * 2 < len(per))


def test_reconcile_accounts_for_every_order(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_header_detail_reconcile"](spark, SF_T2).toPandas()
    n_orders = t(spark, SF_T2, "orders").count()
    assert int(got["n_orders"].sum()) == n_orders
    # independently-generated headers and lines: imbalance dominates
    by_status = got.groupby("status")["n_orders"].sum()
    assert by_status.get("mismatch", 0) > by_status.get("balanced", 0)
    # balanced rows carry zero gap by definition
    bal = got[got["status"] == "balanced"]
    assert (bal["abs_gap_cents"] == 0).all()


def test_reconcile_gap_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_header_detail_reconcile"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    li = t(spark, SF_SMOKE, "lineitem").toPandas()
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    lines = li.groupby("l_orderkey")["cents"].sum()
    o["header"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["line"] = o["o_orderkey"].map(lines)
    o["y"] = pd.to_datetime(o["o_orderdate"]).dt.year
    o["status"] = np.where(
        o["line"].isna(),
        "no_lines",
        np.where(o["header"] == o["line"], "balanced", "mismatch"),
    )
    o["gap"] = (o["header"] - o["line"].fillna(0)).abs().astype("int64")
    per = o.groupby(["y", "status"]).agg(
        n_orders=("gap", "size"), abs_gap_cents=("gap", "sum")
    )
    m = got.set_index(["y", "status"]).sort_index()
    assert (m["n_orders"] == per.sort_index()["n_orders"]).all()
    assert (m["abs_gap_cents"] == per.sort_index()["abs_gap_cents"]).all()
