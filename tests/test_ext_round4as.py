"""Round-4as extension operators (SURVEY.md §2.59): semantic
invariants beyond the oracle hash — crosspoint vs cumulative
recompute, Mood's χ² vs scipy-free math, Benford expectation mass."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_pareto_crosspoint_matches_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_pareto_crosspoint"](spark, SF_T2).toPandas().iloc[0]
    o = t(spark, SF_T2, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    spend = (
        o.groupby("o_custkey")["cents"]
        .sum()
        .reset_index()
        .sort_values(["cents", "o_custkey"], ascending=[False, True])
    )
    tot = int(spend["cents"].sum())
    cum = 0
    k80 = None
    for i, (_, r) in enumerate(spend.iterrows(), start=1):
        cum += int(r["cents"])
        if cum * 100 >= tot * 80:
            k80 = i
            break
    assert got["n_customers"] == len(spend)
    assert got["k80"] == k80
    expected_share = math.floor(k80 / len(spend) * 1e6 + 0.5) / 1e6
    assert abs(got["k80_share"] - expected_share) < 1e-12
    # flat fixture: nowhere near a literal 80/20
    assert got["k80_share"] > 0.5


def test_moods_test_matches_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_moods_median_test"](spark, SF_T2).toPandas().iloc[0]
    o = t(spark, SF_T2, "orders").toPandas()
    o = o[o["o_orderstatus"].isin(["O", "F"])]
    o["v"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    med = np.quantile(o["v"], 0.5)
    g1 = o[o["o_orderstatus"] == "O"]
    g0 = o[o["o_orderstatus"] == "F"]
    n1, a1 = len(g1), int((g1["v"] > med).sum())
    n0, a0 = len(g0), int((g0["v"] > med).sum())
    det = a1 * (n0 - a0) - a0 * (n1 - a1)
    chi2 = (n1 + n0) * det * det / (
        (a1 + a0) * (n1 + n0 - a1 - a0) * n1 * n0
    )
    assert got["n_open"] == n1 and got["above_open"] == a1
    assert got["n_filled"] == n0 and got["above_filled"] == a0
    assert abs(got["chi2"] - math.floor(chi2 * 1e4 + 0.5) / 1e4) < 1e-9
    # same distribution: comfortably under the 3.84 significance line
    assert got["chi2"] < 3.84


def test_benford_second_digit_shape(spark, queries):
    got = queries["dq_benford_second_digit"](spark, SF_T2).toPandas()
    assert sorted(got["d2"]) == list(range(10))
    # expectations carry the full probability mass (to rounding)
    total_obs = int(got["observed"].sum())
    total_exp = int(got["expected_n"].sum())
    assert abs(total_obs - total_exp) <= 10
    assert (got["chi2_term"] >= 0).all()
    # synthetic uniform prices flunk Benford loudly: χ² sum is huge
    assert got["chi2_term"].sum() > 21.67  # 0.01 critical for 9 dof


def test_benford_expectations_are_the_published_law(spark, queries):
    got = (
        queries["dq_benford_second_digit"](spark, SF_SMOKE)
        .toPandas()
        .set_index("d2")
    )
    n = got["observed"].sum()
    for d in range(10):
        p = sum(math.log10(1 + 1 / (10 * k + d)) for k in range(1, 10))
        assert got.loc[d, "expected_n"] == math.floor(p * n + 0.5)
    # the law is decreasing in d
    exps = [got.loc[d, "expected_n"] for d in range(10)]
    assert all(exps[i] >= exps[i + 1] for i in range(9))
