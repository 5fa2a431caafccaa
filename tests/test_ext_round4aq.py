"""Round-4aq extension operators (SURVEY.md §2.57): semantic
invariants beyond the oracle hash — rank preservation + marginal
alignment after quantile normalization, covariance vs numpy,
Cohen's d vs recompute."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_qnorm_preserves_rank_order(spark, queries):
    got = queries["transform_quantile_normalize"](spark, SF_T2).toPandas()
    for _, g in got.groupby("grp"):
        g = g.sort_values(["cents", "o_orderkey"])
        # mapping is monotone in the original order
        assert g["qnorm_cents"].is_monotonic_increasing


def test_qnorm_aligns_marginals(spark, queries):
    got = queries["transform_quantile_normalize"](spark, SF_T2).toPandas()
    # after normalization every group's median sits near the pooled
    # median — the whole point of the transform
    pooled_median = got["qnorm_cents"].median()
    for _, g in got.groupby("grp"):
        assert (
            abs(g["qnorm_cents"].median() - pooled_median)
            / pooled_median
            < 0.02
        )
    assert len(got) == got["o_orderkey"].nunique()  # row-preserving


def test_qnorm_positions_match_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["transform_quantile_normalize"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    pooled = o.sort_values(["cents", "o_orderkey"]).reset_index(drop=True)
    N = len(pooled)
    ref = pooled["cents"].tolist()
    m = got.set_index("o_orderkey")
    for grp, g in o.groupby("o_orderpriority"):
        g = g.sort_values(["cents", "o_orderkey"]).reset_index(drop=True)
        n = len(g)
        for r0, (_, row) in enumerate(g.iterrows(), start=1):
            pos = (2 * r0 - 1) * N // (2 * n) + 1
            assert m.loc[row["o_orderkey"], "qnorm_cents"] == ref[pos - 1]


def test_covariance_matches_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_covariance_matrix"](spark, SF_T2).toPandas()
    li = t(spark, SF_T2, "lineitem").toPandas()
    q = li["l_quantity"].astype("int64").to_numpy(float)
    p = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    d = np.floor(li["l_discount"].to_numpy() * 10000 + 0.5)
    cols = {"quantity": q, "price_cents": p, "discount_bps": d}
    for _, r in got.iterrows():
        expected = float(
            np.cov(cols[r["ma"]], cols[r["mb"]], ddof=1)[0, 1]
        )
        assert abs(r["cov"] - expected) < max(1.0, abs(expected) * 1e-6)
    assert len(got) == 6


def test_cohens_d_negligible_for_same_distribution(spark, queries):
    got = queries["agg_cohens_d"](spark, SF_T2).toPandas().iloc[0]
    assert abs(got["cohens_d"]) < 0.2  # trivial effect, honest null
    assert got["n_open"] > 0 and got["n_filled"] > 0


def test_cohens_d_matches_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_cohens_d"](spark, SF_SMOKE).toPandas().iloc[0]
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o = o[o["o_orderstatus"].isin(["O", "F"])]
    o["v"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    g1 = o.loc[o["o_orderstatus"] == "O", "v"].to_numpy(float)
    g0 = o.loc[o["o_orderstatus"] == "F", "v"].to_numpy(float)
    pooled = math.sqrt(
        (
            ((g1**2).sum() - g1.sum() ** 2 / len(g1))
            + ((g0**2).sum() - g0.sum() ** 2 / len(g0))
        )
        / (len(g1) + len(g0) - 2)
    )
    dd = (g1.mean() - g0.mean()) / pooled
    assert abs(got["cohens_d"] - math.floor(dd * 1e6 + 0.5) / 1e6) < 1e-9
