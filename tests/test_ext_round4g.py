"""Round-4g extension operators (SURVEY.md §2.21): semantic invariants
beyond the oracle hash — mutual-match symmetry vs a numpy recompute,
drawdown identities, robust-scale sign/median behavior — plus plan
pins."""

from __future__ import annotations

import numpy as np

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_mutual_topk_matches_numpy(spark, queries):
    from census_postgres_py_spark.tables import t

    got = {
        (r["vec_a"], r["vec_b"])
        for r in queries["join_mutual_topk"](spark, SF_T2).collect()
    }
    rows = t(spark, SF_T2, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.floor(m @ m.T * 1e6 + 0.5) / 1e6  # the operator's rounding
    np.fill_diagonal(sims, -2.0)
    # best neighbor with (sim desc, id asc) tiebreak
    order = np.lexsort((ids[np.newaxis, :].repeat(len(ids), 0), -sims), axis=1)
    best = {ids[i]: ids[order[i, 0]] for i in range(len(ids))}
    want = {
        (a, b)
        for a, b in best.items()
        if best.get(b) == a and a < b
    }
    assert got == want
    assert len(got) > 0


def test_drawdown_identities(spark, queries):
    df = (
        queries["win_drawdown"](spark, SF_T2)
        .toPandas()
        .sort_values("day_ms")
        .reset_index(drop=True)
    )
    assert (df["cum_cents"].to_numpy() == df["rev_cents"].cumsum().to_numpy()).all()
    assert (df["peak_cents"].to_numpy() == df["cum_cents"].cummax().to_numpy()).all()
    assert (df["drawdown_cents"] == df["peak_cents"] - df["cum_cents"]).all()
    # revenue is nonnegative → the cumulative curve never falls →
    # drawdown is identically zero; the operator must prove it, not
    # assume it
    assert (df["drawdown_cents"] == 0).all()


def test_robust_scale_median_centering(spark, queries):
    df = queries["transform_robust_scale"](spark, SF_T2).toPandas()
    for _, grp in df.groupby("c_mktsegment"):
        z = grp["robust_z_e6"]
        # about half the group sits on each side of the median
        assert (z < 0).sum() <= len(grp) // 2 + 1
        assert (z > 0).sum() <= len(grp) // 2 + 1
        # IQR scaling puts the quartiles near ±0.5e6
        assert np.percentile(z, 75) < 700_000
        assert np.percentile(z, 25) > -700_000


def test_robust_scale_broadcasts_stats(spark, queries):
    plan = executed_plan(queries["transform_robust_scale"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
