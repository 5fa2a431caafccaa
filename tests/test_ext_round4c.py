"""Round-4c extension operators (SURVEY.md §2.17): semantic invariants
beyond the oracle hash — ffill carry semantics, LTV monotonicity,
silhouette bounds and numpy twin, funnel stage monotonicity, RFM
quintile balance — plus plan pins."""

from __future__ import annotations

import numpy as np

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_ffill_carry_semantics(spark, queries):
    df = (
        queries["transform_ffill"](spark, SF_T2)
        .toPandas()
        .sort_values(["user_id", "ts_ms", "event_id"])
    )
    for _, grp in df.groupby("user_id"):
        last = None
        for _, row in grp.iterrows():
            if not np.isnan(row["purchase_cents"] if row["purchase_cents"] is not None else np.nan):
                last = row["purchase_cents"]
            if last is None:
                assert row["filled_cents"] is None or np.isnan(row["filled_cents"])
            else:
                assert row["filled_cents"] == last


def test_cohort_ltv_cumulative_monotone(spark, queries):
    df = queries["agg_cohort_ltv"](spark, SF_T2).toPandas()
    assert (df["rev_cents"] > 0).all()
    for _, grp in df.groupby("cohort_ms"):
        grp = grp.sort_values("age_months")
        # ages are dense from 0 within a cohort's observed range? not
        # necessarily dense — but cum must be the running sum and
        # strictly increasing since rev is positive
        assert grp["age_months"].iloc[0] == 0
        assert (grp["cum_rev_cents"].to_numpy() == grp["rev_cents"].cumsum().to_numpy()).all()


def test_silhouette_bounds_and_numpy_twin(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["emb_silhouette_approx"](spark, SF_T2).toPandas().set_index("label")
    assert got["silhouette"].between(-1, 1).all()
    assert (got["avg_intra"] > 0).all()
    rows = t(spark, SF_T2, "embeddings").collect()
    m = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    labels = np.array([r["label"] for r in rows])
    cents = {l: m[labels == l].mean(axis=0) for l in np.unique(labels)}
    for l in np.unique(labels):
        own = m[labels == l]
        a = np.linalg.norm(own - cents[l], axis=1).mean()
        b = np.array(
            [
                min(
                    np.linalg.norm(v - cents[o])
                    for o in cents
                    if o != l
                )
                for v in own
            ]
        ).mean()
        assert abs(got.loc[l, "avg_intra"] - a) < 1e-4
        assert abs(got.loc[l, "avg_nearest_other"] - b) < 1e-4


def test_funnel_bounded_stage_monotone(spark, queries):
    df = queries["agg_funnel_bounded"](spark, SF_T2).toPandas()
    assert set(df["stage"].unique()) <= {1, 2, 3}
    h72 = 72 * 3600 * 1000
    s2 = df[df["stage"] >= 2]
    assert (s2["view_ms"] > s2["signup_ms"]).all()
    assert (s2["view_ms"] <= s2["signup_ms"] + h72).all()
    s3 = df[df["stage"] == 3]
    assert (s3["purchase_ms"] > s3["view_ms"]).all()
    assert (s3["purchase_ms"] <= s3["view_ms"] + h72).all()
    # stage-1 users have no view time; stage-2 no purchase time
    assert df[df["stage"] == 1]["view_ms"].isna().all()
    assert df[df["stage"] <= 2]["purchase_ms"].isna().all()


def test_rfm_quintiles_balanced(spark, queries):
    df = queries["agg_rfm_segments"](spark, SF_T2).toPandas()
    n = len(df)
    for col in ["r_score", "f_score", "m_score"]:
        counts = df[col].value_counts()
        assert set(counts.index) == {1, 2, 3, 4, 5}
        assert counts.max() - counts.min() <= 1  # ntile balance
    # best monetary quintile really has the highest totals
    q1 = df[df["m_score"] == 1]["monetary_cents"].min()
    q5 = df[df["m_score"] == 5]["monetary_cents"].max()
    assert q1 >= q5
    assert (df["recency_days"] >= 0).all()
    assert n == df["o_custkey"].nunique()


def test_funnel_bounded_no_cartesian(spark, queries):
    plan = executed_plan(queries["agg_funnel_bounded"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_silhouette_broadcasts_centroids(spark, queries):
    plan = executed_plan(queries["emb_silhouette_approx"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
