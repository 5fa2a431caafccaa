"""Round-4b extension operators (SURVEY.md §2.16): semantic invariants
the oracle hash can't see — injected-dup classification, quantizer
saturation, churn bounds, chunk coverage/overlap arithmetic, the PCA
numpy twin — plus plan pins for the shuffle-free / broadcast claims."""

from __future__ import annotations

import re

import numpy as np

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_basket_lift_bounds_and_tiebreak(spark, queries):
    df = queries["agg_basket_lift"](spark, SF_T2).toPandas()
    assert len(df) == 20
    assert (df["brand_a"] < df["brand_b"]).all()
    assert (df["pair_orders"] > 0).all()
    assert (df["support_ppm"] <= 1_000_000).all()
    assert (df["lift_ppm"] > 0).all()
    # descending lift with (brand_a, brand_b) tiebreak is a total order
    key = list(zip(-df["lift_ppm"], df["brand_a"], df["brand_b"]))
    assert key == sorted(key)


def test_basket_lift_broadcasts_part_dim(spark, queries):
    plan = executed_plan(queries["agg_basket_lift"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_dedup_incremental_classifies_injected_dups(spark, queries):
    df = queries["dedup_incremental"](spark, SF_T2).toPandas()
    injected = df[df["doc_id"] >= 100000]
    fresh = df[df["doc_id"] < 100000]
    assert len(injected) > 0 and len(fresh) > 0
    # every injected row is a re-keyed copy of a base doc → dup
    assert (injected["status"] == "dup").all()
    # fixture has no natural duplicate texts → the real batch is new
    assert (fresh["status"] == "new").all()


def test_quantize_saturates_at_127_and_l1_checks(spark, queries):
    df = queries["emb_quantize_int8"](spark, SF_T2).toPandas()
    assert len(df) > 0
    for _, row in df.head(50).iterrows():
        q = np.array([int(x) for x in row["q_vec"].split(",")])
        assert np.abs(q).max() == 127  # the max-|x| element maps to ±127
        assert np.abs(q).sum() == row["q_l1"]
        assert row["scale_ppm"] > 0


def test_quantize_is_shuffle_free(spark, queries):
    plan = executed_plan(queries["emb_quantize_int8"](spark, SF_SMOKE))
    assert "Exchange" not in plan


def test_churn_weekly_bounds(spark, queries):
    df = queries["agg_churn_weekly"](spark, SF_T2).toPandas()
    # events span 5 ISO weeks of Jan 2024; the last is excluded
    assert len(df) == 4
    assert (df["churned_users"] <= df["active_users"]).all()
    assert df["churn_ppm"].between(0, 1_000_000).all()


def test_seasonality_conserves_events_and_shares(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["agg_seasonality"](spark, SF_T2).toPandas()
    assert df["dow"].between(1, 7).all()
    assert df["hr"].between(0, 23).all()
    assert int(df["events"].sum()) == t(spark, SF_T2, "events").count()
    # ppm shares sum to 1e6 up to one half-up rounding unit per cell
    assert abs(int(df["share_ppm"].sum()) - 1_000_000) <= len(df)


def test_period_growth_delta_identity(spark, queries):
    df = (
        queries["win_period_growth"](spark, SF_T2)
        .toPandas()
        .sort_values("week_ms")
        .reset_index(drop=True)
    )
    assert df.loc[0, ["prev_cents", "delta_cents", "growth_ppm"]].isna().all()
    later = df.iloc[1:]
    assert (later["prev_cents"].to_numpy() == df["rev_cents"].to_numpy()[:-1]).all()
    assert (
        later["delta_cents"] == later["rev_cents"] - later["prev_cents"]
    ).all()


def test_skew_report_consistency(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["dq_skew_report"](spark, SF_T2).toPandas().set_index("col_name")
    n = t(spark, SF_T2, "lineitem").count()
    assert set(df.index) == {"l_orderkey", "l_partkey", "l_suppkey"}
    assert (df["n_rows"] == n).all()
    # max ≥ mean always ⇒ ratio ≥ 1e6 exactly (integer floor half-up)
    assert (df["skew_ratio_ppm"] >= 1_000_000).all()
    assert (df["max_rows_per_key"] * df["n_keys"] >= df["n_rows"]).all()


def test_chunk_stride_coverage_and_overlap(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["text_chunk_stride"](spark, SF_T2).toPandas()
    docs = {
        r["doc_id"]: r["text"].split()
        for r in t(spark, SF_T2, "documents").collect()
    }
    for doc_id, grp in df.groupby("doc_id"):
        toks = [w for w in docs[doc_id] if w]
        n = len(toks)
        k = 1 if n <= 32 else -(-(n - 32) // 24) + 1
        grp = grp.sort_values("chunk_id").reset_index(drop=True)
        assert list(grp["chunk_id"]) == list(range(k))
        for _, row in grp.iterrows():
            i = row["chunk_id"]
            want = toks[i * 24 : i * 24 + 32]
            assert row["chunk_text"].split() == want
            assert row["chunk_tokens"] == len(want)
            assert row["overlap_prev"] == (0 if i == 0 else min(8, len(want)))
        # stride windows cover every token index
        assert (k - 1) * 24 + grp["chunk_tokens"].iloc[-1] >= n


def test_chunk_stride_is_shuffle_free(spark, queries):
    plan = executed_plan(queries["text_chunk_stride"](spark, SF_SMOKE))
    assert "Exchange" not in plan


def test_unicode_slug_shape(spark, queries):
    rows = queries["fn_unicode_slug"](spark, SF_SMOKE).collect()
    assert rows
    pat = re.compile(r"^[a-z0-9]+(-[a-z0-9]+)*$")
    for r in rows:
        assert pat.match(r["slug"]), r["slug"]
        assert r["slug"].startswith("resume-")
        assert "detail" in r["slug"]  # é → e via the pinned map


def test_pca_power_matches_numpy_eigh(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["emb_pca_power"](spark, SF_T2)
        .toPandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    m = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in
         t(spark, SF_T2, "embeddings").collect()]
    )
    cov = np.cov(m, rowvar=False)
    w, v = np.linalg.eigh(cov)
    top = v[:, np.argmax(w)]
    spark_v = got["loading"].to_numpy()
    cos = abs(float(top @ spark_v) / (np.linalg.norm(top) * np.linalg.norm(spark_v)))
    assert cos > 0.999
    share = w.max() / np.trace(cov) * 1e6
    assert abs(got["pc1_share_ppm"].iloc[0] - share) < 1000
