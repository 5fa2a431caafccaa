"""Round-4k extension operators (SURVEY.md §2.25): semantic invariants
beyond the oracle hash — LOO exclusion property, rank-delta
conservation, mirror-cosine symmetry vs a numpy recompute — plus plan
pins."""

from __future__ import annotations

import numpy as np

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_loo_excludes_own_row(spark, queries):
    df = queries["transform_target_encode_loo"](spark, SF_T2).toPandas()
    for _, grp in df.groupby("o_orderpriority"):
        s, n = grp["cents"].sum(), len(grp)
        if n == 1:
            assert grp["loo_enc_millicents"].isna().all()
            continue
        want = np.floor((s - grp["cents"]) * 1000 / (n - 1) + 0.5)
        assert (grp["loo_enc_millicents"].to_numpy() == want.to_numpy()).all()
        # the LOO guard: a row's encoding moves OPPOSITE to its own
        # target relative to the plain mean
        mean_milli = s * 1000 / n
        above = grp[grp["cents"] * 1000 > mean_milli]
        assert (above["loo_enc_millicents"] <= mean_milli + 1).all()


def test_rank_delta_conserves_ranks_per_week(spark, queries):
    df = queries["win_rank_delta"](spark, SF_T2).toPandas()
    for _, grp in df.groupby("week_ms"):
        # ranks are a dense 1..k permutation within the week
        assert sorted(grp["rnk"]) == list(range(1, len(grp) + 1))
    have_prev = df.dropna(subset=["prev_rnk"])
    assert (
        have_prev["rank_delta"] == have_prev["prev_rnk"] - have_prev["rnk"]
    ).all()
    # first observed week per brand has no previous rank
    # (groupby().first() would skip the NaN — take the literal first row)
    firsts = df.sort_values("week_ms").drop_duplicates("p_brand", keep="first")
    assert firsts["prev_rnk"].isna().all()


def test_source_mirror_matches_numpy_profiles(spark, queries):
    from census_postgres_py_spark.tables import t
    import collections

    got = {
        (r["source_a"], r["source_b"]): r["profile_cos_e6"]
        for r in queries["dedup_source_mirror"](spark, SF_T2).collect()
    }
    profiles = collections.defaultdict(collections.Counter)
    for r in t(spark, SF_T2, "documents").collect():
        profiles[r["source"]].update(w for w in r["text"].split() if w)
    sources = sorted(profiles)
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            ca, cb = profiles[sa], profiles[sb]
            dot = sum(ca[t_] * cb[t_] for t_ in ca.keys() & cb.keys())
            na2 = sum(v * v for v in ca.values())
            nb2 = sum(v * v for v in cb.values())
            want = int(np.floor(dot / np.sqrt(float(na2) * nb2) * 1e6 + 0.5))
            assert got[(sa, sb)] == want


def test_loo_broadcasts_category_stats(spark, queries):
    plan = executed_plan(
        queries["transform_target_encode_loo"](spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
