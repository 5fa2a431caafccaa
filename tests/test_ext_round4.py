"""Round-4 extension operators (SURVEY.md §2.15): semantic invariants
the oracle hash can't see — session-gap properties, streak recomputation,
brute-force co-occurrence, deterministic A/B assignment — plus plan
pins for the shuffle-free claims."""

from __future__ import annotations

import pandas as pd

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_onehot_rows_are_one_hot(spark, queries):
    df = queries["transform_onehot"](spark, SF_T2).toPandas()
    ind = df[["pri_urgent", "pri_high", "pri_medium", "pri_notspec", "pri_low"]]
    assert (ind.sum(axis=1) == 1).all()
    # index agrees with the hot column position
    assert (ind.to_numpy().argmax(axis=1) == df["pri_index"].to_numpy()).all()


def test_onehot_is_shuffle_free(spark, queries):
    plan = executed_plan(queries["transform_onehot"](spark, SF_SMOKE))
    assert "Exchange" not in plan


def test_url_canonicalize_strips_tracking_and_fragment(spark, queries):
    rows = queries["fn_url_canonicalize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert "utm_" not in r["canonical_url"]
        assert "#" not in r["canonical_url"]
        assert ":443" not in r["canonical_url"]
        assert r["host_key"] == r["host_key"].lower()
        assert r["canonical_url"].startswith("https://" + r["host_key"])


def test_sessionize_events_conserved_and_gaps_split(spark, queries):
    from census_postgres_py_spark.tables import t

    sess = queries["win_sessionize"](spark, SF_T2).toPandas()
    n_events = t(spark, SF_T2, "events").count()
    assert int(sess["n_events"].sum()) == n_events
    # session numbering is 1..k dense per user
    for uid, grp in sess.groupby("user_id"):
        assert sorted(grp["session_no"]) == list(
            range(1, len(grp) + 1)
        ), uid
    # a session's span never exceeds n_events * gap (loose upper bound)
    assert (sess["dur_ms"] <= (sess["n_events"]) * 30 * 60000).all()
    assert (sess["dur_ms"] >= 0).all()


def test_streak_matches_pandas_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["win_streak"](spark, SF_T2)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = (
        t(spark, SF_T2, "events")
        .selectExpr("user_id", "cast(ts as date) as d")
        .distinct()
        .toPandas()
    )
    for uid, grp in ev.groupby("user_id"):
        days = sorted(pd.to_datetime(grp["d"]).dt.date)
        longest = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if (b - a).days == 1 else 1
            longest = max(longest, cur)
        assert got.loc[uid, "longest_streak"] == longest, uid
        assert got.loc[uid, "n_active_days"] == len(days), uid


def test_cooccurrence_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_cooccurrence"](spark, SF_SMOKE).toPandas()
    li = (
        t(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    counts = (
        m.groupby(["l_partkey_x", "l_partkey_y"])
        .size()
        .reset_index(name="n")
        .sort_values(["n", "l_partkey_x", "l_partkey_y"],
                     ascending=[False, True, True])
    )
    top = counts.head(len(got))
    assert list(got["n_orders"]) == list(top["n"])
    assert list(got["part_a"]) == list(top["l_partkey_x"])
    assert list(got["part_b"]) == list(top["l_partkey_y"])


def test_ab_lift_assignment_is_deterministic(spark, queries):
    a = queries["agg_ab_lift"](spark, SF_T2).toPandas().sort_values("variant")
    b = queries["agg_ab_lift"](spark, SF_T2).toPandas().sort_values("variant")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert set(a["variant"]) == {"A", "B"}
    assert (a["n_converted"] <= a["n_users"]).all()
    # md5-prefix split is ~50/50; at 150 users allow wide tolerance
    ratio = a["n_users"].max() / a["n_users"].min()
    assert ratio < 2.0, ratio


def test_readability_hand_computed_doc(spark, queries):
    from census_postgres_py_spark.tables import t

    doc = (
        t(spark, SF_SMOKE, "documents")
        .filter("doc_id = 0")
        .collect()[0]["text"]
    )
    import re

    w = len(re.findall(r"[a-z]+", doc))
    s = len(re.findall(r"[aeiouy]+", doc))
    import math

    expected = (
        math.floor((206835 * w - 1015 * w * w - 84600 * s) / (10.0 * w) + 0.5)
        / 100
    )
    got = (
        queries["text_readability"](spark, SF_SMOKE)
        .filter("doc_id = 0")
        .collect()[0]
    )
    assert got["n_words"] == w and got["n_syllables"] == s
    assert got["flesch"] == expected


def test_readability_is_shuffle_free(spark, queries):
    plan = executed_plan(queries["text_readability"](spark, SF_SMOKE))
    assert "Exchange" not in plan


def test_prefix_cluster_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dedup_prefix_cluster"](spark, SF_T2).toPandas()
    docs = t(spark, SF_T2, "documents").select("doc_id", "text").toPandas()
    docs["prefix"] = docs["text"].str[:64]
    g = docs.groupby("prefix")["doc_id"].agg(["count", "min"])
    g = g[g["count"] > 1]
    assert len(got) == len(g)
    assert int(got["n_docs"].sum()) == int(g["count"].sum())
    assert set(got["keeper_id"]) == set(g["min"])


def test_ema_first_row_equals_value_and_bounds(spark, queries):
    df = queries["win_ema"](spark, SF_T2).toPandas()
    from census_postgres_py_spark.tables import t

    o = (
        t(spark, SF_T2, "orders")
        .selectExpr(
            "o_custkey",
            "o_orderkey",
            "cast(floor(o_totalprice * 100 + 0.5) as bigint) as y",
        )
        .toPandas()
        .sort_values(["o_custkey", "o_orderkey"])
    )
    merged = df.merge(o, on=["o_custkey", "o_orderkey"])
    first = merged.loc[
        merged.groupby("o_custkey")["o_orderkey"].idxmin()
    ]
    # with no history the EMA equals the value itself (in cents)
    assert ((first["ema_cents"] - first["y"]).abs() < 1e-6).all()
    # EMA is a convex combination of trailing values => within global bounds
    lo, hi = o["y"].min(), o["y"].max()
    assert df["ema_cents"].between(lo - 0.01, hi + 0.01).all()


def test_ema_single_window_shuffle(spark, queries):
    plan = executed_plan(queries["win_ema"](spark, SF_SMOKE))
    assert plan.count("Exchange") <= 1
    assert "Window" in plan


def test_sessionize_single_exchange(spark, queries):
    """The window partition key (user_id) is a subset of the final
    grouping key, so the whole op should pay ONE hash exchange."""
    plan = executed_plan(queries["win_sessionize"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") <= 1, plan
