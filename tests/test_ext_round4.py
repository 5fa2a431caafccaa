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


# --- batch 2 ---


def test_label_confusion_shape_and_bounds(spark, queries):
    df = queries["emb_label_confusion"](spark, SF_T2).toPandas()
    assert len(df) == 45  # C(10,2) label pairs
    assert (df["label_a"] < df["label_b"]).all()
    assert df["confusion"].between(-1.0, 1.0).all()


def test_outlier_topk_is_bottom_of_each_label(spark, queries):
    df = queries["emb_outlier_topk"](spark, SF_T2).toPandas()
    assert (df.groupby("label")["rn"].apply(
        lambda s: sorted(s) == [1, 2, 3, 4, 5]
    )).all()
    # outliers sit below their label's average cohesion
    coh = queries["emb_centroid_label"](spark, SF_T2).toPandas()
    avg = coh.set_index("label")["avg_cos"]
    worst = df[df["rn"] == 1].set_index("label")["cos_to_centroid"]
    assert (worst < avg.loc[worst.index]).all()


def test_heavy_hitters_threshold_exact(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_heavy_hitters"](spark, SF_T2).toPandas()
    li = (
        t(spark, SF_T2, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    supp = li.groupby("l_partkey").size()
    expected = supp[supp * len(supp) * 10 >= 14 * supp.sum()]
    assert set(got["part"]) == set(expected.index)
    assert len(got) > 0


def test_fk_orphans_all_zero_on_consistent_fixture(spark, queries):
    df = queries["dq_fk_orphans"](spark, SF_SMOKE).toPandas()
    assert set(df["fk"]) == {
        "lineitem->orders", "lineitem->part", "orders->customer"
    }
    assert (df["n_orphans"] == 0).all()
    assert (df["n_checked"] > 0).all()


def test_bucketize_recompute(spark, queries):
    import numpy as np

    from census_postgres_py_spark.tables import t

    got = queries["transform_bucketize"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    m = got.merge(o, on="o_orderkey")
    exp = np.minimum(np.floor(m["o_totalprice"] / 50000), 9).astype(int)
    assert (m["bucket"] == exp).all()
    assert (m["bucket_label"].str.startswith("[")).all()
    assert (m.loc[m["bucket"] == 9, "bucket_label"] == "[450000,inf)").all()


def test_zorder_cells_are_tight_in_both_dims(spark, queries):
    """The z-order claim itself: every prefix cell's bounding box is
    small in BOTH keys (<= 15 after dropping 4 bits/dim) — a
    lexicographic sort would give sk_span ~ the full domain for most
    pk ranges."""
    from census_postgres_py_spark.tables import t

    df = queries["agg_zorder_cells"](spark, SF_T2).toPandas()
    assert (df["pk_span"] <= 15).all()
    assert (df["sk_span"] <= 15).all()
    assert int(df["n_rows"].sum()) == t(spark, SF_T2, "lineitem").count()


def test_phash_dedup_matches_numpy_bruteforce(spark, queries):
    import numpy as np

    from census_postgres_py_spark.operators.multimodal import _encode_img, _parse_img
    from census_postgres_py_spark.tables import t

    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in queries["mm_phash_dedup"](spark, SF_SMOKE).collect()
    }
    ids = [
        r["doc_id"] for r in t(spark, SF_SMOKE, "documents").select("doc_id").collect()
    ]

    def phash(doc_id):
        w, h, px = _parse_img(_encode_img(doc_id))
        img = px.reshape(h, w).astype(np.float64)
        hb, wb = h // 8, w // 8
        cells = img[: hb * 8, : wb * 8].reshape(8, hb, 8, wb).mean(axis=(1, 3))
        bits = (cells > cells.mean()).flatten()
        v = 0
        for i, b in enumerate(bits):
            if b:
                v |= 1 << i
        return v

    hashes = {d: phash(d) for d in ids}
    expected = set()
    sids = sorted(ids)
    for i, a in enumerate(sids):
        for b in sids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 6:
                expected.add((a, b, ham))
    assert got == expected
    assert expected  # fixture must actually contain near-dup images


def test_phash_no_cartesian(spark, queries):
    plan = executed_plan(queries["mm_phash_dedup"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- batch 3 ---


def test_pit_join_matches_pandas_interval_lookup(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_point_in_time"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").selectExpr(
        "o_custkey", "o_orderkey",
        "cast(o_orderdate as date) as d", "o_totalprice"
    ).toPandas()
    li = t(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_orderkey", "l_linenumber", "cast(l_shipdate as date) as ship"
    ).toPandas()
    o = o.sort_values(["o_custkey", "d", "o_orderkey"])
    o["version"] = o.groupby("o_custkey").cumcount() + 1
    fact = li.merge(
        o[["o_orderkey", "o_custkey"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    hist = {k: g[["d", "version", "o_totalprice"]].to_numpy()
            for k, g in o.groupby("o_custkey")}
    # (l_orderkey, l_linenumber) is NOT unique in the fixture, so
    # compare row MULTISETS, not keyed dicts
    exp = []
    for _, r in fact.iterrows():
        versions = hist[r["o_custkey"]]
        best = None
        for d, v, price in versions:
            if d <= r["ship"]:
                best = (v, price)
        if best:
            exp.append(
                (r["l_orderkey"], r["l_linenumber"], r["ship"], *best)
            )
    gotrows = [
        (r["l_orderkey"], r["l_linenumber"], r["ship_date"],
         r["pit_version"], r["pit_price"])
        for _, r in got.iterrows()
    ]
    assert sorted(gotrows) == sorted(exp)


def test_pit_join_no_cartesian(spark, queries):
    plan = executed_plan(queries["join_point_in_time"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_dim_covers_every_order_once(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["join_range_dim"](spark, SF_T2).toPandas()
    n_orders = t(spark, SF_T2, "orders").count()
    assert len(got) == n_orders
    assert got["o_orderkey"].is_unique
    assert set(got["tier"]).issubset(
        {"T0_micro", "T1_small", "T2_mid", "T3_large", "T4_major", "T5_jumbo"}
    )


def test_range_dim_is_broadcast_not_shuffle(spark, queries):
    plan = executed_plan(queries["join_range_dim"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_weighted_percentile_matches_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_weighted_percentile"](spark, SF_T2)
        .toPandas()
        .set_index("flag")
    )
    li = t(spark, SF_T2, "lineitem").selectExpr(
        "l_returnflag as flag",
        "cast(floor(l_extendedprice * 100 + 0.5) as bigint) as y",
        "cast(l_quantity as bigint) as wt",
    ).toPandas()
    for flag, g in li.groupby("flag"):
        g = g.sort_values("y")
        cw = g["wt"].cumsum()
        tot = int(g["wt"].sum())
        wmed = int(g.loc[cw * 2 >= tot, "y"].iloc[0])
        assert got.loc[flag, "wmedian_cents"] == wmed, flag
        assert got.loc[flag, "total_weight"] == tot, flag


def test_csv_escaped_round_trip_preserves_every_row(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["sink_csv_escaped"](spark, SF_SMOKE).toPandas()
    n = t(spark, SF_SMOKE, "documents").count()
    assert len(got) == n
    assert got["doc_id"].is_unique
    # md5 of a payload with comma+quote+newline must match a local
    # recompute — proves the newline survived the multiLine parse
    import hashlib

    docs = t(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "source"
    ).toPandas()
    exp = {
        int(r["doc_id"]): hashlib.md5(
            f'v1,"{r["lang"]}"\n{r["source"]}'.encode()
        ).hexdigest()
        for _, r in docs.iterrows()
    }
    assert {int(r["doc_id"]): r["payload_md5"] for _, r in got.iterrows()} == exp


def test_warehouse_e2e_consistent_with_cdc_apply(spark, queries):
    state = queries["cdc_apply"](spark, SF_T2).toPandas()
    report = queries["pipeline_warehouse_e2e"](spark, SF_T2).toPandas()
    assert int(report["n_customers"].sum()) == len(state)
    assert int(report["state_cents"].sum()) == int(
        (state["price"] * 100 + 0.5).apply(int).sum()
    )


def test_cms_overcount_bounded_and_nonnegative(spark, queries):
    """The count-min guarantee: estimates never undercount, and with
    eps=5e-4 over 60k rows the overcount is bounded by eps*N = 30
    (w.p. 0.99; deterministic here — fixed seed)."""
    df = queries["agg_count_min_sketch"](spark, SF_T2).toPandas()
    assert len(df) == 5
    assert (df["overcount"] >= 0).all()
    assert (df["overcount"] <= 30).all()
    assert (df["exact_count"] > 0).all()


def test_fk_orphans_single_action_plan(spark, queries):
    """The union of the three edge checks must be ONE plan (no
    per-edge count() actions): building the DataFrame triggers no
    jobs, and the plan unions three aggregates."""
    df = queries["dq_fk_orphans"](spark, SF_SMOKE)
    plan = executed_plan(df)
    assert plan.count("Union") >= 1
    assert "BroadcastHashJoin" in plan


# --- batch 4 ---


def test_rolling_zscore_matches_pandas(spark, queries):
    import numpy as np

    from census_postgres_py_spark.tables import t

    got = queries["win_rolling_zscore"](spark, SF_SMOKE).toPandas()
    o = (
        t(spark, SF_SMOKE, "orders")
        .selectExpr(
            "o_custkey", "o_orderkey",
            "cast(floor(o_totalprice * 100 + 0.5) as bigint) as y",
        )
        .toPandas()
        .sort_values(["o_custkey", "o_orderkey"])
    )
    exp = []
    for cust, g in o.groupby("o_custkey"):
        ys = g["y"].to_numpy()
        for i in range(len(ys)):
            w = ys[max(0, i - 29): i + 1]
            n = len(w)
            if n < 5:
                continue
            s, q = int(w.sum()), int((w.astype(object) ** 2).sum())
            b = n * q - s * s
            if b <= 0:
                z = 0.0
            else:
                z = (n * int(ys[i]) - s) / np.sqrt(float(b) * n / (n - 1))
                z = np.floor(z * 10000 + 0.5) / 10000
            exp.append((cust, int(g["o_orderkey"].iloc[i]), z))
    gotrows = sorted(
        (r["o_custkey"], r["o_orderkey"], r["zscore"])
        for _, r in got.iterrows()
    )
    assert gotrows == sorted(exp)


def test_minmax_scale_bounds_and_extrema(spark, queries):
    df = queries["transform_minmax_scale"](spark, SF_T2).toPandas()
    assert df["scaled"].between(0.0, 1.0).all()
    g = df.groupby("o_custkey")["scaled"]
    # every multi-order customer hits both ends of the range
    multi = g.count() > 1
    assert (g.min()[multi] == 0.0).all()
    assert (g.max()[multi] == 1.0).all()


def test_row_checksum_distinct_and_null_safe(spark, queries):
    df = queries["fn_row_checksum"](spark, SF_T2).toPandas()
    # content-addressing: all fixture rows are distinct => all hashes are
    assert df["row_md5"].is_unique
    assert (df["row_md5"].str.len() == 32).all()


def test_dup_rate_consistent_with_prefix_clusters(spark, queries):
    rep = queries["dq_dup_rate"](spark, SF_T2).toPandas()
    clusters = queries["dedup_prefix_cluster"](spark, SF_T2).toPandas()
    # total docs flagged as duplicated == total cluster membership
    assert int(rep["n_dup_docs"].sum()) == int(clusters["n_docs"].sum())
    assert (rep["dup_ppm"] <= 1000000).all()
    assert (rep["n_dup_docs"] <= rep["n_docs"]).all()


# --- batch 5 ---


def test_markov_rows_sum_to_one(spark, queries):
    df = queries["agg_markov_transitions"](spark, SF_T2).toPandas()
    assert len(df) == 25  # 5 types fully connected in this fixture
    # each from-row's ppm sums to ~1e6 (integer floor division loses <5)
    sums = df.groupby("from_type")["prob_ppm"].sum()
    assert ((1000000 - sums) < 5).all() and (sums <= 1000000).all()
    # counts conserve: total transitions = total events - active users
    from census_postgres_py_spark.tables import t

    ev = t(spark, SF_T2, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert int(df["n"].sum()) == n_events - n_users


def test_time_since_last_is_positive_and_null_before_first(spark, queries):
    df = queries["win_time_since_last"](spark, SF_T2).toPandas()
    known = df["ms_since_purchase"].dropna()
    assert (known > 0).all()
    # every user's earliest event has no prior purchase
    first = df.loc[df.groupby("user_id")["ts_ms"].idxmin()]
    assert first["ms_since_purchase"].isna().all()


def test_overlap_matrix_bounded_by_user_count(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["agg_overlap_matrix"](spark, SF_T2).toPandas()
    n_users = (
        t(spark, SF_T2, "events").select("user_id").distinct().count()
    )
    assert (df["n_both"] <= n_users).all()
    assert (df["type_a"] < df["type_b"]).all()
    assert len(df) == 10  # C(5,2)
