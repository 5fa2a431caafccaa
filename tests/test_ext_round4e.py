"""Round-4e extension operators (SURVEY.md §2.19): semantic invariants
beyond the oracle hash — state-merge == one-shot equivalence at the
DataFrame level, peak strictness, gap-window recompute — plus plan
pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_state_merge_equals_oneshot(spark, queries):
    from census_postgres_py_spark.tables import t

    merged = {
        r["o_orderpriority"]: r.asDict()
        for r in queries["agg_state_merge"](spark, SF_T2).collect()
    }
    direct = {
        r["o_orderpriority"]: r.asDict()
        for r in t(spark, SF_T2, "orders")
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .collect()
    }
    assert merged == direct


def test_peaks_are_strict_local_maxima(spark, queries):
    from census_postgres_py_spark.tables import t

    peaks = queries["win_peak_detection"](spark, SF_T2).toPandas()
    daily = (
        t(spark, SF_T2, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis("d").alias("day_ms"), "n")
        .toPandas()
        .sort_values("day_ms")
        .reset_index(drop=True)
    )
    series = dict(zip(daily["day_ms"], daily["n"]))
    day = 86_400_000
    for _, r in peaks.iterrows():
        assert r["n_events"] == series[r["day_ms"]]
        assert r["prev_events"] == series[r["day_ms"] - day]
        assert r["next_events"] == series[r["day_ms"] + day]
        assert r["n_events"] > r["prev_events"]
        assert r["n_events"] > r["next_events"]
    # endpoints never appear
    assert daily["day_ms"].iloc[0] not in set(peaks["day_ms"])
    assert daily["day_ms"].iloc[-1] not in set(peaks["day_ms"])


def test_interpurchase_gap_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_interpurchase_gap"](spark, SF_T2)
        .toPandas()
        .set_index("c_mktsegment")
    )
    orders = (
        t(spark, SF_T2, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .toPandas()
    )
    cust = (
        t(spark, SF_T2, "customer")
        .select("c_custkey", "c_mktsegment")
        .toPandas()
        .set_index("c_custkey")["c_mktsegment"]
    )
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    orders["gap"] = (
        orders.groupby("o_custkey")["o_orderdate"].diff().dt.days
    )
    gaps = orders.dropna(subset=["gap"]).copy()
    gaps["seg"] = gaps["o_custkey"].map(cust)
    want = gaps.groupby("seg")["gap"].agg(["count", "sum", "min", "max"])
    for seg, row in want.iterrows():
        assert got.loc[seg, "n_gaps"] == row["count"]
        assert got.loc[seg, "min_gap_days"] == row["min"]
        assert got.loc[seg, "max_gap_days"] == row["max"]
        import math

        assert got.loc[seg, "avg_gap_millidays"] == math.floor(
            row["sum"] * 1000 / row["count"] + 0.5
        )


def test_state_merge_no_raw_rescan_joins(spark, queries):
    plan = executed_plan(queries["agg_state_merge"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_pack_sequences_contiguous_fill(spark, queries):
    df = (
        queries["text_pack_sequences"](spark, SF_T2)
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    for _, grp in df.groupby("source"):
        cum = 0
        for _, r in grp.iterrows():
            assert r["bin_id"] == cum // 512
            assert r["offset_in_bin"] == cum % 512
            cum += r["n_tokens"]
        # a doc's bin_id is where it STARTS — it can extend past it,
        # so the max start-bin never exceeds the total-token bin span
        if cum:
            assert grp["bin_id"].max() <= (cum - 1) // 512


def test_pack_sequences_single_shuffle(spark, queries):
    plan = executed_plan(queries["text_pack_sequences"](spark, SF_SMOKE))
    assert plan.count("Exchange") <= 2  # one hash partition + AQE read


def test_stream_windowed_topk_matches_batch_rank(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["stream_windowed_topk"](spark, SF_T2)
        .toPandas()
        .sort_values(["hour_ms", "rn"])
        .reset_index(drop=True)
    )
    assert (got["rn"].between(1, 3)).all()
    # per window: counts non-increasing with rn, ties broken by type
    for _, grp in got.groupby("hour_ms"):
        ns = grp.sort_values("rn")["n"].to_numpy()
        assert (ns[:-1] >= ns[1:]).all()
    # spot-check one window against a batch recount
    hr = int(got["hour_ms"].iloc[0])
    ev = t(spark, SF_T2, "events")
    from pyspark.sql import functions as F

    batch = (
        ev.filter(
            (F.unix_millis("ts") >= hr) & (F.unix_millis("ts") < hr + 3600000)
        )
        .groupBy("event_type")
        .count()
        .toPandas()
        .sort_values(["count", "event_type"], ascending=[False, True])
    )
    top = got[got["hour_ms"] == hr].sort_values("rn")
    assert list(top["event_type"]) == list(batch["event_type"].head(len(top)))
