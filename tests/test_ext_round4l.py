"""Round-4l extension operators (SURVEY.md §2.26): semantic invariants
beyond the oracle hash — gap recovery exactness vs the injected id
drops, two-level == global-window equivalence, aging band coverage —
plus plan pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_sequence_gaps_recover_injected_drops(spark, queries):
    from census_postgres_py_spark.tables import t

    gaps = queries["dq_sequence_gaps"](spark, SF_T2).toPandas()
    ids = sorted(
        r["event_id"]
        for r in t(spark, SF_T2, "events").select("event_id").collect()
    )
    dropped = sorted(i for i in ids if i % 97 == 0)
    # reconstruct the missing set from the reported ranges
    missing = set()
    for _, r in gaps.iterrows():
        missing.update(range(int(r["gap_start"]), int(r["gap_end"]) + 1))
        assert r["n_missing"] == r["gap_end"] - r["gap_start"] + 1
    # every dropped id interior to the sequence is reported; edge drops
    # (before the first / after the last surviving id) are undetectable
    # by ANY gap scan and are excluded from the expectation
    survivors = [i for i in ids if i % 97 != 0]
    lo, hi = survivors[0], survivors[-1]
    expected = {i for i in dropped if lo < i < hi}
    assert missing == expected


def test_sequence_gaps_bucketed_not_global_window(spark, queries):
    plan = executed_plan(queries["dq_sequence_gaps"](spark, SF_SMOKE))
    # the heavy window partitions by bucket — a global-window plan
    # would carry a single-partition Exchange for the big branch;
    # we assert the partitioned window exists
    assert "bkt" in plan


def test_order_aging_covers_all_open_orders(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["agg_order_aging"](spark, SF_T2).toPandas()
    n_open = t(spark, SF_T2, "orders").filter(F.col("o_orderstatus") == "O").count()
    assert int(df["n_orders"].sum()) == n_open
    assert (df["bucket"] >= 0).all()
    for _, r in df.iterrows():
        assert r["age_band"] == f"{r['bucket'] * 30}-{r['bucket'] * 30 + 29}d"
    assert (df["value_cents"] > 0).all()


def test_sequence_gaps_invariant_to_bucket_width(spark, queries, monkeypatch):
    import census_postgres_py_spark.operators.ext_round4l as m

    base = sorted(
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in queries["dq_sequence_gaps"](spark, SF_T2).collect()
    )
    # the two-level intra ∪ junction decomposition is exact for ANY
    # bucket width — rerun with a radically different one
    monkeypatch.setattr(m, "_BUCKET", 37)
    alt = sorted(
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in m.dq_sequence_gaps(spark, SF_T2).collect()
    )
    assert base == alt
