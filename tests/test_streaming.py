"""Batch==stream equivalence (SURVEY.md §5.2 item 5): the real
`readStream` jobs in streaming/jobs.py must produce exactly what the
equivalent batch aggregation produces — Spark's windowed aggregations
are the same Catalyst expressions either way, so any divergence is a
bug in our streaming plumbing (source materialization, watermark,
output mode)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _rowset(df):
    return {tuple(r) for r in df.select(*sorted(df.columns)).collect()}


def test_stream_watermark_equals_batch_tumbling(spark, queries):
    # stream_watermark = watermarked 1h tumbling agg on a real stream;
    # stream_tumbling = the identical agg expressed on the batch table.
    stream = queries["stream_watermark"](spark, SF_SMOKE)
    batch = queries["stream_tumbling"](spark, SF_SMOKE)
    assert _rowset(stream) == _rowset(batch)


def test_stream_dedup_removes_redelivery(spark, queries):
    from census_postgres_py_spark.tables import t

    n_events = t(spark, SF_SMOKE, "events").count()
    deduped = queries["stream_dedup_state"](spark, SF_SMOKE)
    # the source delivers the file TWICE; state must collapse it back
    assert deduped.count() == n_events
    assert deduped.select("event_id").distinct().count() == n_events


def test_stream_foreachbatch_totals(spark, queries):
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    got = {
        (r["event_type"], r["n"])
        for r in queries["stream_foreachbatch_jdbc"](spark, SF_SMOKE).collect()
    }
    want = {
        (r["event_type"], r["n"])
        for r in t(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_static_join_matches_batch(spark, queries):
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    stream = queries["stream_static_join"](spark, SF_SMOKE)
    dim = (
        t(spark, SF_SMOKE, "customer")
        .join(
            t(spark, SF_SMOKE, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    batch = (
        t(spark, SF_SMOKE, "events")
        .join(dim, "user_id")
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias(
                "total_value"
            ),
        )
    )
    assert _rowset(stream) == _rowset(batch)


def test_stream_stream_join_equals_batch(spark, queries):
    """The watermarked stream-stream interval join must emit exactly
    the pairs the equivalent batch self-join produces."""
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    ev = t(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = v.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("interval 30 minutes")),
    ).select("view_id", "click_id", "user_id")
    stream = queries["stream_stream_join"](spark, SF_SMOKE)
    assert _rowset(stream) == _rowset(batch)


def test_stream_stream_left_outer_flushes_unmatched(spark, queries):
    """The LEFT OUTER stream-stream join must emit (a) exactly the
    batch left-join rows, including (b) NULL-click rows for views
    with no click in-window — (b) only works if the heartbeat
    advanced the watermark far enough to flush the tail."""
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    ev = t(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = v.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("interval 30 minutes")),
        "leftOuter",
    ).select("view_id", "click_id", "user_id")
    stream = queries["stream_stream_left_outer"](spark, SF_SMOKE)
    assert _rowset(stream) == _rowset(batch)
    nulls = [r for r in stream.collect() if r["click_id"] is None]
    assert nulls, "no unmatched views emitted - watermark never flushed"


def test_stream_sessionize_state_equals_batch_twin(spark, queries):
    """The streaming tier and the batch tier must agree row for row:
    stream_sessionize_state (applyInPandasWithState, recompute on
    update across micro-batches) vs win_sessionize (lag + running-sum
    windows) — same gap rule, same output schema."""
    cols = ["user_id", "session_no", "start_ms", "n_events", "dur_ms"]
    stream = (
        queries["stream_sessionize_state"](spark, "/root/testdata/sf0.001")
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    batch = (
        queries["win_sessionize"](spark, "/root/testdata/sf0.001")
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        stream.astype("int64"), batch.astype("int64")
    )
