"""t-digest sketch quality pins (SURVEY.md §5.2 item 3): the driver
grades `agg_tdigest` rows-only, so accuracy vs the exact quantiles and
re-run determinism are asserted here."""

from __future__ import annotations

import pytest

from tests.conftest import SF_T2


@pytest.fixture(scope="module")
def digest_rows(spark, queries):
    return {
        r["event_type"]: r for r in queries["agg_tdigest"](spark, SF_T2).collect()
    }


def test_tdigest_covers_every_group_and_counts(spark, digest_rows):
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    exact_n = {
        r["event_type"]: r["n"]
        for r in t(spark, SF_T2, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v["n"] for k, v in digest_rows.items()} == exact_n


def test_tdigest_quantiles_within_tolerance(spark, digest_rows):
    """p50/p95 estimates must land within 2% of the value range of the
    exact quantiles — far looser than t-digest@δ=100 actually achieves,
    so fixture regeneration can't flap the suite."""
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    ev = t(spark, SF_T2, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    for etype, est in digest_rows.items():
        ex = exact[etype]
        tol = 0.02 * (ex["hi"] - ex["lo"])
        assert abs(est["p50"] - ex["p50"]) <= tol, (etype, "p50")
        assert abs(est["p95"] - ex["p95"]) <= tol, (etype, "p95")


def test_tdigest_deterministic(spark, queries, digest_rows):
    rerun = {
        r["event_type"]: r for r in queries["agg_tdigest"](spark, SF_T2).collect()
    }
    assert {k: (v["p50"], v["p95"]) for k, v in rerun.items()} == {
        k: (v["p50"], v["p95"]) for k, v in digest_rows.items()
    }
