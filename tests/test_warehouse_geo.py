"""Round-3 warehouse/geo operators: semantic pins beyond the oracle —
SCD2 interval algebra, CDC delete semantics, spatial-grid recall, the
one-scan DQ plan, and regression-vs-numpy agreement."""

from __future__ import annotations

import numpy as np

from census_postgres_py_spark.plans import executed_plan, has_cartesian
from tests.conftest import SF_SMOKE


def test_cdc_apply_uses_window_group_limit(spark, queries):
    """rank=1 must compile to WindowGroupLimit (streaming top-1 per
    key), not a full per-key sort."""
    plan = executed_plan(queries["cdc_apply"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan, plan


def test_cdc_apply_drops_deleted_keys(spark, queries):
    """A key whose LATEST change is a delete ('P') must vanish, even
    though older upserts exist; a key with a delete in the middle of
    its history must survive."""
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    o = t(spark, SF_SMOKE, "orders")
    latest = (
        o.withColumn(
            "rn",
            F.expr(
                "row_number() OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate DESC, o_orderkey DESC)"
            ),
        )
        .filter("rn = 1")
        .select("o_custkey", "o_orderstatus")
        .collect()
    )
    deleted = {r.o_custkey for r in latest if r.o_orderstatus == "P"}
    live = {r.o_custkey for r in latest} - deleted
    out = {r.o_custkey for r in queries["cdc_apply"](spark, SF_SMOKE).collect()}
    assert out == live
    assert deleted.isdisjoint(out)


def test_scd2_intervals_tile_each_key(spark, queries):
    """Per key: versions numbered 1..n, consecutive intervals abut
    (valid_to == next valid_from), exactly one open current row."""
    import collections

    rows = queries["dim_scd2"](spark, SF_SMOKE).collect()
    by_key = collections.defaultdict(list)
    for r in rows:
        by_key[r.o_custkey].append(r)
    for vs in by_key.values():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v.is_current for v in vs) == 1
        assert vs[-1].is_current and str(vs[-1].valid_to) == "9999-12-31"
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from


def test_spatial_grid_matches_bruteforce(spark, queries):
    """Grid candidates must have EXACT recall vs the O(n^2) twin."""
    from pyspark.sql import functions as F

    from census_postgres_py_spark.operators.geo import (
        RADIUS_KM,
        _haversine_km,
        _lat,
        _lon,
    )
    from census_postgres_py_spark.tables import t

    pts = t(spark, SF_SMOKE, "customer").select(
        "c_custkey", _lat().alias("lat"), _lon().alias("lon")
    )
    a = pts.select(
        F.col("c_custkey").alias("a_id"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
    )
    b = pts.select(
        F.col("c_custkey").alias("b_id"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            _haversine_km(
                F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
            )
            <= RADIUS_KM
        )
    )
    expected = {(r.a_id, r.b_id) for r in brute.collect()}
    got = {
        (r.a_id, r.b_id)
        for r in queries["join_spatial_grid"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert expected, "fixture produced no close pairs — test is vacuous"


def test_spatial_grid_plan_has_no_cartesian(spark, queries):
    df = queries["join_spatial_grid"](spark, SF_SMOKE)
    assert not has_cartesian(df)


def test_dq_rule_engine_is_single_scan(spark, queries):
    """All rules must fold into ONE aggregate over one scan of orders."""
    plan = executed_plan(queries["dq_rule_engine"](spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1, plan


def test_agg_regression_matches_numpy(spark, queries):
    """Exact-sum OLS must agree with numpy polyfit to ~1e-6."""
    from pyspark.sql import functions as F

    from census_postgres_py_spark.tables import t

    o = (
        t(spark, SF_SMOKE, "orders")
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("y"),
        )
        .collect()
    )
    import collections

    pts = collections.defaultdict(list)
    for r in o:
        pts[r.o_orderpriority].append((r.x, r.y))
    got = {
        r.o_orderpriority: (r.slope_cents_per_day, r.intercept_cents)
        for r in queries["agg_regression"](spark, SF_SMOKE).collect()
    }
    for prio, xy in pts.items():
        x = np.array([p[0] for p in xy], dtype=np.float64)
        y = np.array([p[1] for p in xy], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[prio][0] - slope) < 1e-4
        assert abs(got[prio][1] - intercept) < 1.0


def test_ngram_topk_is_exactly_20_and_sorted_stable(spark, queries):
    rows = queries["text_ngram_topk"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(" " in r.bigram for r in rows)
