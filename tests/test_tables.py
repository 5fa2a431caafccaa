"""Unit behavior of the tables helpers the broadcast gates depend on:
approx_rows (O(1) footer count + count() fallback) and gated_broadcast
(conf parsing, hint vs pass-through). The plan-level consequences are
covered in tests/test_plans.py; these pin the primitives."""

from __future__ import annotations

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_approx_rows_matches_footer_and_scan(spark):
    from census_postgres_py_spark.tables import approx_rows, t

    n = approx_rows(spark, SF_SMOKE, "orders")
    assert n == pq.ParquetFile(f"{SF_SMOKE}/orders.parquet").metadata.num_rows
    assert n == t(spark, SF_SMOKE, "orders").count()
    assert n > 0


def test_approx_rows_falls_back_to_count_for_directory_dataset(spark, tmp_path):
    # a directory of part-files (the sink layout) sums footers
    from census_postgres_py_spark.tables import approx_rows, t

    out = str(tmp_path / "orders.parquet")
    t(spark, SF_SMOKE, "orders").limit(100).repartition(3).write.parquet(out)
    assert approx_rows(spark, str(tmp_path), "orders") == 100


def test_gated_broadcast_hints_only_under_the_cap(spark):
    from census_postgres_py_spark.tables import (
        BROADCAST_DIM_CONF,
        gated_broadcast,
        t,
    )

    df = t(spark, SF_SMOKE, "part").select("p_partkey")
    hinted = gated_broadcast(spark, SF_SMOKE, "part", df)
    # hint surfaces as a ResolvedHint/UnresolvedHint node in the plan
    assert "hint" in hinted._jdf.queryExecution().logical().toString().lower()
    spark.conf.set(BROADCAST_DIM_CONF, "0")
    try:
        plain = gated_broadcast(spark, SF_SMOKE, "part", df)
        assert (
            "hint"
            not in plain._jdf.queryExecution().logical().toString().lower()
        )
        assert plain is df
    finally:
        spark.conf.unset(BROADCAST_DIM_CONF)
