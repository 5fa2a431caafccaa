"""Guard-rail tests for the pandas-UDF demo tiers (the per-row-frame
window UDAF) — the fast production twins live in the same module and
are oracle-checked via the registry."""

from __future__ import annotations

import pytest


def test_udf_window_agg_refuses_production_volume(spark, monkeypatch):
    """The per-row-frame demo tier must fail fast past 1e6 rows with
    the fast twin named — same policy as the all-pairs cosine guard."""
    from census_postgres_py_spark.operators import udfs as mod

    class FakeCount:
        def count(self):
            return 1_000_001

    monkeypatch.setattr(mod, "t", lambda *a, **k: FakeCount())
    # sf_dir with no orders.parquet => the O(1) footer proxy is
    # unavailable and the guard falls back to the table count
    with pytest.raises(ValueError, match="udf_window_agg_fast"):
        mod.udf_window_agg(spark, "/nonexistent_sf_dir")
