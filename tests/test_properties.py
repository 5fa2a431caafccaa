"""Algebraic invariants (SURVEY.md §5.2 item 4) — cheap deterministic
properties over the fixture tables that would catch a whole class of
operator bugs without needing an oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _lineitem(spark):
    from census_postgres_py_spark.tables import t

    return t(spark, SF_SMOKE, "lineitem")


def test_filter_composition(spark):
    li = _lineitem(spark)
    a = li.filter(F.col("l_quantity") > 10).filter(F.col("l_discount") <= 0.05)
    b = li.filter((F.col("l_quantity") > 10) & (F.col("l_discount") <= 0.05))
    assert a.count() == b.count()


def test_dedup_idempotent(spark, queries):
    once = queries["dedup_exact"](spark, SF_SMOKE)
    keys = [c for c in once.columns]
    assert once.dropDuplicates(keys).count() == once.count()


def test_union_commutative_under_count(spark):
    li = _lineitem(spark)
    a = li.filter(F.col("l_linenumber") <= 2)
    b = li.filter(F.col("l_linenumber") > 2)
    assert a.unionByName(b).count() == b.unionByName(a).count() == li.count()


def test_rollup_subtotals_sum_to_grand_total(spark, queries):
    df = queries["agg_rollup"](spark, SF_SMOKE)
    # the all-NULL grouping row is the grand total; leaf rows (no
    # NULL group keys) must sum to it exactly (sums here are exact:
    # revenue is round()ed identically on every grouping level only
    # AFTER this invariant would fail, so compare with tolerance)
    group_cols = [c for c in df.columns if df.schema[c].dataType.typeName() == "string"]
    measure = [c for c in df.columns if c not in group_cols][-1]
    total_row = df
    for c in group_cols:
        total_row = total_row.filter(F.col(c).isNull())
    leaf = df
    for c in group_cols:
        leaf = leaf.filter(F.col(c).isNotNull())
    grand = total_row.collect()[0][measure]
    leaf_sum = leaf.agg(F.sum(measure)).collect()[0][0]
    assert abs(leaf_sum - grand) < 1e-2 * max(abs(grand), 1.0)


def test_hll_mergeable_matches_exact_within_tolerance(spark, queries):
    """Merging per-day HLL sketches must estimate per-type distinct
    users within HLL error (default lgConfigK=12 => ~1.6% rsd; allow
    5%) of the exact count."""
    from census_postgres_py_spark.tables import t

    approx = {
        r["event_type"]: r["approx_users"]
        for r in queries["agg_hll_mergeable"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(0.05 * n, 2), (et, approx[et], n)


def test_sort_limit_is_global_topk(spark, queries):
    from census_postgres_py_spark.tables import t

    rows = queries["sort_limit"](spark, SF_SMOKE).collect()
    col = "o_totalprice"
    got = [r[col] for r in rows]
    assert got == sorted(got, reverse=True)
    true_max = (
        t(spark, SF_SMOKE, "orders").agg(F.max(col)).collect()[0][0]
    )
    assert got[0] == true_max
