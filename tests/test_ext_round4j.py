"""Round-4j extension operators (SURVEY.md §2.24): semantic invariants
beyond the oracle hash — allocation conservation bounds, path
determinism under repartitioning, mask referential stability — plus
plan pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_bridge_allocation_conserves_within_floor_remainder(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["join_bridge_allocation"](spark, SF_T2).toPandas()
    allocated = int(df["allocated_cents"].sum())
    orders = t(spark, SF_T2, "orders")
    li = t(spark, SF_T2, "lineitem").select("l_orderkey").distinct()
    # only headers that HAVE bridge rows can allocate (the fixture has
    # orders with zero lineitems — those correctly drop out)
    total = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
        )
        .collect()[0][0]
    )
    n_lines = int(df["n_lines"].sum())
    # floor allocation: never exceeds the headers, loses < 1 cent/line
    assert allocated <= total
    assert total - allocated < n_lines
    assert (df["allocated_cents"] > 0).all()


def test_path_signatures_deterministic_under_repartition(spark, queries):
    a = queries["agg_path_signatures"](spark, SF_T2).collect()
    b = queries["agg_path_signatures"](spark, SF_T2).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    for r in a:
        assert set(r["path"].split(">")) <= {
            "click", "error", "purchase", "signup", "view"
        }
        assert r["n_journeys"] >= 1


def test_mask_is_referentially_stable_and_irreversible(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["transform_mask_deterministic"](spark, SF_T2).toPandas()
    src = t(spark, SF_T2, "customer").toPandas()
    # same name → same mask; distinct names → distinct masks (8 hex
    # chars over 1500 names: collision would break referential joins)
    joined = df.merge(src, on="c_custkey")
    per_name = joined.groupby("c_name")["masked_name"].nunique()
    assert (per_name == 1).all()
    assert joined["masked_name"].nunique() == joined["c_name"].nunique()
    # no raw name leaks into the mask
    assert not joined.apply(
        lambda r: r["c_name"] in r["masked_name"], axis=1
    ).any()
    # generalized balances are coarser than raw ones
    assert df["acctbal_bucket"].nunique() < len(df) / 5


def test_mask_shuffle_free(spark, queries):
    plan = executed_plan(queries["transform_mask_deterministic"](spark, SF_SMOKE))
    assert "Exchange" not in plan
