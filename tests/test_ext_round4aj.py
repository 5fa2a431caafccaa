"""Round-4aj extension operators (SURVEY.md §2.50): semantic
invariants beyond the oracle hash — recon catches exactly the
corrupted partitions, survivorship rules vs pandas, decay fit
bounds."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_recon_flags_exactly_corrupted_partitions(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_checksum_reconciliation"](spark, SF_T2).toPandas()
    assert len(got) == 16
    assert (got["n_a"] == got["n_b"]).all()  # counts agree; content differs
    o = t(spark, SF_T2, "orders").toPandas()
    corrupted_pts = set(
        (o.loc[o["o_orderkey"] % 1009 == 0, "o_orderkey"] % 16).unique()
    )
    flagged = set(got.loc[got["consistent"] == 0, "pt"])
    assert flagged == corrupted_pts
    assert 0 < len(flagged) < 16  # detects corruption, not everything


def test_golden_record_rules_match_pandas(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["dim_golden_record"](spark, SF_SMOKE)
        .toPandas()
        .set_index("household")
    )
    c = t(spark, SF_SMOKE, "customer").toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    spend = o.groupby("o_custkey").agg(
        sp=("cents", "sum"), last_d=("o_orderdate", "max")
    )
    c["household"] = c["c_custkey"] // 3
    c = c.join(spend, on="c_custkey")
    c["sp"] = c["sp"].fillna(0).astype("int64")
    c["last_ms"] = (
        pd.to_datetime(c["last_d"]).astype("int64") // 10**6
    ).where(c["last_d"].notna(), -1)
    for hh, g in c.groupby("household"):
        r = got.loc[hh]
        assert r["n_members"] == len(g)
        rep = g.sort_values(["sp", "c_custkey"], ascending=False).iloc[0]
        assert r["rep_custkey"] == rep["c_custkey"]
        nat = g.sort_values(
            ["last_ms", "c_custkey"], ascending=False
        ).iloc[0]
        assert r["nation_latest_order"] == nat["c_nationkey"]
        assert r["spend_cents"] == g["sp"].sum()
        # floor (not int-truncation): c_acctbal can be negative
        import numpy as np

        acct = int(
            np.floor(g["c_acctbal"].to_numpy() * 100 + 0.5).astype("int64").sum()
        )
        assert r["acctbal_cents"] == acct


def test_golden_record_partition_of_customers(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dim_golden_record"](spark, SF_T2).toPandas()
    n_cust = t(spark, SF_T2, "customer").count()
    assert int(got["n_members"].sum()) == n_cust
    assert got["household"].is_unique


def test_retention_fit_decays(spark, queries):
    got = queries["agg_retention_fit"](spark, SF_T2).toPandas().iloc[0]
    # retention curves decline: the log-log slope is negative
    assert got["decay_slope"] < 0
    assert got["n"] >= 10  # enough curve points for a meaningful fit
