"""Round-4ao extension operators (SURVEY.md §2.55): semantic
invariants beyond the oracle hash — interval union vs day-set
recompute, MI near-zero independence, tail ratio bounds."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_interval_union_matches_day_sets(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_interval_union_days"](spark, SF_SMOKE)
        .toPandas()
        .set_index("c_custkey")
    )
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["s"] = pd.to_datetime(o["o_orderdate"])
    o["days"] = (o["o_orderkey"] % 30 + 1).astype(int)
    for cust, g in o.groupby("o_custkey"):
        days = set()
        for _, r in g.iterrows():
            for k in range(r["days"] + 1):
                days.add(r["s"] + pd.Timedelta(days=k))
        assert got.loc[cust, "covered_days"] == len(days)
        assert got.loc[cust, "n_intervals"] == len(g)


def test_interval_union_bounds(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_interval_union_days"](spark, SF_T2).toPandas()
    o = t(spark, SF_T2, "orders").toPandas()
    o["dur"] = (o["o_orderkey"] % 30 + 2).astype(int)  # inclusive days
    naive = o.groupby("o_custkey")["dur"].sum()
    m = got.set_index("c_custkey")
    # union never exceeds the naive sum, and overlaps exist somewhere
    assert (m["covered_days"] <= naive.loc[m.index]).all()
    assert (m["covered_days"] < naive.loc[m.index]).any()


def test_mutual_information_near_zero(spark, queries):
    got = queries["agg_mutual_information"](spark, SF_T2).toPandas().iloc[0]
    assert got["n_cells"] == 35  # 5 types × 7 days
    # type and weekday are independent in the fixture
    assert 0 <= got["mi_nats"] < 0.01


def test_mutual_information_matches_python(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_mutual_information"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = t(spark, SF_SMOKE, "events").toPandas()
    ev["dow"] = pd.to_datetime(ev["ts"]).dt.dayofweek + 1
    cells = Counter(zip(ev["event_type"], ev["dow"]))
    n = sum(cells.values())
    ct = Counter()
    cd = Counter()
    for (t_, d), c in cells.items():
        ct[t_] += c
        cd[d] += c
    total_e9 = sum(
        math.floor(
            c / n * math.log(c * n / (ct[t_] * cd[d])) * 1e9 + 0.5
        )
        for (t_, d), c in cells.items()
    )
    expected = math.floor(total_e9 / 1000 + 0.5) / 1e6
    assert got["n_cells"] == len(cells)
    assert abs(got["mi_nats"] - expected) < 1e-12


def test_tail_ratio_ordering(spark, queries):
    got = queries["win_tail_ratio"](spark, SF_T2).toPandas()
    assert (got["p99"] >= got["p50"]).all()
    assert (got["tail_ratio"] >= 1.0).all()
    for _, r in got.iterrows():
        assert abs(
            r["tail_ratio"] - math.floor(r["p99"] / r["p50"] * 1e4 + 0.5) / 1e4
        ) < 1e-9
