"""Round-4w extension operators (SURVEY.md §2.37): semantic
invariants beyond the oracle hash — shrinkage direction/ordering,
Mann-Kendall vs brute force, rare-collapse mass conservation."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_eb_shrinkage_pulls_toward_global(spark, queries):
    df = queries["agg_eb_smoothed_rate"](spark, SF_T2).toPandas()
    tn, tk = df["n"].sum(), df["k"].sum()
    p0 = tk / tn
    for _, r in df.iterrows():
        raw, sm = r["raw_rate"], r["smoothed_rate"]
        # smoothed sits strictly between raw and the global rate
        lo, hi = sorted([raw, p0])
        assert lo - 2e-6 <= sm <= hi + 2e-6
        # exact formula check
        expected = (r["k"] + 50 * tk / tn) / (r["n"] + 50)
        assert abs(sm - expected) < 2e-6


def test_eb_small_segments_shrink_harder(spark, queries):
    df = queries["agg_eb_smoothed_rate"](spark, SF_T2).toPandas()
    tn, tk = df["n"].sum(), df["k"].sum()
    p0 = tk / tn
    df["pull"] = (df["raw_rate"] - df["smoothed_rate"]).abs() / (
        (df["raw_rate"] - p0).abs() + 1e-12
    )
    big = df[df["n"] >= df["n"].median()]["pull"].mean()
    small = df[df["n"] < df["n"].median()]["pull"].mean()
    assert small >= big  # proportionally larger correction


def test_mann_kendall_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_mann_kendall"](spark, SF_T2).toPandas()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for _, r in got.iterrows():
        s = (
            ev[ev["event_type"] == r["event_type"]]
            .groupby("d")["cents"]
            .sum()
            .sort_index()
            .tolist()
        )
        n = len(s)
        S = sum(
            (1 if s[j] > s[i] else -1 if s[j] < s[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        assert r["s"] == S
        assert r["n_pairs"] == n * (n - 1) // 2
        assert abs(
            r["kendall_tau_a"]
            - math.floor(S / r["n_pairs"] * 1e6 + 0.5) / 1e6
        ) < 1e-12


def test_rare_collapse_conserves_mass(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["transform_rare_collapse"](spark, SF_T2).toPandas()
    n_orders = t(spark, SF_T2, "orders").count()
    assert int(got["n_rows"].sum()) == n_orders
    assert (got["n_rows"] == got["n_keys"]).all()  # orderkey is unique
    surv = got[got["category"] != "__other__"]
    assert (surv["n_rows"] >= 72).all()
    other = got[got["category"] == "__other__"]
    assert len(other) == 1 and other["n_rows"].iloc[0] > 0


def test_rare_collapse_other_only_holds_rare(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["transform_rare_collapse"](spark, SF_SMOKE).toPandas()
    o = t(spark, SF_SMOKE, "orders").toPandas()
    vc = (o["o_custkey"] % 211).value_counts()
    expected_other = int(vc[vc < 72].sum())
    other = got.loc[got["category"] == "__other__", "n_rows"]
    if expected_other:
        assert other.iloc[0] == expected_other
    else:
        assert len(other) == 0
