"""Round-4t extension operators (SURVEY.md §2.34): semantic
invariants beyond the oracle hash — AUC vs sklearn-free recompute,
Luhn catches exactly the injected corruptions, uniqueness profile vs
direct counts."""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def _python_auc(scores, labels):
    """Tie-corrected Mann-Whitney AUC, brute force over pairs."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    return (wins + 0.5 * ties) / (len(pos) * len(neg)), len(pos), len(neg)


def test_auc_matches_pairwise_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_auc_roc"](spark, SF_SMOKE).toPandas().iloc[0]
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["m"] = pd.to_datetime(o["o_orderdate"]).dt.to_period("M")
    cut = (o["m"].max().to_timestamp() - pd.DateOffset(months=6))
    o["d"] = pd.to_datetime(o["o_orderdate"])
    feat = (
        o.assign(
            score=o["cents"].where(o["d"] < cut, 0),
            label=(o["d"] >= cut).astype(int),
        )
        .groupby("o_custkey")
        .agg(score=("score", "sum"), label=("label", "max"))
    )
    auc, n_pos, n_neg = _python_auc(feat["score"], feat["label"])
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert abs(got["auc"] - auc) < 2e-6
    assert got["u2"] == round(auc * 2 * n_pos * n_neg)


def test_auc_u2_bounds(spark, queries):
    got = queries["agg_auc_roc"](spark, SF_T2).toPandas().iloc[0]
    assert 0 <= got["u2"] <= 2 * got["n_pos"] * got["n_neg"]
    assert 0.0 <= got["auc"] <= 1.0


def _luhn_ok(num: int) -> bool:
    digits = [int(c) for c in str(num)][::-1]
    s = 0
    for i, d in enumerate(digits):  # i=0 is the check digit
        if i % 2 == 1:
            dd = 2 * d
            s += dd // 10 + dd % 10
        else:
            s += d
    return s % 10 == 0


def test_luhn_flags_exactly_injected_corruption(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["fn_luhn_checksum"](spark, SF_T2).toPandas()
    c = t(spark, SF_T2, "customer").toPandas()
    expected = (
        c.assign(bad=(c["c_custkey"] % 53 == 0).astype(int))
        .groupby("c_nationkey")
        .agg(n=("c_custkey", "size"), n_invalid=("bad", "sum"))
        .reset_index()
    )
    merged = got.merge(expected, on="c_nationkey", suffixes=("", "_exp"))
    assert len(merged) == len(got) == len(expected)
    assert (merged["n"] == merged["n_exp"]).all()
    assert (merged["n_invalid"] == merged["n_invalid_exp"]).all()
    assert int(got["n_invalid"].sum()) > 0  # corruption actually present


def test_luhn_python_agrees_on_construction(spark):
    # the generated check digit must satisfy the reference Luhn check
    for k in [1, 7, 52, 53, 1499]:
        base = k * 7919 + 100000000000
        digits = [int(c) for c in str(base)][::-1]
        s = 0
        for i, d in enumerate(digits):  # position 1.. from right of base
            if i % 2 == 0:  # becomes odd position once check appended
                dd = 2 * d
                s += dd // 10 + dd % 10
            else:
                s += d
        acct = base * 10 + (10 - s % 10) % 10
        assert _luhn_ok(acct)
        assert not _luhn_ok(acct + 1)


def test_uniqueness_profile_matches_direct(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["dq_uniqueness_profile"](spark, SF_T2)
        .toPandas()
        .set_index("col")
    )
    o = t(spark, SF_T2, "orders").toPandas()
    for col in ("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderkey"):
        v = o[col].astype(str)
        vc = v.value_counts()
        r = got.loc[col]
        assert r["n_rows"] == len(v)
        assert r["n_distinct"] == v.nunique()
        assert r["n_in_dups"] == int(vc[vc > 1].sum())
        top_count = int(vc.max())
        candidates = sorted(vc[vc == top_count].index)
        assert r["top_value"] == candidates[0]
        assert r["top_count"] == top_count
    # orderkey is the primary key: zero dup mass
    assert got.loc["o_orderkey", "n_in_dups"] == 0
