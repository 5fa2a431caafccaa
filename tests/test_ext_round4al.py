"""Round-4al extension operators (SURVEY.md §2.52): semantic
invariants beyond the oracle hash — perplexity vs python LM, PSI
null behavior, TWAB vs direct interval averaging."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_perplexity_matches_python_lm(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["text_perplexity_filter"](spark, SF_SMOKE).toPandas()
    docs = t(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    bc = Counter()
    doc_bigrams = {}
    for r in docs:
        ws = [x for x in r["text"].split(" ") if x]
        bs = list(zip(ws, ws[1:]))
        doc_bigrams[r["doc_id"]] = bs
        bc.update(bs)
    uc = Counter()
    for (a, _), c in bc.items():
        uc[a] += c
    vocab = len({b for _, b in bc})
    scores = {}
    for d, bs in doc_bigrams.items():
        if not bs:
            continue
        s = sum(
            math.floor(
                -math.log((bc[bg] + 1.0) / (uc[bg[0]] + vocab)) * 1e6 + 0.5
            )
            for bg in bs
        )
        scores[d] = (math.floor(s / len(bs) + 0.5), len(bs))
    expected = sorted(
        scores.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:20]
    assert list(got["doc_id"]) == [d for d, _ in expected]
    for (d, (avg, nb)), (_, r) in zip(expected, got.iterrows()):
        assert r["avg_nll_e6"] == avg
        assert r["n_bigrams"] == nb


def test_psi_null_is_stable(spark, queries):
    got = queries["dq_distribution_psi"](spark, SF_T2).toPandas().iloc[0]
    assert got["n_bins"] == 10
    assert got["n_ref"] + got["n_cur"] > 0
    # same-distribution halves: PSI far below the 0.1 alarm line
    assert 0 <= got["psi"] < 0.1


def test_psi_counts_cover_population(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["dq_distribution_psi"](spark, SF_T2).toPandas().iloc[0]
    n = t(spark, SF_T2, "orders").count()
    assert got["n_ref"] + got["n_cur"] == n


def test_twab_matches_direct_average(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["ts_twab_monthly"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("month_ms")
        .reset_index(drop=True)
    )
    o = t(spark, SF_SMOKE, "orders").toPandas()
    o["s"] = pd.to_datetime(o["o_orderdate"])
    o["e"] = o["s"] + pd.to_timedelta(
        (o["o_orderkey"] % 30 + 1).astype(int), unit="D"
    )
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    days = pd.date_range(o["s"].min(), (o["e"] + pd.Timedelta(days=1)).max(), freq="D")
    bal = pd.Series(0, index=days, dtype="int64")
    for _, r in o.iterrows():
        bal.loc[r["s"] : r["e"]] += r["cents"]
    bal = bal.loc[: bal.index.max()]
    monthly = bal.groupby(bal.index.to_period("M")).agg(["mean", "size"])
    got["m"] = pd.to_datetime(got["month_ms"], unit="ms").dt.to_period("M")
    for _, r in got.iterrows():
        mrow = monthly.loc[r["m"]]
        assert r["n_days"] == int(mrow["size"])
        assert r["twab_cents"] == math.floor(mrow["mean"] + 0.5)


def test_twab_is_positive_through_horizon(spark, queries):
    got = queries["ts_twab_monthly"](spark, SF_T2).toPandas()
    # interior months carry live balance
    inner = got.sort_values("month_ms").iloc[1:-1]
    assert (inner["twab_cents"] > 0).all()
