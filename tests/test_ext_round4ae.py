"""Round-4ae extension operators (SURVEY.md §2.45): semantic
invariants beyond the oracle hash — Gumbel moments vs numpy,
stickiness bounds and recompute, novelty vs python sets."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_gumbel_matches_numpy_moments(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["agg_gumbel_maxima"](spark, SF_T2)
        .toPandas()
        .set_index("event_type")
    )
    ev = t(spark, SF_T2, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("d")["cents"].sum()
        wk = (daily.index.astype("int64") // 10**9 // 604800)
        mx = daily.groupby(wk).max().to_numpy().astype(float)
        n = len(mx)
        if n <= 1:
            assert et not in got.index
            continue
        std = mx.std(ddof=1)
        beta = std * math.sqrt(6) / math.pi
        mu = mx.mean() - 0.5772156649015329 * beta
        p99 = mu - beta * math.log(-math.log(0.99))
        r = got.loc[et]
        assert r["n"] == n
        assert r["mu_cents"] == math.floor(mu + 0.5)
        assert r["beta_cents"] == math.floor(beta + 0.5)
        assert r["p99_peak_cents"] == math.floor(p99 + 0.5)
        # the p99 peak sits above the location parameter
        assert r["p99_peak_cents"] > r["mu_cents"]


def test_stickiness_bounds_and_recompute(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["agg_stickiness_ratio"](spark, SF_T2).toPandas()
    assert got["stickiness"].between(0, 1.000001).all()
    ev = t(spark, SF_T2, "events").toPandas()
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["m"] = pd.to_datetime(ev["ts"]).dt.to_period("M")
    for _, r in got.iterrows():
        m = pd.to_datetime(r["month_ms"], unit="ms").to_period("M")
        sub = ev[ev["m"] == m]
        dau = sub.groupby("d")["user_id"].nunique()
        mau = sub["user_id"].nunique()
        expected = math.floor(dau.mean() / mau * 1e6 + 0.5) / 1e6
        assert r["n_days"] == len(dau)
        assert r["mau"] == mau
        assert abs(r["stickiness"] - expected) < 1e-12


def test_novelty_matches_python_sets(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["text_ngram_novelty"](spark, SF_SMOKE)
        .toPandas()
        .set_index("lang")
    )
    docs = t(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    tri = {}
    for r in docs:
        w = [x for x in r["text"].split(" ") if x]
        grams = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
        key = (r["lang"], r["doc_id"] % 2)
        tri.setdefault(key, set()).update(grams)
    langs = {k[0] for k in tri}
    for lang in langs:
        new = tri.get((lang, 1), set())
        old = tri.get((lang, 0), set())
        if not new:
            assert lang not in got.index
            continue
        novel = len(new - old)
        r = got.loc[lang]
        assert r["n_grams"] == len(new)
        assert r["n_novel"] == novel
        expected = math.floor(novel / len(new) * 1e6 + 0.5) / 1e6
        assert abs(r["novelty"] - expected) < 1e-12


def test_novelty_strictly_interior(spark, queries):
    got = queries["text_ngram_novelty"](spark, SF_T2).toPandas()
    # trigram space (~40³) is sparsely sampled, so most trigrams are
    # new — but shared vocabulary guarantees SOME overlap: the metric
    # must sit strictly inside (0, 1), not saturate at either end
    assert (got["novelty"] > 0).all()
    assert (got["novelty"] < 1).all()
    assert (got["n_novel"] < got["n_grams"]).all()
