"""Round-4o extension operators (SURVEY.md §2.29): semantic
invariants beyond the oracle hash — BM25 vs a rank_bm25-style Python
recompute, PMI symmetry-of-inputs, Zipf slope negativity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_SMOKE

_QUERY = ("join", "scan", "window", "stream")


def _corpus(spark, sf_dir):
    from census_postgres_py_spark.tables import t

    rows = t(spark, sf_dir, "documents").select("doc_id", "text", "lang").collect()
    return {r["doc_id"]: [w for w in r["text"].split(" ") if w] for r in rows}


def test_bm25_matches_python_recompute(spark, queries):
    docs = _corpus(spark, SF_SMOKE)
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = Counter()
    for w in docs.values():
        for term in set(w) & set(_QUERY):
            df[term] += 1
    scores = {}
    nterms = {}
    for d, w in docs.items():
        tf = Counter(t for t in w if t in _QUERY)
        if not tf:
            continue
        s = 0
        for term, f in tf.items():
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1)
            sat = f * 2.2 / (f + 1.2 * (1 - 0.75 + 0.75 * len(w) / avgdl))
            s += math.floor(idf * sat * 1e6 + 0.5)
        scores[d] = s
        nterms[d] = len(tf)
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = queries["text_bm25"](spark, SF_SMOKE).toPandas()
    assert [(r["doc_id"], r["score_e6"]) for _, r in got.iterrows()] == expected
    for _, r in got.iterrows():
        assert r["n_terms"] == nterms[r["doc_id"]]


def test_pmi_matches_python_recompute(spark, queries):
    docs = _corpus(spark, SF_SMOKE)
    uni = Counter()
    big = Counter()
    for w in docs.values():
        uni.update(w)
        big.update(zip(w, w[1:]))
    nt = sum(uni.values())
    nb = sum(big.values())
    got = queries["text_pmi_bigrams"](spark, SF_SMOKE).toPandas()
    assert set(zip(got["a"], got["b"])) == {
        p for p, c in big.items() if c >= 5
    }
    for _, r in got.iterrows():
        c_ab = big[(r["a"], r["b"])]
        assert r["c_ab"] == c_ab
        pmi = math.log(
            c_ab * nt * nt / (nb * uni[r["a"]] * uni[r["b"]])
        )
        assert abs(r["pmi"] - pmi) < 2e-6


def test_zipf_slope_negative_and_complete(spark, queries):
    got = queries["text_zipf_slope"](spark, SF_SMOKE).toPandas()
    langs = {r for r in got["lang"]}
    assert len(langs) == len(got)  # one row per language
    # frequencies decrease with rank, so the log-log slope is negative
    assert (got["slope"] < 0).all()
    assert (got["n"] >= 2).all()


def test_bm25_filter_pushed_before_heavy_agg(spark, queries):
    plan = (
        queries["text_bm25"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-20 must be a TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan
