"""Round-4f extension operators (SURVEY.md §2.20): semantic invariants
beyond the oracle hash — chi-square margin identities, vocab-growth
conservation, survival monotonicity — plus plan pins."""

from __future__ import annotations

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_chisq_margins_consistent(spark, queries):
    df = queries["agg_chisq_independence"](spark, SF_T2).toPandas()
    n = df["observed"].sum()
    # expected counts share the observed margins: per-row sums of
    # expected ≈ per-row sums of observed (c100 render, ≤1 unit/cell)
    for et, grp in df.groupby("event_type"):
        assert abs(grp["expected_c100"].sum() / 100 - grp["observed"].sum()) < 0.1
    for dow, grp in df.groupby("dow"):
        assert abs(grp["expected_c100"].sum() / 100 - grp["observed"].sum()) < 0.1
    assert (df["chi2_contrib_e4"] >= 0).all()
    assert df["dow"].between(1, 7).all()
    assert n > 0


def test_vocab_growth_conservation(spark, queries):
    from census_postgres_py_spark.tables import t
    from pyspark.sql import functions as F

    df = queries["text_vocab_growth"](spark, SF_T2).toPandas().sort_values("bucket")
    docs = t(spark, SF_T2, "documents")
    total_vocab = (
        docs.select(F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert int(df["new_terms"].sum()) == total_vocab
    assert df["cum_vocab"].iloc[-1] == total_vocab
    assert (df["cum_vocab"].diff().dropna() >= 0).all()
    assert (df["cum_tokens"].to_numpy() == df["bucket_tokens"].cumsum().to_numpy()).all()
    # growth decelerates overall: later half adds fewer new terms than
    # the first bucket alone (Heaps saturation on a finite vocab)
    half = len(df) // 2
    assert df["new_terms"].iloc[half:].max() <= df["new_terms"].iloc[0]


def test_survival_monotone_from_one(spark, queries):
    df = (
        queries["agg_survival_curve"](spark, SF_T2)
        .toPandas()
        .sort_values("age_weeks")
        .reset_index(drop=True)
    )
    assert df.loc[0, "age_weeks"] == 0
    assert df.loc[0, "survival_ppm"] == 1_000_000  # everyone survives age 0
    assert (df["surviving"].diff().dropna() <= 0).all()
    assert (df["surviving"] <= df["n_users"]).all()
    assert df["n_users"].nunique() == 1


def test_chisq_single_contingency_pass(spark, queries):
    plan = executed_plan(queries["agg_chisq_independence"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
