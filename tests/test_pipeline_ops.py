"""Semantic tests for the §2.11 deterministic-pipeline operators —
properties the oracle hash can't express: determinism across runs,
chunk reconstruction, sampling-rate bounds, and agreement with the
(nondeterministic) built-in statistics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_sample_hash_stratified_is_deterministic(spark, queries):
    a = queries["sample_hash_stratified"](spark, SF_SMOKE).collect()
    b = queries["sample_hash_stratified"](spark, SF_SMOKE).collect()
    assert sorted(a) == sorted(b)


def test_sample_hash_stratified_rates(spark, queries):
    from census_postgres_py_spark.tables import t

    total = (
        t(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    totals = {r["o_orderpriority"]: r["count"] for r in total}
    got = queries["sample_hash_stratified"](spark, SF_SMOKE)
    kept = {
        r["o_orderpriority"]: r["count"]
        for r in got.groupBy("o_orderpriority").count().collect()
    }
    # md5 prefix is uniform: urgent ~50% (0x80/256), others ~10% (0x1a/256).
    urgent = kept.get("1-URGENT", 0) / totals["1-URGENT"]
    assert 0.35 < urgent < 0.65, urgent
    rest_kept = sum(v for k, v in kept.items() if k != "1-URGENT")
    rest_total = sum(v for k, v in totals.items() if k != "1-URGENT")
    assert 0.04 < rest_kept / rest_total < 0.18


def test_agg_stats_exact_matches_builtin_moments(spark, queries):
    """The decimal-sum moments must agree with Spark's var_samp/corr to
    float tolerance (the builtins are merge-order-dependent, ours are
    exact — but on one small run they should coincide to ~1e-9)."""
    from census_postgres_py_spark.tables import t

    ours = {
        r["l_returnflag"]: r
        for r in queries["agg_stats_exact"](spark, SF_SMOKE).collect()
    }
    ref = {
        r["l_returnflag"]: r
        for r in t(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.avg("l_quantity").alias("mean_qty"),
            F.var_samp("l_quantity").alias("var_qty"),
            F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        )
        .collect()
    }
    assert set(ours) == set(ref)
    for flag, row in ours.items():
        for col in ("mean_qty", "var_qty", "corr_qty_price"):
            # ours are pinned to 1e-6 (cross-engine FMA-drift guard),
            # so the half-step of that grid is the comparison floor
            assert math.isclose(
                row[col], ref[flag][col], rel_tol=1e-6, abs_tol=5.1e-7
            ), (flag, col, row[col], ref[flag][col])


def test_agg_mode_is_the_max_count(spark, queries):
    from census_postgres_py_spark.tables import t

    modes = {
        r["order_year"]: (r["mode_priority"], r["cnt"])
        for r in queries["agg_mode"](spark, SF_SMOKE).collect()
    }
    counts = (
        t(spark, SF_SMOKE, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderpriority",
        )
        .count()
        .collect()
    )
    best: dict[int, int] = {}
    for r in counts:
        best[r["order_year"]] = max(best.get(r["order_year"], 0), r["count"])
    assert set(modes) == set(best)
    for year, (_, cnt) in modes.items():
        assert cnt == best[year]


def test_text_chunk_fixed_reconstructs_documents(spark, queries):
    """Concatenating a doc's chunks in chunk_id order must reproduce
    its token stream exactly, and every chunk except the last must be
    full (32 tokens)."""
    from census_postgres_py_spark.tables import t

    chunks = queries["text_chunk_fixed"](spark, SF_SMOKE)
    rebuilt = {
        r["doc_id"]: (r["joined"], r["n_chunks"], r["total_tokens"])
        for r in chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
            ).alias("joined"),
            F.count("*").alias("n_chunks"),
            F.sum("chunk_tokens").alias("total_tokens"),
        )
        .collect()
    }
    docs = {
        r["doc_id"]: r["norm"]
        for r in t(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("norm"),
        )
        .collect()
        if r["norm"]
    }
    assert set(rebuilt) == set(docs)
    for doc_id, (joined, n_chunks, total_tokens) in rebuilt.items():
        assert joined == docs[doc_id], doc_id
        n_toks = len(docs[doc_id].split(" "))
        assert total_tokens == n_toks
        assert n_chunks == -(-n_toks // 32)


def test_chunk_sizes_full_except_last(spark, queries):
    chunks = queries["text_chunk_fixed"](spark, SF_SMOKE)
    last = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last_id"))
    bad = (
        chunks.join(last, "doc_id")
        .filter(
            (F.col("chunk_id") < F.col("last_id"))
            & (F.col("chunk_tokens") != 32)
        )
        .count()
    )
    assert bad == 0


def test_pii_redact_leaves_no_digits(spark, queries):
    red = queries["text_pii_redact"](spark, SF_SMOKE)
    assert red.filter(F.col("redacted").rlike("[0-9]")).count() == 0
    assert red.count() > 0


def test_fn_hash_known_vector(spark, queries):
    """Pin md5/sha256 against Python's hashlib on an actual row so the
    engine encoding (UTF-8 bytes of the name) is what we claim."""
    import hashlib

    from census_postgres_py_spark.tables import t

    row = queries["fn_hash"](spark, SF_SMOKE).orderBy("c_custkey").first()
    name = (
        t(spark, SF_SMOKE, "customer")
        .orderBy("c_custkey")
        .select("c_name")
        .first()["c_name"]
    )
    assert row["h_md5"] == hashlib.md5(name.encode()).hexdigest()
    assert row["h_sha256"] == hashlib.sha256(name.encode()).hexdigest()


def test_win_ntile_quartiles_are_balanced(spark, queries):
    df = queries["win_ntile_distribution"](spark, SF_SMOKE)
    per = (
        df.groupBy("c_nationkey", "quartile")
        .count()
        .groupBy("c_nationkey")
        .agg((F.max("count") - F.min("count")).alias("spread"))
    )
    # ntile balances to within one row per partition by definition
    assert per.filter(F.col("spread") > 1).count() == 0


def test_split_assign_partitions_every_doc_once(spark, queries):
    from census_postgres_py_spark.tables import t

    split = queries["sample_split_assign"](spark, SF_SMOKE)
    n_docs = t(spark, SF_SMOKE, "documents").count()
    assert split.count() == n_docs
    assert split.select("doc_id").distinct().count() == n_docs
    frac = {
        r["split"]: r["count"] / n_docs
        for r in split.groupBy("split").count().collect()
    }
    assert 0.8 < frac.get("train", 0) <= 1.0
    assert frac.get("test", 0) < 0.15 and frac.get("val", 0) < 0.15


def test_training_pipeline_token_conservation(spark, queries):
    """Shard-packed token totals must equal the token counts of the
    kept (english, quality-pass, deduped) documents — nothing lost or
    double-counted across the chunk/pack stages."""
    from census_postgres_py_spark.tables import t

    shards = queries["pipeline_training_e2e"](spark, SF_SMOKE)
    packed = shards.agg(
        F.sum("n_tokens").alias("tok"), F.sum("n_chunks").alias("ck")
    ).first()
    docs = (
        t(spark, SF_SMOKE, "documents")
        .filter(F.col("lang") == "en")
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("n"),
        )
        .filter(F.col("n").between(10, 10000))
    )
    expect = docs.agg(F.sum("n")).first()[0]
    # fixture has no exact dups among quality-pass english docs, so
    # dedup drops nothing and totals must match exactly
    assert packed["tok"] == expect
    assert shards.count() <= 16
