"""Unit behavior of the tables helpers the broadcast gates depend on:
approx_rows (O(1) footer count + count() fallback) and gated_broadcast
(conf parsing, hint vs pass-through). The plan-level consequences are
covered in tests/test_plans.py; these pin the primitives."""

from __future__ import annotations

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_approx_rows_matches_footer_and_scan(spark):
    from census_postgres_py_spark.tables import approx_rows, t

    n = approx_rows(spark, SF_SMOKE, "orders")
    assert n == pq.ParquetFile(f"{SF_SMOKE}/orders.parquet").metadata.num_rows
    assert n == t(spark, SF_SMOKE, "orders").count()
    assert n > 0


def test_approx_rows_sums_footers_for_directory_dataset(spark, tmp_path):
    # a directory of part-files (the sink layout) sums footers
    from census_postgres_py_spark.tables import approx_rows, t

    out = str(tmp_path / "orders.parquet")
    t(spark, SF_SMOKE, "orders").limit(100).repartition(3).write.parquet(out)
    assert approx_rows(spark, str(tmp_path), "orders") == 100


def test_approx_rows_falls_back_to_count_on_unreadable_footer(
    spark, tmp_path, monkeypatch
):
    # corrupt "parquet" file => pyarrow footer read raises => the
    # count() fallback path runs; monkeypatch t() so the fallback is
    # observable without a real scan of the bogus bytes
    from census_postgres_py_spark import tables

    bogus = tmp_path / "orders.parquet"
    bogus.write_bytes(b"not a parquet file")

    class _FakeDF:
        def count(self):
            return 7

    calls = []

    def fake_t(spark_, sf_dir_, name_):
        calls.append(name_)
        return _FakeDF()

    monkeypatch.setattr(tables, "t", fake_t)
    assert tables.approx_rows(spark, str(tmp_path), "orders") == 7
    assert calls == ["orders"]


def test_gated_broadcast_prices_vocab_expansion(spark):
    """ADVICE r7 (tables.py:107): term-level vocabulary frames must be
    gated on docs × VOCAB_ROWS_PER_DOC, not the raw document count — a
    corpus under the 8M-doc cap can still carry a vocabulary far past
    the broadcast ceiling."""
    from census_postgres_py_spark.tables import (
        BROADCAST_DIM_CONF,
        VOCAB_ROWS_PER_DOC,
        approx_rows,
        gated_broadcast,
        t,
    )

    n_docs = approx_rows(spark, SF_SMOKE, "documents")
    df = t(spark, SF_SMOKE, "documents").select("doc_id")
    # cap between n_docs and n_docs × factor: key-level hint survives,
    # vocab-priced hint is dropped
    cap = n_docs * VOCAB_ROWS_PER_DOC // 2
    assert n_docs < cap < n_docs * VOCAB_ROWS_PER_DOC
    spark.conf.set(BROADCAST_DIM_CONF, str(cap))
    try:
        keyed = gated_broadcast(spark, SF_SMOKE, "documents", df)
        assert (
            "hint" in keyed._jdf.queryExecution().logical().toString().lower()
        )
        vocab = gated_broadcast(
            spark,
            SF_SMOKE,
            "documents",
            df,
            rows_per_source_row=VOCAB_ROWS_PER_DOC,
        )
        assert vocab is df
    finally:
        spark.conf.unset(BROADCAST_DIM_CONF)


def test_gated_broadcast_hints_only_under_the_cap(spark):
    from census_postgres_py_spark.tables import (
        BROADCAST_DIM_CONF,
        gated_broadcast,
        t,
    )

    df = t(spark, SF_SMOKE, "part").select("p_partkey")
    hinted = gated_broadcast(spark, SF_SMOKE, "part", df)
    # hint surfaces as a ResolvedHint/UnresolvedHint node in the plan
    assert "hint" in hinted._jdf.queryExecution().logical().toString().lower()
    spark.conf.set(BROADCAST_DIM_CONF, "0")
    try:
        plain = gated_broadcast(spark, SF_SMOKE, "part", df)
        assert (
            "hint"
            not in plain._jdf.queryExecution().logical().toString().lower()
        )
        assert plain is df
    finally:
        spark.conf.unset(BROADCAST_DIM_CONF)


def test_gated_broadcast_keys_on_a_table_the_op_reads():
    """Static invariant (found the hard way in r8): every
    gated_broadcast(spark, sf_dir, "<tbl>", ...) call must sit in a
    function that also READS that table via t(spark, sf_dir, "<tbl>").
    Keying the gate on a table the op never reads crashes on
    table-subset corpora (e.g. the edges-only stress corpus carries
    only orders+lineitem): approx_rows falls back to t().count() on the
    missing file. The gate's row bound stays valid when keyed on the
    source table the frame derives from (a key-level derivation never
    exceeds its source's row count)."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)))
    bad = []
    for path in glob.glob(
        os.path.join(root, "census_postgres_py_spark", "**", "*.py"),
        recursive=True,
    ):
        with open(path) as fh:
            src = fh.read()
        for fn in re.split(r"\ndef ", src):
            fn_name = fn.split("(")[0].strip()
            reads = set(re.findall(r't\(spark,\s*sf_dir,\s*"(\w+)"\)', fn))
            for m in re.finditer(
                r'gated_broadcast\(\s*spark,\s*sf_dir,\s*"(\w+)"', fn
            ):
                if m.group(1) not in reads:
                    bad.append(f"{os.path.basename(path)}::{fn_name}"
                               f" gates on '{m.group(1)}', reads {sorted(reads)}")
    assert not bad, bad
