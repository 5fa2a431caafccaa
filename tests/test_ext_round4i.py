"""Round-4i extension operators (SURVEY.md §2.23): semantic invariants
beyond the oracle hash — linkage precision/recall on the injected
dirt, JSD bounds and symmetry-by-construction, lineage-column
round-trip — plus plan pins."""

from __future__ import annotations

import math

from census_postgres_py_spark.plans import executed_plan
from tests.conftest import SF_SMOKE, SF_T2


def test_record_linkage_recovers_injected_edits(spark, queries):
    from census_postgres_py_spark.tables import t

    got = {
        r["in_id"]: (r["matched_suppkey"], r["lev"])
        for r in queries["dedup_record_linkage"](spark, SF_T2).collect()
    }
    injected = {
        r["s_suppkey"] + 1000000: r["s_suppkey"]
        for r in t(spark, SF_T2, "supplier")
        .filter("s_suppkey % 7 = 0")
        .collect()
    }
    # total recall: every injected record matches back to its origin
    assert set(got) == set(injected)
    for in_id, (matched, lev) in got.items():
        assert matched == injected[in_id]  # perfect precision
        assert lev == 1  # the injected edit is exactly one substitution


def test_record_linkage_no_cartesian(spark, queries):
    plan = executed_plan(queries["dedup_record_linkage"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_jsd_bounds_and_pair_coverage(spark, queries):
    df = queries["text_js_divergence"](spark, SF_T2).toPandas()
    langs = {"de", "en", "es", "fr", "zh"}
    assert len(df) == 10  # all unordered pairs
    assert (df["lang_a"] < df["lang_b"]).all()
    assert set(df["lang_a"]) | set(df["lang_b"]) == langs
    ln2_e6 = math.floor(math.log(2) * 1e6 + 0.5)
    assert df["jsd_e6"].between(0, ln2_e6).all()
    # shared query-engine vocab ⇒ languages are NOT disjoint
    assert (df["jsd_e6"] < ln2_e6).all()


def test_file_metadata_roundtrip(spark, queries):
    row = queries["scan_file_metadata"](spark, SF_T2).collect()[0]
    assert row["n_files"] == 4
    assert row["n_rows"] == 25
    assert row["n_keys"] == 25
