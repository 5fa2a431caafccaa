"""Round-4n extension operators (SURVEY.md §2.28): semantic
invariants beyond the oracle hash — closure completeness vs a Python
recompute, triangle identity (3× total), degree-sum handshake."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE


def test_hier_flatten_matches_python_closure(spark, queries):
    from census_postgres_py_spark.tables import t

    df = queries["hier_flatten"](spark, SF_SMOKE).toPandas()
    keys = [
        r["c_custkey"]
        for r in t(spark, SF_SMOKE, "customer").select("c_custkey").collect()
    ]
    expected = set()
    for c in keys:
        anc, d = c // 10, 1
        while anc >= 1:
            expected.add((anc, c, d))
            anc, d = anc // 10, d + 1
    got = {(r["anc"], r["des"], r["depth"]) for _, r in df.iterrows()}
    assert got == expected
    assert len(df) == len(got)  # no duplicate paths


def test_hier_flatten_depth_consistent(spark, queries):
    df = queries["hier_flatten"](spark, SF_SMOKE).toPandas()
    for _, r in df.iterrows():
        # walking des up depth times lands exactly on anc
        x = r["des"]
        for _ in range(r["depth"]):
            x //= 10
        assert x == r["anc"]


def test_triangle_total_is_divisible_by_three(spark, queries):
    df = queries["graph_triangle_count"](spark, SF_SMOKE).toPandas()
    # each triangle contributes one count to each of its 3 corners
    assert int(df["n_triangles"].sum()) % 3 == 0
    assert (df["n_triangles"] > 0).all()


def test_triangle_count_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.operators.ext_round4n import (
        _copurchase_edges,
    )

    edges = {
        (r["pa"], r["pb"])
        for r in _copurchase_edges(spark, SF_SMOKE).collect()
    }
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)  # oriented a < b
    per_node = defaultdict(int)
    for a, b in edges:
        for c in nbrs[a] & nbrs[b]:
            per_node[a] += 1
            per_node[b] += 1
            per_node[c] += 1
    df = queries["graph_triangle_count"](spark, SF_SMOKE).toPandas()
    got = {r["l_partkey"]: r["n_triangles"] for _, r in df.iterrows()}
    assert got == dict(per_node)


def test_degree_hist_handshake(spark, queries):
    from census_postgres_py_spark.operators.ext_round4n import (
        _copurchase_edges,
    )

    n_edges = _copurchase_edges(spark, SF_SMOKE).count()
    df = queries["graph_degree_hist"](spark, SF_SMOKE).toPandas()
    # Σ degree = 2·|E| — recover Σ degree from bucket mins/maxes is
    # lossy, so recompute via a second aggregation path instead
    from pyspark.sql import functions as F

    edges = _copurchase_edges(spark, SF_SMOKE)
    deg_sum = (
        edges.select(F.col("pa").alias("p"))
        .unionAll(edges.select(F.col("pb")))
        .count()
    )
    assert deg_sum == 2 * n_edges
    # bucket bounds are consistent
    for _, r in df.iterrows():
        assert r["bucket"] * 16 <= r["min_degree"] <= r["max_degree"]
        assert r["max_degree"] < (r["bucket"] + 1) * 16


def test_triangle_big_graph_path_matches_small_graph_path(
    spark, queries, monkeypatch
):
    """The gate has two estimate paths: small-graph (O(1) footer bound
    under the cap -> baskets localCheckpointed, bound read off the
    blocks) and big-graph (baskets stay LAZY, bound from the
    count-per-order agg — checkpointing lineitem-scale blocks before
    the decision exhausted /tmp at 100x in r8). Forcing the big path
    by faking a huge footer count must yield a bit-identical answer."""
    from census_postgres_py_spark.operators import ext_round4n as mod

    small = sorted(
        map(tuple, queries["graph_triangle_count"](spark, SF_SMOKE).collect())
    )
    monkeypatch.setattr(mod, "approx_rows", lambda *_: 10**12)
    big = sorted(
        map(tuple, queries["graph_triangle_count"](spark, SF_SMOKE).collect())
    )
    assert small and small == big


def test_triangle_degree_orientation_invariant(spark, queries):
    """Triangle sets are invariant under ANY consistent edge
    orientation, so forcing the r10 degree-orientation remap
    (pk' = occ<<32 | part) must reproduce the id-oriented output
    exactly — same parts, same counts."""
    from census_postgres_py_spark.operators import ext_round4n

    # Guard against a vacuous pass (r10 ADVICE): if footer stats were
    # absent the forced run would silently fall back to id-orientation
    # and forced == base would hold trivially. The same bounds check
    # gates the remap inside the operator, so proving it non-None (and
    # in packed-key range) here proves the orientation actually engages
    # under the zeroed confs below.
    bounds = ext_round4n._partkey_bounds(SF_SMOKE)
    assert bounds is not None, "fixture parquet lost its footer stats"
    assert 0 <= bounds[0] and bounds[1] <= 2**31 - 1

    base = {
        (r["l_partkey"], r["n_triangles"])
        for r in queries["graph_triangle_count"](spark, SF_SMOKE).collect()
    }
    spark.conf.set(ext_round4n._DEG_ORIENT_MIN_ROWS_CONF, "0")
    spark.conf.set(ext_round4n._DEG_ORIENT_SKEW_RATIO_CONF, "0")
    try:
        forced = {
            (r["l_partkey"], r["n_triangles"])
            for r in queries["graph_triangle_count"](
                spark, SF_SMOKE
            ).collect()
        }
    finally:
        spark.conf.unset(ext_round4n._DEG_ORIENT_MIN_ROWS_CONF)
        spark.conf.unset(ext_round4n._DEG_ORIENT_SKEW_RATIO_CONF)
    assert forced == base
