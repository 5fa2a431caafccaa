"""Round-4x extension operators (SURVEY.md §2.38): semantic
invariants beyond the oracle hash — OHLC bounds and first/last
identity, sweep monotonicity + brute-force parity, manifest pruning
is lossless and actually prunes."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE, SF_T2


def test_ohlc_bounds_and_volume(spark, queries):
    got = queries["win_ohlc_candles"](spark, SF_T2).toPandas()
    assert (got["low"] <= got["open"]).all()
    assert (got["low"] <= got["close"]).all()
    assert (got["open"] <= got["high"]).all()
    assert (got["close"] <= got["high"]).all()
    assert (got["volume_cents"] >= got["high"]).all()
    assert (got["n_trades"] >= 1).all()


def test_ohlc_matches_pandas_first_last(spark, queries):
    from census_postgres_py_spark.tables import t

    got = queries["win_ohlc_candles"](spark, SF_SMOKE).toPandas()
    ev = t(spark, SF_SMOKE, "events").toPandas()
    ev["cents"] = (ev["value"] * 100 + 0.5).astype("int64")
    ev["bucket"] = (
        pd.to_datetime(ev["ts"]).astype("int64") // 10**9 // 21600
    )
    for (et, bk), g in ev.groupby(["event_type", "bucket"]):
        g = g.sort_values(["ts", "event_id"])
        row = got[(got["event_type"] == et) & (got["bucket"] == bk)]
        assert len(row) == 1
        r = row.iloc[0]
        assert r["open"] == g["cents"].iloc[0]
        assert r["close"] == g["cents"].iloc[-1]
        assert r["high"] == g["cents"].max()
        assert r["low"] == g["cents"].min()
        assert r["n_trades"] == len(g)
        assert r["volume_cents"] == g["cents"].sum()


def test_sweep_monotone_and_matches_bruteforce(spark, queries):
    from census_postgres_py_spark.tables import t

    got = (
        queries["emb_dedup_sweep"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("th_x100")
        .reset_index(drop=True)
    )
    # higher threshold -> fewer pairs, fewer dropped
    assert (got["n_pairs"].diff().dropna() <= 0).all()
    assert (got["n_dropped"].diff().dropna() <= 0).all()
    assert (got["n_dropped"] <= got["n_pairs"]).all()
    rows = t(spark, SF_SMOKE, "embeddings").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype="float64"))
        )
    for th in (30, 40, 50, 60, 70):
        n_pairs = 0
        dropped = set()
        for vs in by_label.values():
            for i in range(len(vs)):
                for j in range(len(vs)):
                    ia, va = vs[i]
                    ib, vb = vs[j]
                    if ia >= ib:
                        continue
                    cos = float(va @ vb) / (
                        math.sqrt(float(va @ va))
                        * math.sqrt(float(vb @ vb))
                    )
                    if cos >= th / 100.0:
                        n_pairs += 1
                        dropped.add(ib)
        r = got[got["th_x100"] == th].iloc[0]
        assert r["n_pairs"] == n_pairs, th
        assert r["n_dropped"] == len(dropped), th


def test_manifest_prune_matches_full_scan(spark, queries):
    from census_postgres_py_spark.tables import t
    from pyspark.sql import functions as F

    got = (
        queries["pipeline_manifest_prune_e2e"](spark, SF_T2)
        .toPandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    o = t(spark, SF_T2, "orders")
    n = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    lo, hi = n // 4, n // 2 - 1
    full = (
        o.filter(F.col("o_orderkey").between(lo, hi))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("cents"),
        )
        .toPandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    assert (got["n"] == full["n"]).all()
    assert (got["cents"] == full["cents"]).all()


def test_tile_rows_memory_parse_matches_spark_size_semantics():
    """_tile_rows_default must read spark.executor.memory the way
    Spark's getSizeAsMb does: bare number = MiB, explicit 'b' = bytes,
    k/m/g/t suffixes = binary units (r11 ADVICE — a bare '4096' used
    to parse as 4096 BYTES and silently clamp to the 2048 floor)."""
    from census_postgres_py_spark.operators.ext_round4x import (
        _tile_rows_default,
    )

    class _Conf:
        def __init__(self, mem):
            self._mem = mem

        def get(self, key, default=None):
            return self._mem if key == "spark.executor.memory" else default

    class _SC:
        defaultParallelism = 32

    class _Spark:
        sparkContext = _SC()

        def __init__(self, mem):
            self.conf = _Conf(mem)

    def rows(mem):
        return _tile_rows_default(_Spark(mem))

    # bare == m-suffix == g-suffix at the same size (MiB semantics);
    # 16 GiB/32 cores sits strictly between the clamps, so a bytes
    # misparse (floor) or unit inflation (ceiling) both fail this
    assert rows("16384") == rows("16384m") == rows("16g")
    assert 2048 < rows("16384") < 8192
    # explicit byte suffix stays bytes → tiny mem → floor clamp
    assert rows("4096b") == 2048
    # huge boxes clamp to the ceiling
    assert rows("1t") == 8192
    # sanity: the 128 GiB/32-core bench box lands on the ceiling
    assert rows("131072m") == 8192
