"""Interleaved A/B: sig localCheckpoint kept vs removed, after the r13
nsq-on-sig rewrite (sig consumers dropped 3->2 in the small-vocab plan,
so the r12 'checkpoint wins at >=3 consumers' rule no longer implies
keeping it). Also counts build/exec jobs per leg.

Usage: python tools/ab_tfidf_r13.py [--sf-dir DIR] [--reps N] [--force-big]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--force-big", action="store_true")
    ap.add_argument("--mem", default="8g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("ab-tfidf-r13")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.force_big:
        spark.conf.set("spark.census.tfidf.smallVocabMax", "0")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    from census_postgres_py_spark import registry

    fn = registry.all_queries()["dedup_tfidf_cosine"]
    real_ckpt = DataFrame.localCheckpoint

    def run(ckpt: bool, tag: str):
        DataFrame.localCheckpoint = (
            real_ckpt if ckpt else (lambda self, eager=True: self)
        )
        try:
            grp = f"b_{tag}"
            sc.setJobGroup(grp, tag)
            df = fn(spark, args.sf_dir)
            b = len(tracker.getJobIdsForGroup(grp))
            grp2 = f"e_{tag}"
            sc.setJobGroup(grp2, tag)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            e = len(tracker.getJobIdsForGroup(grp2))
            return dt, b, e
        finally:
            DataFrame.localCheckpoint = real_ckpt

    # warm both legs once
    run(True, "warmA")
    run(False, "warmB")
    ta, tb = [], []
    for i in range(args.reps):
        dt, b, e = run(True, f"A{i}")
        ta.append(dt)
        print(f"rep {i} ckpt:   {dt:6.2f}s build={b} exec={e}")
        dt, b, e = run(False, f"B{i}")
        tb.append(dt)
        print(f"rep {i} nockpt: {dt:6.2f}s build={b} exec={e}")
    print(f"warm-min ckpt={min(ta):.2f}s nockpt={min(tb):.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
