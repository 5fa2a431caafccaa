"""Interleaved A/B for the r13 join_bipartite_projection packed-key
groupBy (one long key vs two): same JVM, alternating legs, warm-min of
--reps. The unpacked leg forces the fallback by patching _key_bounds
to None (stats-absent behavior)."""
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
    ap.add_argument("--mem", default="8g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("ab-bipartite")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from census_postgres_py_spark import registry
    from census_postgres_py_spark.operators import ext_round4n

    fn = registry.all_queries()["join_bipartite_projection"]
    real = ext_round4n._key_bounds

    def run(packed: bool) -> float:
        ext_round4n._key_bounds = real if packed else (lambda *a, **k: None)
        try:
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            return time.perf_counter() - t0
        finally:
            ext_round4n._key_bounds = real

    # output identity once
    a = sorted(map(tuple, (lambda: (ext_round4n.__dict__.__setitem__('_key_bounds', real), fn(spark, args.sf_dir).collect())[1])()))
    ext_round4n._key_bounds = lambda *a_, **k: None
    b = sorted(map(tuple, fn(spark, args.sf_dir).collect()))
    ext_round4n._key_bounds = real
    print("outputs:", "IDENTICAL" if a == b else "MISMATCH", len(a), len(b))

    run(True), run(False)  # warm both
    tp, tu = [], []
    for i in range(args.reps):
        d = run(True); tp.append(d)
        e = run(False); tu.append(e)
        print(f"rep {i}: packed={d:6.2f}s unpacked={e:6.2f}s")
    print(f"warm-min packed={min(tp):.2f}s unpacked={min(tu):.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
