"""Two-decade (100x) scaling rows for the remaining heavy non-graph ops
(r7 VERDICT item 7): dedup_tfidf_cosine on a Heaps-law text corpus and
join_complement_rank on the basket-shaped edges-only corpus.

Corpora (regenerable in seconds/minutes, see BASELINE.md):
  * /tmp/stress_heaps_1x   (5k docs)  + /tmp/stress_heaps_100x (500k docs)
    - gen_stress.gen_documents_heaps: vocabulary grows ~1.8*sqrt(n)
      (Heaps' law) with Zipf-1.05 frequencies, 3% near-dup rate — the
      realistic web-corpus shape where near-dup density is linear, so a
      linear-candidate claim is testable (the driver fixture's fixed
      40-word vocab makes the TRUE answer Theta(n^2) there).
  * /tmp/stress_graph1 + /tmp/stress_graph100
    - gen_stress --graph-only: empirical basket-size histogram, part
      key space grown with the data so per-part degree stays constant
      (the real TPC-H scale-up shape). join_complement_rank reads only
      lineitem(l_orderkey, l_partkey) from it.

Protocol matches tools/graph_decades_r7.log: local[32], noop sink, one
warm JVM session; 1x = warm min of --reps runs, 100x = single run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--heaps1", default="/tmp/stress_heaps_1x")
    ap.add_argument("--heaps100", default="/tmp/stress_heaps_100x")
    ap.add_argument("--graph1", default="/tmp/stress_graph1")
    ap.add_argument("--graph100", default="/tmp/stress_graph100")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("decades-r8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    qs = registry.all_queries()
    runs = [
        ("dedup_tfidf_cosine", args.heaps1, args.heaps100),
        ("join_complement_rank", args.graph1, args.graph100),
    ]
    results: dict[str, tuple[float, float, float]] = {}
    for name, d1, d100 in runs:
        # warm pass (JVM/Arrow first-touch) then timed warm minima at 1x
        qs[name](spark, d1).write.mode("overwrite").format("noop").save()
        t1 = []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, d1).write.mode("overwrite").format("noop").save()
            t1.append(time.time() - t0)
        t0 = time.time()
        qs[name](spark, d100).write.mode("overwrite").format("noop").save()
        t100 = time.time() - t0
        results[name] = (min(t1), t100, t100 / min(t1))
        print(
            f"{name}: 1x {min(t1):.2f}s  100x {t100:.2f}s  "
            f"ratio {t100 / min(t1):.1f}x",
            flush=True,
        )
    print("RESULTS " + json.dumps(results))


if __name__ == "__main__":
    main()
