"""Round-9 two-decade (100x) re-measures (r8 VERDICT items 2/3/6/7).

Protocol identical to tools/decades_r8.py / graph_decades_r7.log:
local[32], noop sink, one warm JVM session; 1x = warm min of --reps
runs, 100x = single run. Driver/executor heap is a FLAG this round
because the point of the triangle re-measure is the int32-adjacency
heap claim (r8 needed 64g; target <=32g).

Corpora (regenerable, see BASELINE.md):
  * /tmp/stress_heaps_1x + _100x        (gen_stress heaps docs)
  * /tmp/stress_graph1 + _graph100      (gen_stress --graph-only, uniform)
  * /tmp/stress_zipf1 + _zipf100        (gen_stress --graph-only --zipf 1.1)
  * /tmp/stress_events1 + _events100    (gen_stress --events-only)
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
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--mem", default="32g")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--ids",
        default="dedup_tfidf_cosine,join_complement_rank_zipf,"
        "join_complement_rank,graph_triangle_count",
        help="comma-separated run keys (see RUNS in source)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.session.timeZone", "UTC")
        .appName("decades-r9")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    qs = registry.all_queries()

    def _topk_batch_twin(spark, sf_dir):
        # exact batch twin of stream_windowed_topk (hourly tumbling
        # count per event_type, per-window top-3) — the registry is
        # frozen at 355 ids, so the twin lives here, not in queries()
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from census_postgres_py_spark.tables import t

        ev = t(spark, sf_dir, "events")
        hour = (F.unix_millis("ts") / 3600000).cast("long") * 3600000
        counts = (
            ev.groupBy(hour.alias("hour_ms"), "event_type")
            .agg(F.count("*").cast("long").alias("n"))
        )
        w = Window.partitionBy("hour_ms").orderBy(
            F.col("n").desc(), F.col("event_type")
        )
        return (
            counts.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= 3)
        )

    def _uncapped_docs(spark, sf_dir):
        # same seam as tools/stress_bench.py: lift the oracle-sized
        # doc_id < 200 cap so the dedup family processes the FULL
        # corpus; repartition because the synthetic corpus is one file
        from census_postgres_py_spark.tables import t

        return (
            t(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism)
        )

    def _uncapped(name):
        def run(spark, sf_dir):
            from census_postgres_py_spark.operators import dedup

            orig = dedup._with_dups
            dedup._with_dups = _uncapped_docs
            try:
                return qs[name](spark, sf_dir)
            finally:
                dedup._with_dups = orig

        return run

    def _cc_pipeline(spark, sf_dir):
        # the composed dedup lifecycle (candidates -> exact verify ->
        # CC -> survivor per cluster) uncapped — same dataflow
        # stress_bench measures at 10x, pushed to the second decade
        import stress_bench

        return stress_bench._cc_pipeline_uncapped(spark, sf_dir)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    qs = dict(qs)
    qs["_topk_batch_twin"] = _topk_batch_twin
    qs["_cc_pipeline"] = _cc_pipeline
    for _dd in (
        "dedup_ngram_jaccard",
        "dedup_containment",
        "dedup_simhash",
        "dedup_minhash",
    ):
        qs[f"{_dd}_uncapped"] = _uncapped(_dd)
    RUNS = {
        "dedup_tfidf_cosine": (
            "dedup_tfidf_cosine", "/tmp/stress_heaps_1x",
            "/tmp/stress_heaps_100x",
        ),
        "join_complement_rank_zipf": (
            "join_complement_rank", "/tmp/stress_zipf1",
            "/tmp/stress_zipf100",
        ),
        "join_complement_rank": (
            "join_complement_rank", "/tmp/stress_graph1",
            "/tmp/stress_graph100",
        ),
        "graph_triangle_count": (
            "graph_triangle_count", "/tmp/stress_graph1",
            "/tmp/stress_graph100",
        ),
        "dedup_tfidf_cosine_web": (
            # |V| = 200·√n (gen_stress --webdocs-only): the corpus that
            # exercises the PREFIX+BOUND plan at scale (head-sample
            # vocab 4.8k/7.7k >> the 2048 small-vocab gate)
            "dedup_tfidf_cosine", "/tmp/stress_web_1x",
            "/tmp/stress_web_100x",
        ),
        # r9 continuation: the remaining shingle-dedup family, uncapped
        # (full corpus via the _with_dups seam), on BOTH corpus shapes.
        # Web vocabulary (|V|=200*sqrt(n), shingles mostly unique — the
        # shape shingle dedup is deployed on): full two decades. 40-word
        # hub vocabulary (every shingle hot; candidate floor ~n²/|V|):
        # ONE decade — at 100x the pair-candidate set itself is ~1e9
        # rows and the exact verify's array shuffle (~1 KB/candidate)
        # needs ~1 TB of shuffle spill, which a 1000-executor cluster
        # absorbs at ~1 GB/node but this box's /tmp cannot (measured:
        # ENOSPC at 80 GB free — same disk-not-heap bound class as the
        # triangle 16 g note in BASELINE.md).
        "dedup_ngram_jaccard_hub10": (
            "dedup_ngram_jaccard_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_10x",
        ),
        "dedup_ngram_jaccard_web": (
            "dedup_ngram_jaccard_uncapped", "/tmp/stress_web_1x",
            "/tmp/stress_web_100x",
        ),
        "dedup_containment_hub10": (
            "dedup_containment_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_10x",
        ),
        "dedup_containment_web": (
            "dedup_containment_uncapped", "/tmp/stress_web_1x",
            "/tmp/stress_web_100x",
        ),
        "dedup_simhash_hub100": (
            # simhash ships 8-byte fingerprints, not arrays — the 100x
            # hub corpus is in reach for it (collision cost is banding,
            # not shingle df)
            "dedup_simhash_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_100x",
        ),
        "dedup_simhash_web": (
            "dedup_simhash_uncapped", "/tmp/stress_web_1x",
            "/tmp/stress_web_100x",
        ),
        "pipeline_dedup_cc_web": (
            "_cc_pipeline", "/tmp/stress_web_1x", "/tmp/stress_web_100x",
        ),
        "dedup_minhash_hub100": (
            # re-measure of the r6 row (345.3 s) under _shared_shingled
            "dedup_minhash_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_100x",
        ),
        "win_sessionize": (
            "win_sessionize", "/tmp/stress_events1",
            "/tmp/stress_events100",
        ),
        "stream_tumbling": (
            "stream_tumbling", "/tmp/stress_events1",
            "/tmp/stress_events100",
        ),
        "windowed_topk_batch_twin": (
            "_topk_batch_twin", "/tmp/stress_events1",
            "/tmp/stress_events100",
        ),
    }
    results: dict[str, dict] = {}
    for key in args.ids.split(","):
        name, d1, d100 = RUNS[key]
        qs[name](spark, d1).write.mode("overwrite").format("noop").save()
        t1 = []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, d1).write.mode("overwrite").format("noop").save()
            t1.append(time.time() - t0)
        t0 = time.time()
        qs[name](spark, d100).write.mode("overwrite").format("noop").save()
        t100 = time.time() - t0
        n100 = qs[name](spark, d100).count()
        results[key] = {
            "op": name, "t1": round(min(t1), 2), "t100": round(t100, 2),
            "ratio": round(t100 / min(t1), 1), "rows100": n100,
            "mem": args.mem,
        }
        print(f"{key}: 1x {min(t1):.2f}s  100x {t100:.2f}s  "
              f"ratio {t100 / min(t1):.1f}x  rows100 {n100}", flush=True)
    print("RESULTS " + json.dumps(results))


if __name__ == "__main__":
    main()
