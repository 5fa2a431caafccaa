"""Round-10 decade measures (r9 VERDICT items 2/4 + ADVICE).

Protocol identical to tools/decades_r9.py: local[32], noop sink, one
warm JVM; 1x = warm min of --reps runs, big decade = single run. The
headline experiment is the hub-corpus 100x row for the EXACT shingle
ops (dedup_ngram_jaccard / dedup_containment), newly in reach because
the candidate stage now vote-count-filters pairs (shared-prefix >= Q
pigeonhole bound) and the verify ships hashed shingle arrays with a
survivor-only raw rescore — the r9 plan shipped ~1 TB of raw
string-array shuffle there (ENOSPC at 80 GB free).

Corpora (regenerable via tools/gen_stress.py, see BASELINE.md):
  * /tmp/stress_docs_{1x,10x,100x}   fixed 40-word hub vocabulary
  * /tmp/stress_web_{1x,100x}        |V| = 200·sqrt(n) web vocabulary
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
        default="dedup_ngram_jaccard_hub10,dedup_containment_hub10",
        help="comma-separated run keys (see RUNS in source)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.session.timeZone", "UTC")
        .appName("decades-r10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    qs = dict(registry.all_queries())

    def _uncapped_docs(spark, sf_dir):
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

    for _dd in ("dedup_ngram_jaccard", "dedup_containment", "dedup_minhash"):
        qs[f"{_dd}_uncapped"] = _uncapped(_dd)

    RUNS = {
        "dedup_ngram_jaccard_hub10": (
            "dedup_ngram_jaccard_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_10x",
        ),
        "dedup_containment_hub10": (
            "dedup_containment_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_10x",
        ),
        "dedup_ngram_jaccard_hub100": (
            "dedup_ngram_jaccard_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_100x",
        ),
        "dedup_containment_hub100": (
            "dedup_containment_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_100x",
        ),
        "dedup_ngram_jaccard_web": (
            "dedup_ngram_jaccard_uncapped", "/tmp/stress_web_1x",
            "/tmp/stress_web_100x",
        ),
        "dedup_containment_web": (
            "dedup_containment_uncapped", "/tmp/stress_web_1x",
            "/tmp/stress_web_100x",
        ),
        "dedup_minhash_hub100": (
            "dedup_minhash_uncapped", "/tmp/stress_docs_1x",
            "/tmp/stress_docs_100x",
        ),
        # r9 VERDICT item 7: the graph family's second adversarial
        # corpus shape — power-law co-purchase edges (gen_stress
        # --graph-only --zipf 1.1), the one family whose stress corpus
        # was still uniform-ish. Same ops as graph_decades_r7 so the
        # uniform-vs-skewed columns are directly comparable. Zipf(1.1)
        # puts the #1 part in ~half of ALL orders, so triangle MASS
        # (an output/graph property, not a plan property) densifies
        # super-linearly — probe each op at 10x and only run 100x
        # where the 10x row extrapolates to something this box can
        # finish.
    }
    for op in (
        "graph_triangle_count", "graph_degree_hist", "graph_pagerank_iter",
        "join_bipartite_projection", "agg_cooccurrence",
    ):
        short = op.replace("graph_", "").replace("join_", "").replace(
            "agg_", ""
        )
        RUNS[f"{short}_zipf10"] = (op, "/tmp/stress_gz_1x", "/tmp/stress_gz_10x")
        RUNS[f"{short}_zipf100"] = (op, "/tmp/stress_gz_1x", "/tmp/stress_gz_100x")
    results: dict[str, dict] = {}
    for key in args.ids.split(","):
        name, d1, dN = RUNS[key]
        qs[name](spark, d1).write.mode("overwrite").format("noop").save()
        t1 = []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, d1).write.mode("overwrite").format("noop").save()
            t1.append(time.time() - t0)
        t0 = time.time()
        qs[name](spark, dN).write.mode("overwrite").format("noop").save()
        tN = time.time() - t0
        nN = qs[name](spark, dN).count()
        results[key] = {
            "op": name, "t1": round(min(t1), 2), "tN": round(tN, 2),
            "ratio": round(tN / min(t1), 1), "rowsN": nN, "mem": args.mem,
        }
        print(f"{key}: 1x {min(t1):.2f}s  Nx {tN:.2f}s  "
              f"ratio {tN / min(t1):.1f}x  rowsN {nN}", flush=True)
    print("RESULTS " + json.dumps(results))


if __name__ == "__main__" and "--emb-sweep" not in sys.argv:
    main()


def emb_sweep_decades() -> None:
    """r9 VERDICT item 4: emb_dedup_sweep mid-decade row (10x = 20k
    vectors) + tile-size A/B (4096 vs 8192) at 200k vectors, output
    identity pinned across tile sizes."""
    import json
    import time

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("emb-sweep-decades-r10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    q = registry.all_queries()["emb_dedup_sweep"]
    results = {}
    q(spark, "/tmp/stress_emb_1x").write.mode("overwrite").format("noop").save()
    for tag in ("1x", "10x", "100x"):
        d = f"/tmp/stress_emb_{tag}"
        reps = 2 if tag == "1x" else 1
        ts = []
        for _ in range(reps):
            t0 = time.time()
            q(spark, d).write.mode("overwrite").format("noop").save()
            ts.append(time.time() - t0)
        results[tag] = round(min(ts), 2)
        print(f"emb_dedup_sweep {tag}: {min(ts):.2f}s", flush=True)
    # Tile A/B at the full decade: default (8192 as of r10) vs the old
    # 4096 default. The r10 event-log profile showed per-row
    # FlatMapGroupsInPandas machinery (~1 ms/row-instance), not the
    # sims matrix, is the cost driver — fewer/bigger tiles win while
    # the matrix fits. The leg is guarded: a crash IS a measurement
    # (the knob's upper bound).
    base = [tuple(r) for r in q(spark, "/tmp/stress_emb_100x").collect()]
    spark.conf.set("spark.census.embsweep.tileRows", "4096")
    t0 = time.time()
    try:
        q(spark, "/tmp/stress_emb_100x").write.mode("overwrite").format(
            "noop"
        ).save()
        results["100x_tile4096"] = round(time.time() - t0, 2)
        alt = [tuple(r) for r in q(spark, "/tmp/stress_emb_100x").collect()]
        assert sorted(base) == sorted(alt), "tile size changed the output!"
        print(
            f"emb_dedup_sweep 100x tile=4096: "
            f"{results['100x_tile4096']:.2f}s "
            f"(output identical to tile=8192)",
            flush=True,
        )
    except Exception as exc:  # worker OOM/crash is a priced outcome
        results["100x_tile4096"] = f"FAILED after {time.time() - t0:.1f}s"
        print(f"emb_dedup_sweep 100x tile=4096 FAILED: "
              f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
    finally:
        spark.conf.unset("spark.census.embsweep.tileRows")
    print("RESULTS " + json.dumps(results))


if __name__ == "__main__" and "--emb-sweep" in sys.argv:
    emb_sweep_decades()
    sys.exit(0)
