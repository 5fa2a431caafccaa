"""Stage-level profile of dedup_tfidf_cosine on the Heaps 100x corpus
(r8 VERDICT item 2: find where the ~2.7x-over-output-growth cost goes —
candidates: the shuffled dfreq/maxw joins, the pair-scale groupBy, or
the survivor re-dot). Runs the op once with a noop sink, then pulls
per-stage executorRunTime / shuffle bytes from the local UI REST API.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/stress_heaps_100x")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--mem", default="16g")
    ap.add_argument("--id", default="dedup_tfidf_cosine")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.session.timeZone", "UTC")
        .appName("profile-tfidf")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    fn = registry.all_queries()[args.id]
    t0 = time.time()
    fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"{args.id} @ {args.sf_dir}: wall {wall:.1f}s")

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: -s["executorRunTime"])
    total_rt = sum(s["executorRunTime"] for s in done)
    print(f"{len(done)} stages, total executorRunTime {total_rt/1000:.1f}s "
          f"(core-seconds)")
    for s in done[: args.top]:
        name = s["name"].split("\n")[0][:80]
        print(
            f"  stage {s['stageId']:>3} rt={s['executorRunTime']/1000:7.1f}s "
            f"tasks={s['numCompleteTasks']:>3} "
            f"in={s['inputBytes']/1e6:8.1f}MB "
            f"sr={s['shuffleReadBytes']/1e6:8.1f}MB "
            f"sw={s['shuffleWriteBytes']/1e6:8.1f}MB "
            f"spill={s['diskBytesSpilled']/1e6:8.1f}MB  {name}"
        )

    # SQL node metrics: row counts through the plan (joins, aggs) so
    # candidate/survivor cardinalities are read off ONE run
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/sql?details=true&planDescription=false&length=50"
    ) as r:
        sqls = json.load(r)
    sqls.sort(key=lambda q: -(q.get("duration") or 0))
    for q in sqls:
        if (q.get("duration") or 0) < 500:
            continue
        print(f"\nSQL exec {q['id']} ({q['duration']/1000:.1f}s) node rows:")
        for node in q.get("nodes", []):
            mets = {
                m["name"]: m["value"] for m in node.get("metrics", [])
            }
            rows = mets.get("number of output rows")
            if rows is None:
                continue
            print(f"  node {node['nodeId']:>3} {node['nodeName'][:45]:45} "
                  f"out={rows:>15}")
    spark.stop()


if __name__ == "__main__":
    main()
