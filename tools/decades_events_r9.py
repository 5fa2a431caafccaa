"""Two-decade (100x events) scaling rows for the events-analytics
family — r9 continuation.

Protocol identical to tools/decades_r9.py: local[32], noop sink, one
warm JVM; 1x = warm min of --reps runs on /tmp/stress_events1 (100k
events), 100x = single run on /tmp/stress_events100 (10M events, both
from gen_stress --events-only). Every id here reads ONLY the events
table (verified by the ast dependency walk in the session log), so the
events-only corpus is a complete fixture for them.

Usage: python tools/decades_events_r9.py [--ids a,b,...] [--mem 16g]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: heaviest bench members + one representative per plan shape:
#: grid-explode resample, as-of/nearest time joins, cohort pivot,
#: sequence aggs (markov/path), rolling-distinct window, attribution
#: window, changepoint scan, daily STL-ish decompose, pandas-UDF
#: grouped map, and the t-digest sketch.
DEFAULT_IDS = (
    "ts_resample_fill,join_asof,join_nearest_event,agg_retention_cohort,"
    "win_attribution_last_touch,agg_markov_transitions,agg_path_signatures,"
    "agg_rolling_active_users,ts_cusum_changepoint,ts_decompose_daily,"
    "udf_grouped_map,agg_tdigest"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--mem", default="16g")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ids", default=DEFAULT_IDS)
    ap.add_argument("--d1", default="/tmp/stress_events1")
    ap.add_argument("--d100", default="/tmp/stress_events100")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("decades-events-r9")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    qs = registry.all_queries()
    results: dict[str, dict] = {}
    for name in args.ids.split(","):
        q = qs[name]
        q(spark, args.d1).write.mode("overwrite").format("noop").save()
        t1 = []
        for _ in range(args.reps):
            t0 = time.time()
            q(spark, args.d1).write.mode("overwrite").format("noop").save()
            t1.append(time.time() - t0)
        t0 = time.time()
        q(spark, args.d100).write.mode("overwrite").format("noop").save()
        t100 = time.time() - t0
        n100 = q(spark, args.d100).count()
        results[name] = {
            "t1": round(min(t1), 2), "t100": round(t100, 2),
            "ratio": round(t100 / min(t1), 1), "rows100": n100,
            "mem": args.mem,
        }
        print(f"{name}: 1x {min(t1):.2f}s  100x {t100:.2f}s  "
              f"ratio {t100 / min(t1):.1f}x  rows100 {n100}", flush=True)
    print("RESULTS " + json.dumps(results))


if __name__ == "__main__":
    main()
