"""Decade (10x/100x) scaling rows for the STREAMING family on the
bursty adversarial corpus — r10 VERDICT item 6 (the graph family got
its zipf twin in r10; streaming ops previously had only the uniform
events fixture).

Corpora from `gen_stress --events-bursty` (hot-hour arrival spikes ~43x
the mean hour + zipf(1.3) users, head user ~26% of all events):
/tmp/stress_events_bursty{1,10,100} = 100k / 1M / 10M events.

Protocol: one warm JVM, local[32], warm min of --reps runs at 1x,
single run per larger scale. Real streaming execution end-to-end
(file feeds + micro-batches + state store), collect() to drive the
memory sinks. stream_stream_join's output is QUADRATIC per burst
(every in-window pair of the same user inside a hot hour), so its
100x leg is skipped by default — the decade table should show the
output-complexity floor, not melt the box proving it.

Usage: python tools/decades_streaming_r11.py [--ids a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_IDS = "stream_sessionize_state,stream_windowed_topk,stream_stream_join"
#: ids whose output grows super-linearly on bursty input — cap their
#: decade sweep at 10x (see module docstring)
SKIP_100X = {"stream_stream_join"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--mem", default="16g")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ids", default=DEFAULT_IDS)
    ap.add_argument("--base", default="/tmp/stress_events_bursty")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", args.mem)
        # the streaming ops return memory-sink tables; at the bursty
        # decades their outputs are tens of millions of rows, which
        # must fit the driver's result-size cap to be measurable
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("decades-streaming-r11")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from census_postgres_py_spark import registry

    qs = registry.all_queries()
    results: dict[str, dict] = {}
    for name in args.ids.split(","):
        q = qs[name]
        d1 = f"{args.base}1"
        q(spark, d1).write.mode("overwrite").format("noop").save()
        t1 = []
        for _ in range(args.reps):
            t0 = time.time()
            q(spark, d1).write.mode("overwrite").format("noop").save()
            t1.append(time.time() - t0)
        row = {"t1": round(min(t1), 2), "mem": args.mem}
        for mult in (10, 100):
            if mult == 100 and name in SKIP_100X:
                row["t100"] = "skipped (quadratic output floor)"
                continue
            d = f"{args.base}{mult}"
            t0 = time.time()
            q(spark, d).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            n = q(spark, d).count()
            row[f"t{mult}"] = round(dt, 2)
            row[f"ratio{mult}"] = round(dt / min(t1), 1)
            row[f"rows{mult}"] = n
        results[name] = row
        print(f"{name}: {row}", flush=True)
    print("RESULTS " + json.dumps(results))


if __name__ == "__main__":
    main()
