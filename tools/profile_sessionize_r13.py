"""Stage-level decomposition of stream_sessionize_state (r12 VERDICT
item 3 groundwork): time the builder (micro-batches + state machinery)
vs the returned-frame noop write (memory-table scan + statestore
read-back + union), and the bare statestore read alone."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("prof-sessionize")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from census_postgres_py_spark import registry

    fn = registry.all_queries()["stream_sessionize_state"]
    sf_dir = "/root/testdata/sf0.1"
    for rep in range(4):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        print(
            f"rep {rep}: build={t1-t0:6.2f}s exec={t2-t1:6.2f}s "
            f"total={t2-t0:6.2f}s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
