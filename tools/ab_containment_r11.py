"""Interleaved same-JVM A/B: dedup_containment r11-fix vs the r9 tree.

r10 VERDICT item 1 measured a real ~1.6x fixture-scale regression
(1.87 -> 2.98 s warm-min at sf0.1) from the unified vote-count
candidate stage. The r11 fix restores the literal r9 candidate tail
when the scale gate is closed. This script reproduces the judge's
protocol: one JVM, both trees imported in turn (module-cache swap),
interleaved reps, warm-min of 3 reported per leg.

Usage: python tools/ab_containment_r11.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

R9_TREE = "/tmp/r9tree"
R11_TREE = "/root/repo"


def load_containment(tree: str):
    for m in [k for k in list(sys.modules) if k.startswith("census_postgres_py_spark")]:
        del sys.modules[m]
    sys.path.insert(0, tree)
    try:
        from census_postgres_py_spark.operators import dedup as d
    finally:
        sys.path.pop(0)
    assert d.__file__.startswith(tree), d.__file__
    return d.dedup_containment


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .appName("ab_containment_r11")
        .getOrCreate()
    )
    legs = {
        "r9": load_containment(R9_TREE),
        "r11": load_containment(R11_TREE),
    }
    # one untimed warmup per leg, then 3 interleaved timed reps
    times: dict[str, list[float]] = {k: [] for k in legs}
    outputs: dict[str, set] = {}
    for name, fn in legs.items():
        outputs[name] = set(map(tuple, fn(spark, sf_dir).collect()))
    assert outputs["r9"] == outputs["r11"], "output mismatch between legs!"
    for rep in range(3):
        for name, fn in legs.items():
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            times[name].append(time.monotonic() - t0)
    for name in legs:
        reps = ", ".join(f"{x:.2f}" for x in times[name])
        print(f"{name}: warm-min {min(times[name]):.2f} s  (reps: {reps})")
    print(f"rows: {len(outputs['r9'])} (identical across legs)")
    spark.stop()


if __name__ == "__main__":
    main()
