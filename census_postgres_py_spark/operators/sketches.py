"""Mergeable quantile sketch (t-digest) — SURVEY.md §2.4 extension.

`agg_percentile` covers Spark's built-in `percentile_approx` (itself a
mergeable KLL-ish sketch). This module implements the *custom-sketch*
pattern the built-ins can't express: a t-digest whose PARTIALS are
first-class rows — an ingest job can persist per-partition digests and
any later query answers quantiles by MERGING stored digests, never
rescanning raw data. That partial/merge split is the whole point at
100 TB: the second phase's input is |groups| × |salts| × δ centroid
rows, independent of the raw row count.

Both phases are Arrow-batched `applyInPandas` (numpy inside); nothing
row-at-a-time, no driver-side collect. Determinism: the salt is a
deterministic hash, centroids are sorted by (mean, weight) before every
compression pass, and the scale-function merge is order-free given that
sort — re-runs produce bit-identical digests (SURVEY.md §2.11 bar).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

DELTA = 100  # t-digest compression: ~2·δ centroids per digest
N_SALTS = 16  # phase-1 parallelism per group

_CENTROID_SCHEMA = "event_type string, mean double, weight double"


def _k(q: float, delta: int) -> float:
    """t-digest k1 scale function: concentrates centroid resolution at
    the tails (q→0, q→1), where quantile queries need it."""
    return (delta / (2 * math.pi)) * math.asin(2 * q - 1)


def _compress(means, weights, delta: int):
    """Merge sorted centroids so no cluster spans more than one unit of
    k-scale. Classic merging-t-digest pass (Dunning's algorithm), O(n)
    over centroids already sorted by mean."""
    import numpy as np

    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    emitted = 0.0
    q_limit_k = _k(0.0, delta) + 1.0
    for m, w in zip(means[1:], weights[1:]):
        q_new = (emitted + cur_w + float(w)) / total
        if q_new <= 1.0 and _k(q_new, delta) <= q_limit_k:
            # merge into current cluster (weighted mean)
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            emitted += cur_w
            q_limit_k = _k(min(emitted / total, 1.0), delta) + 1.0
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(means, weights, q: float) -> float:
    """Estimate the q-quantile from a digest: linear interpolation
    between adjacent centroid means at cumulative-weight centers."""
    import numpy as np

    total = float(weights.sum())
    centers = np.cumsum(weights) - weights / 2.0
    target = q * total
    if target <= centers[0]:
        return float(means[0])
    if target >= centers[-1]:
        return float(means[-1])
    i = int(np.searchsorted(centers, target)) - 1
    span = centers[i + 1] - centers[i]
    frac = 0.0 if span <= 0 else (target - centers[i]) / span
    return float(means[i] + frac * (means[i + 1] - means[i]))


@register("agg_tdigest")  # sketch estimate => rows-only check
def agg_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of `events.value` per event_type from a two-phase
    mergeable t-digest: phase 1 builds one digest per (event_type,
    salt) partial — 16-way parallel per group, each seeing ~1/16 of
    the rows; phase 2 merges the partial digests per group and reads
    p50/p95 off the merged digest.

    tests/test_sketches.py pins the estimates against the exact
    quantiles (within 2% of the value range) and re-runs for
    determinism; the estimate is approximate, so no SQL oracle (same
    policy as agg_percentile / agg_hll_mergeable).
    """
    import numpy as np
    import pandas as pd

    delta = DELTA

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf["value"].to_numpy(dtype=float))
        m, w = _compress(v, np.ones_like(v), delta)
        return pd.DataFrame(
            {"event_type": pdf["event_type"].iloc[0], "mean": m, "weight": w}
        )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["mean", "weight"], kind="mergesort")
        m, w = _compress(
            pdf["mean"].to_numpy(dtype=float),
            pdf["weight"].to_numpy(dtype=float),
            delta,
        )
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [float(w.sum())],
                "p50": [round(_quantile(m, w, 0.50), 4)],
                "p95": [round(_quantile(m, w, 0.95), 4)],
            }
        )

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).alias("salt"),
    )
    # pin both grouping exchanges' parallelism: the (type, salt) keys
    # are byte-compact, so AQE otherwise coalesces to one partition
    # and all ~80 partial digests build serially in a single task
    # (the single-task disease, BASELINE.md r6 continuation); user
    # repartitions on the group keys are exempt and add no second
    # exchange
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    partials = (
        ev.repartition(npart, "event_type", "salt")
        .groupBy("event_type", "salt")
        .applyInPandas(partial, _CENTROID_SCHEMA)
    )
    return (
        partials.repartition(npart, "event_type")
        .groupBy("event_type")
        .applyInPandas(merge, "event_type string, n double, p50 double, p95 double")
        .select("event_type", F.col("n").cast("long").alias("n"), "p50", "p95")
    )
