"""Plan-discipline sweep: physical-plan lint for EVERY registered
operator (the 100 TB criterion, mechanized).

For each id in ``queries()`` build the DataFrame at the given sf and
lint its formatted physical plan:

* ``CartesianProduct`` — never acceptable (an unkeyed all-pairs join
  would be quadratic at scale);
* ``BroadcastNestedLoopJoin`` — acceptable ONLY on the allowlist below
  (documented broadcast-of-tiny-frame cross joins: totals rows, probe
  vectors, calibration grids);
* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan; the
  package bans these (Arrow paths show as ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas and are allowed).

Writes one line per operator and a final TOTAL line; exits non-zero on
any violation. Note ids whose builder is eager (CC loops, sinks) do
real work before returning — run time is comparable to a selfcheck
pass, so this is a per-round tool, not a pytest.

Usage: python tools/plan_sweep.py [--sf-dir /root/testdata/sf0.001] [ids...]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Documented tiny-frame broadcast cross joins (judge-audited r4): each
# broadcasts a 1-5 row totals/grid/probe frame, which Spark plans as
# BroadcastNestedLoopJoin. Anything NOT listed here that plans a BNLJ
# is a regression.
BNLJ_ALLOWED = {
    "agg_ab_lift",
    "agg_basket_lift",
    "agg_chi2_independence",
    "agg_cooccurrence",
    "agg_entropy",
    "agg_gini",
    "agg_markov_transitions",
    "agg_overlap_matrix",
    "agg_pareto_crosspoint",
    "agg_share_of_total",
    "dq_benford_digit",
    "dq_benford_second_digit",
    "dq_partition_drift",
    "emb_label_confusion",
    "join_complement_rank",
    "join_similarity_topk",
    "mm_phash_dedup",
    "text_ngram_topk",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("ids", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    ids = args.ids or sorted(qs)
    bad = 0
    for qid in ids:
        try:
            df = qs[qid](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:
            print(f"{qid}: ERROR building plan")
            traceback.print_exc()
            bad += 1
            continue
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            problems.append("BatchEvalPython")
        if "BroadcastNestedLoopJoin" in plan and qid not in BNLJ_ALLOWED:
            problems.append("BroadcastNestedLoopJoin(unlisted)")
        if problems:
            print(f"{qid}: VIOLATION {','.join(problems)}")
            bad += 1
        else:
            print(f"{qid}: ok", flush=True)
    print(f"TOTAL: {len(ids) - bad} clean, {bad} violations / {len(ids)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
