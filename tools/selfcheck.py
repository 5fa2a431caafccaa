"""Driver-style oracle self-check.

Mimics the harness's t2 gate: for every id in ``queries()``, run the
Spark query AND (when present) the DuckDB ``oracle_sql()`` at the same
scale factor, then compare row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted).

Usage:
    python tools/selfcheck.py [--sf-dir /root/testdata/sf0.01] [ids...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort columns by
    name, normalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, bool, str]:
    """Return (exact, close, detail)."""
    if list(a.columns) != list(b.columns):
        return False, False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, False, f"row count {len(a)} vs {len(b)}"
    exact = True
    close = True
    detail = ""
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                exact = False
                cl = np.isclose(
                    av.fillna(0).to_numpy(), bv.fillna(0).to_numpy(),
                    rtol=1e-9, atol=1e-12,
                ) | both_nan.to_numpy()
                if not cl.all():
                    close = False
                    i = int(np.argmin(cl))
                    detail += f" col {c}: row {i} {av.iloc[i]!r} vs {bv.iloc[i]!r};"
                else:
                    detail += f" col {c}: close-but-not-exact;"
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                exact = False
                close = False
                i = int(np.argmin(eq.to_numpy()))
                detail += f" col {c}: row {i} {av.iloc[i]!r} vs {bv.iloc[i]!r};"
    return exact, close, detail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession like the driver does (no tuned "
        "confs) instead of session.get_spark()",
    )
    ap.add_argument(
        "--perturb",
        action="store_true",
        help="odd core count + prime shuffle-partition count: perturbs "
        "partition merge ORDER to flush out order-dependent float "
        "aggregation that fixed partitioning hides",
    )
    ap.add_argument("ids", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod

    if args.perturb:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[5]")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.default.parallelism", "5")
            .getOrCreate()
        )
    elif args.vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from census_postgres_py_spark.session import get_spark

        spark = get_spark()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ids = args.ids or sorted(qs)

    con = duckdb.connect()
    for name in TABLES:
        # table-subset corpora (e.g. the documents-only web-vocab
        # stress dirs) register only the files they carry — an oracle
        # referencing a missing view fails per-query, as it should
        if not os.path.exists(f"{args.sf_dir}/{name}.parquet"):
            continue
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{name}.parquet')"
        )

    n_pass = n_rows_only = n_mismatch = n_error = 0
    for qid in ids:
        if qid not in qs:
            print(f"{qid}: UNKNOWN id")
            continue
        t0 = time.time()
        try:
            sdf = qs[qid](spark, args.sf_dir).toPandas()
        except Exception:
            n_error += 1
            print(f"{qid}: SPARK ERROR\n{traceback.format_exc(limit=3)}")
            continue
        dt = time.time() - t0
        if qid not in oracles:
            ok = len(sdf) >= 0
            n_rows_only += 1
            print(f"{qid}: rows-only ({len(sdf)} rows) [{dt:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[qid]).df()
        except Exception:
            n_error += 1
            print(f"{qid}: ORACLE ERROR\n{traceback.format_exc(limit=3)}")
            continue
        try:
            a, b = _canon(sdf), _canon(odf)
            exact, close, detail = _values_equal(a, b)
        except Exception:
            n_error += 1
            print(f"{qid}: COMPARE ERROR\n{traceback.format_exc(limit=3)}")
            continue
        if exact:
            n_pass += 1
            print(f"{qid}: PASS ({len(sdf)} rows) [{dt:.1f}s]")
        elif close:
            n_mismatch += 1
            print(f"{qid}: CLOSE-NOT-EXACT ({len(sdf)} rows):{detail} [{dt:.1f}s]")
        else:
            n_mismatch += 1
            print(f"{qid}: MISMATCH:{detail} [{dt:.1f}s]")
    print(
        f"\nTOTAL: {n_pass} pass, {n_rows_only} rows-only, "
        f"{n_mismatch} mismatch, {n_error} error / {len(ids)}"
    )
    return 0 if (n_mismatch == 0 and n_error == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
