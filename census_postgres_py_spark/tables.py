"""Test-fixture table access (TESTDATA.md; schemas in FIXTURES.md).

All operator queries load via :func:`t` so predicate pushdown / column
pruning reach the parquet scan — we never materialize or cache fixture
tables driver-side.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region
# and nation are fixed-size in ACS terms: geographies, not facts).
BROADCAST_DIMS = ("region", "nation")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table.

    Some generations of ``events.parquet`` store ``ts`` as parquet INT64
    TIMESTAMP(NANOS), which Spark 4.x rejects at read time
    (PARQUET_TYPE_ILLEGAL). We read those via ``nanosAsLong`` and rebuild
    a microsecond timestamp — DuckDB (the oracle) reads the same file at
    microsecond precision, so ``ts div 1000`` keeps both sides exactly
    equal. Newer generations store a plain TIMESTAMP(MICROS), which both
    engines read natively — detect by the arrived-at Spark type. The conf
    is set here, not only in session.py, because the driver supplies its
    own SparkSession.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes)["ts"] == "bigint":  # legacy NANOS
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Newer testdata generations write TIMESTAMP(MICROS, isAdjustedToUTC=
    # false), which Spark reads as TIMESTAMP_NTZ. Session tz is UTC
    # (session.py), so casting to TIMESTAMP is epoch-exact, matches how
    # DuckDB (the oracle) reads the same file, and keeps unix_millis()/
    # window()/watermark call sites — which require LTZ — type-valid.
    ntz = [c for c, d in df.dtypes if d == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def approx_rows(
    spark: SparkSession, sf_dir: str, name: str
) -> int:
    """O(1) row count of one fixture table from its parquet footer.

    Shared by every operator that needs a cheap cardinality guard
    (per-row-UDF refusals, broadcast-vs-shuffle gates) so the guard and
    :func:`t`'s scan can never disagree about where the table lives —
    both derive the path from the same ``{sf_dir}/{name}.parquet``
    convention here. Falls back to a full ``count()`` only when the
    footer isn't readable (non-file source, exotic layout); directories
    of part-files sum their footers without scanning data pages.
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
                for root, _, fns in os.walk(path)
                for fn in fns
                if fn.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return t(spark, sf_dir, name).count()


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, names: Iterable[str] | None = None
) -> None:
    """Register fixture tables as temp views (for spark.sql ops).

    Pass ``names`` to register only the tables a query touches —
    registering all ten eagerly forces a schema read of every file
    (and used to fail collaterally on events' NANOS timestamps).
    """
    for name in names if names is not None else TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
