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

    ``events.parquet`` stores ``ts`` as parquet INT64 TIMESTAMP(NANOS),
    which Spark 4.x rejects at read time (PARQUET_TYPE_ILLEGAL). We read
    it as a raw nanosecond long via ``nanosAsLong`` and rebuild a
    microsecond timestamp — DuckDB (the oracle) reads the same file at
    microsecond precision, so ``ts div 1000`` keeps both sides exactly
    equal. The conf is set here, not only in session.py, because the
    driver supplies its own SparkSession.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
