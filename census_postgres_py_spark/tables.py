"""Test-fixture table access (TESTDATA.md; schemas in FIXTURES.md).

All operator queries load via :func:`t` so predicate pushdown / column
pruning reach the parquet scan — we never materialize or cache fixture
tables driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    """Columnar scan of one fixture table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql ops)."""
    for name in TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
