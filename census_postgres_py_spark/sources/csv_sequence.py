"""ACS sequence-file-style CSV reader (SURVEY.md §2.1 scan_csv_schema).

Reference behavior [PK]: sequence files are headerless, comma-delimited,
with '.'-coded jam values for suppressed cells that must load as NULL,
and a schema known only from the lookup metadata — never inferred.

Spark-first: `spark.read.csv` with an explicit StructType and
``nullValue='.'``. Explicit schemas matter doubly at scale: inference
costs a full extra pass over 100 TB and can mistype jam-value columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_sequence_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    null_value: str = ".",
) -> DataFrame:
    """Read a headerless CSV with explicit schema and jam-value NULLs."""
    return (
        spark.read.schema(schema)
        .option("header", "false")
        .option("nullValue", null_value)  # empty cells are NULL by default too
        .csv(path)
    )


def write_sequence_csv(df: DataFrame, path: str, null_value: str = ".") -> None:
    """Write a DataFrame as a headerless, jam-value-coded CSV (the
    inverse, used for round-trip tests)."""
    df.write.mode("overwrite").option("header", "false").option(
        "nullValue", null_value
    ).csv(path)
