"""JDBC sink (SURVEY.md §2.1 sink_jdbc; BASELINE.json:7 "JDBC write to
Postgres from DataFrame").

Reference behavior [PK]: bulk COPY into per-vintage Postgres schemas
with DROP/CREATE overwrite semantics. Spark-first: partitioned parallel
``df.write.jdbc`` — each partition opens its own connection and batches
inserts, so write throughput scales with executors, the analog of the
reference's COPY boundary (SURVEY.md §3.2).

INTEGRATION-FLAGGED: the harness has no Postgres and no JDBC driver
jar, so this module is exercised by config-construction tests only
(SURVEY.md §7 hard-part f); t2 correctness never depends on it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcTarget:
    url: str  # e.g. jdbc:postgresql://host:5432/census
    table: str  # e.g. acs2014_5yr.b01001
    user: str
    password: str
    batch_size: int = 10_000
    num_partitions: int = 8  # parallel writer connections
    isolation_level: str = "READ_COMMITTED"


def writer_for(df: DataFrame, target: JdbcTarget, mode: str = "overwrite"):
    """Build (not execute) the JDBC DataFrameWriter for `target`.

    `overwrite` + truncate=true reproduces the reference's
    DROP/CREATE-ish reload without losing grants/indexes; numPartitions
    bounds parallel connections so a 1000-executor cluster doesn't open
    1000 sessions against one Postgres.
    """
    return (
        df.repartition(target.num_partitions)
        .write.format("jdbc")
        .mode(mode)
        .option("url", target.url)
        .option("dbtable", target.table)
        .option("user", target.user)
        .option("password", target.password)
        .option("batchsize", str(target.batch_size))
        .option("truncate", "true")
        .option("isolationLevel", target.isolation_level)
    )


def write_jdbc(df: DataFrame, target: JdbcTarget, mode: str = "overwrite") -> None:
    """Execute the bulk load (requires a reachable Postgres + driver jar)."""
    writer_for(df, target, mode).save()
