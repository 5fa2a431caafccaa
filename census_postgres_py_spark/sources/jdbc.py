"""JDBC sink (SURVEY.md §2.1 sink_jdbc; BASELINE.json:7 "JDBC write to
Postgres from DataFrame").

Reference behavior [PK]: bulk COPY into per-vintage Postgres schemas
with DROP/CREATE overwrite semantics. Spark-first: partitioned parallel
``df.write.jdbc`` — each partition opens its own connection and batches
inserts, so write throughput scales with executors, the analog of the
reference's COPY boundary (SURVEY.md §3.2).

The harness has no Postgres, but Spark ships Apache Derby (the Hive
metastore's embedded database) with a real JDBC driver — so the
default executable target here is an embedded-Derby database on local
disk: every byte still travels the same ``df.write.jdbc`` partitioned
INSERT path a Postgres load would take. Point ``url``/``driver`` at
Postgres for the production load; only the dialect changes.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcTarget:
    url: str  # e.g. jdbc:postgresql://host:5432/census
    table: str  # e.g. acs2014_5yr.b01001
    user: str
    password: str
    batch_size: int = 10_000
    num_partitions: int = 8  # parallel writer connections
    isolation_level: str = "READ_COMMITTED"
    driver: str | None = None  # explicit JDBC driver class, if needed


#: Derby's PUBLIC embedded driver class (derbytools jar, on Spark's
#: classpath by default for the Hive metastore). The internal
#: org.apache.derby.iapi.jdbc.AutoloadedDriver also works on the
#: bundled 10.16 but is not a supported entry point.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


_DERBY_DIR: str | None = None


def _process_derby_dir() -> str:
    """One mkdtemp per PROCESS (lazy singleton): Derby embedded locks a
    database per JVM, so concurrent sessions (pytest vs driver) must
    not share one — but repeated calls within one long-lived driver
    must REUSE one, or temp databases accumulate until process exit.
    The atexit hook shuts the database down through the engine first
    (releasing db.lck while the JVM is still up; Derby reports clean
    shutdown via SQLException 08006, hence the bare except) so the
    rmtree isn't racing a booted engine."""
    global _DERBY_DIR
    if _DERBY_DIR is None:
        d = tempfile.mkdtemp(prefix="spark_graft_derby_")

        def _cleanup(path: str = d) -> None:
            try:
                from pyspark import SparkContext

                sc = SparkContext._active_spark_context
                if sc is not None:
                    sc._jvm.java.sql.DriverManager.getConnection(
                        f"jdbc:derby:{path}/db;shutdown=true"
                    )
            except Exception:
                pass
            shutil.rmtree(path, ignore_errors=True)

        atexit.register(_cleanup)
        _DERBY_DIR = d
    return _DERBY_DIR


def derby_target(
    table: str, db_dir: str | None = None, num_partitions: int = 4
) -> JdbcTarget:
    """An embedded-Derby target on local disk.

    The default db path is one mkdtemp per process (see
    :func:`_process_derby_dir`) — unique across concurrent processes,
    reused across calls within one, engine-shutdown-then-rmtree at
    exit. A pid-derived fixed path would be wrong: a dead process's
    reused pid could silently attach to its stale database. Parallel
    partition writers are fine — they're connections within the same
    JVM.
    """
    if db_dir is None:
        db_dir = _process_derby_dir()
    return JdbcTarget(
        url=f"jdbc:derby:{db_dir}/db;create=true",
        table=table,
        user="app",
        password="",
        num_partitions=num_partitions,
        driver=DERBY_DRIVER,
    )


def read_jdbc(spark: SparkSession, target: JdbcTarget) -> DataFrame:
    """Read ``target.table`` back through JDBC (round-trip check)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", target.url)
        .option("dbtable", target.table)
        .option("user", target.user)
        .option("password", target.password)
    )
    if target.driver:
        reader = reader.option("driver", target.driver)
    return reader.load()


def writer_for(df: DataFrame, target: JdbcTarget, mode: str = "overwrite"):
    """Build (not execute) the JDBC DataFrameWriter for `target`.

    `overwrite` + truncate=true reproduces the reference's
    DROP/CREATE-ish reload without losing grants/indexes; numPartitions
    bounds parallel connections so a 1000-executor cluster doesn't open
    1000 sessions against one Postgres.
    """
    writer = (
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
    if target.driver:
        writer = writer.option("driver", target.driver)
    return writer


def write_jdbc(df: DataFrame, target: JdbcTarget, mode: str = "overwrite") -> None:
    """Execute the bulk load (requires a reachable Postgres + driver jar)."""
    writer_for(df, target, mode).save()
