"""Event-time windowing — batch forms (SURVEY.md §2.8).

`window()` / `session_window()` produce IDENTICAL results on batch and
streaming inputs (same Catalyst expressions), so the batch forms here
are the oracle-checkable half; `streaming/` runs the same aggregations
through real `readStream` micro-batches and the tests assert
batch==stream equivalence (SURVEY.md §5.2 item 5).

Timestamp parity notes: events.ts is ns in parquet; Spark truncates to
µs and so does DuckDB's TIMESTAMP, so epoch-ms exports match exactly.
Session-gap comparisons are done in µs on BOTH sides (registry notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

HOUR_MS = 3_600_000
SLIDE_MS = 900_000  # 15 minutes
GAP_US = 1_800_000_000  # 30-minute session gap, microseconds


@register(
    "stream_tumbling",
    oracle=f"""
    SELECT (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS hour_ms,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 1-hour tumbling windows (epoch-aligned, like Spark's
    window()); hourly event count + value sum."""
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("hour_ms"), "n", "total_value"
        )
    )


@register(
    "stream_sliding",
    oracle=f"""
    SELECT ((epoch_ms(ts) // {SLIDE_MS}) - k) * {SLIDE_MS} AS win_ms,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes — each event lands in 4
    overlapping windows (the oracle reproduces Spark's epoch-aligned
    window starts by fanning each event out over k=0..3 slides)."""
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.unix_millis(F.col("w.start")).alias("win_ms"), "n", "total_value")
    )


@register(
    "stream_session",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts) >= {GAP_US}
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ), per_session AS (
        SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n_events,
               (max(us) - min(us)) // 1000 AS span_ms
        FROM sessions GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(span_ms) AS BIGINT) AS total_span_ms
    FROM per_session GROUP BY user_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: session_window(ts, 30 min) per user,
    rolled up to per-user session stats. The oracle is the classic
    lag-gap-cumsum idiom, compared in µs to match Spark's native
    session precision exactly."""
    ev = t(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w")).agg(
        F.count("*").alias("n_events"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1000)
        .cast("long")
        .alias("span_ms"),
    )
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("span_ms").cast("long").alias("total_span_ms"),
    )
