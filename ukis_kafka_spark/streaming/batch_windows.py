"""Time-window operators over ``events`` (SURVEY.md §2.2 "Streaming",
batch-expressible subset).

These are the *same expressions* the streaming layer runs under
``readStream`` (see streaming.jobs); in batch mode they are
oracle-checkable. Window starts are emitted as epoch seconds
(BIGINT) — timestamp objects cross the ns(DuckDB)/µs(Spark) precision
boundary, epoch-of-truncated does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashsafe import DEC
from ..registry import query
from ..sources import load_table


@query(
    "q_tumble_1h",
    oracle="""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
       event_type,
       count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
)
def q_tumble_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — ``F.window`` exactly as
    the streaming job uses it."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


@query(
    "q_slide_1h_30m",
    oracle="""
SELECT win_start, count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS value_sum
FROM (
  SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS win_start, value FROM events
  UNION ALL
  SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800 AS win_start, value FROM events
)
GROUP BY win_start
""",
)
def q_slide_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): every event lands in
    two windows; the oracle re-derives them as the two offset grid
    truncations."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(F.unix_timestamp(F.col("w.start")).alias("win_start"), "n", "value_sum")
    )


@query(
    "q_session_30m",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
""",
)
def q_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via Spark's
    native session_window; the oracle is the classic gaps-and-islands
    rewrite. Session starts are second-floored epochs (sub-second
    precision differs between engines; same-user events are ≥8 s apart
    in this corpus, so flooring is lossless for identity)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


@query(
    "q_rollup_time",
    oracle="""
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
       count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS value_sum
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
""",
)
def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: one pass emits hour-level rows,
    their day-level superaggregates, and the grand total (GROUP BY
    ROLLUP over two truncation granularities) — the batch form of a
    continuous aggregate, where coarser levels are maintained from the
    same scan rather than re-aggregated later. Bucket identity is the
    epoch of the truncated timestamp (never a raw ts — the ns/µs
    emission rule); day level rolls up exactly 24 hour buckets, so at
    100 TB this replaces 3 separate jobs with one Expand + aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_start"),
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_start"),
            "value",
        )
        .rollup("day_start", "hour_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
    )
