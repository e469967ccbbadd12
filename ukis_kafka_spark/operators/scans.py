"""Scan operators (SURVEY.md §2.2 "Scans / sources / sinks").

Reference parity: ukis_kafka's R1 vector-file scan is a per-feature
Python generator; here a scan is Spark's vectorized parquet reader.
``q_scan_pruned`` exists specifically to pin the at-scale contract:
its filter and 2-column projection must reach the reader
(PushedFilters / ReadSchema in explain), so a 100 TB table is read as
row-group-pruned, two-column column chunks — not full rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "q_scan_parquet",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
""",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + projection of the fact table."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "q_scan_pruned",
    oracle="""
SELECT l_orderkey, l_extendedprice
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_quantity < 10
""",
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan: 2-column projection + row-group-prunable predicate.

    Both the predicate and the projection push into the parquet reader
    (verified via explain: PushedFilters [lt(l_shipdate), lt(l_quantity)],
    ReadSchema with 4 columns)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_extendedprice")


@query(
    "q_profile_cardinality",
    oracle="""
SELECT count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS d_orderkey,
       count(DISTINCT l_partkey) AS d_partkey,
       count(DISTINCT l_suppkey) AS d_suppkey,
       count(DISTINCT l_returnflag) AS d_returnflag,
       count(DISTINCT l_shipdate) AS d_shipdate,
       (1000000 * count(DISTINCT l_partkey)) // count(*) AS partkey_uniq_ppm
FROM lineitem
""",
)
def q_profile_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-cardinality profile of the fact table — the first thing
    a query planner, partitioner, or data engineer asks of an unknown
    dataset (which columns are keys, which are categories, which are
    join-explosive).  Five exact COUNT(DISTINCT)s in ONE aggregate:
    Spark expands multi-distinct into a single expand+two-phase
    aggregate rather than five scans, which is the point being
    pinned — at 100 TB this is one pass, and the approx variant
    (q_agg_approx_cd) is the knob when exactness can be traded."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("d_orderkey"),
        F.countDistinct("l_partkey").alias("d_partkey"),
        F.countDistinct("l_suppkey").alias("d_suppkey"),
        F.countDistinct("l_returnflag").alias("d_returnflag"),
        F.countDistinct("l_shipdate").alias("d_shipdate"),
        F.expr("(1000000 * count(DISTINCT l_partkey)) div count(1)").alias(
            "partkey_uniq_ppm"
        ),
    )


@query(
    "q_observe_metrics",
    oracle="""
SELECT count(*) AS n,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_centi_sum,
       max(event_id) AS max_id
FROM events
WHERE event_type = 'click'
""",
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.observe()`` — pipeline metrics collected DURING a job with
    zero extra passes: the filtered scan streams to the (noop) sink
    once, and the observation's aggregates ride the same tasks as
    accumulator-style side output.  This is how a 100 TB ingest audits
    itself (row counts, integer value mass, id high-water mark)
    without re-reading anything; the emitted row is the observed
    metric set itself, re-surfaced through a literal VALUES plan (no
    pickled-RDD createDataFrame), and must hash-match a second-pass
    oracle — proving observe() saw every row exactly once.  Metrics
    are exact integers (centi-unit mass)."""
    from pyspark.sql import Observation

    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    obs = Observation("ingest_audit")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v_centi_sum"),
        F.max("event_id").alias("max_id"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # sum/max observe to NULL on an empty filter result — default them
    # so the generated SQL never contains a bare `None` token (which
    # would fail with an opaque parse error instead of a clean row).
    n, s, mx = m["n"] or 0, m["v_centi_sum"], m["max_id"]
    s = 0 if s is None else s
    mx = -1 if mx is None else mx
    return spark.sql(
        f"SELECT CAST({n} AS BIGINT) AS n, CAST({s} AS BIGINT) AS v_centi_sum,"
        f" CAST({mx} AS BIGINT) AS max_id"
    )
