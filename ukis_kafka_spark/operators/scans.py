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
