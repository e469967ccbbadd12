"""Parquet table loaders for the driver-generated corpus (TESTDATA.md).

Reference parity: ukis_kafka's vector-file scan (SURVEY.md §2.1 R1)
iterates OGR features one-by-one in Python; here a scan is a Spark
DataSource read — columnar, vectorized, with predicate pushdown and
column pruning handled by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Plain ``spark.read.parquet`` so that scans
    stay in the vectorized parquet reader and filters/projections from
    downstream operators push down into the scan."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
