"""Parquet table loaders for the driver-generated corpus (TESTDATA.md).

Reference parity: ukis_kafka's vector-file scan (SURVEY.md §2.1 R1)
iterates OGR features one-by-one in Python; here a scan is a Spark
DataSource read — columnar, vectorized, with predicate pushdown and
column pruning handled by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    downstream operators push down into the scan.

    ``events.ts`` is nanosecond-precision in the file; Spark has no ns
    timestamps, so it is read as a long (``nanosAsLong``, set in
    registry._tune / plans.session) and floored to a µs timestamp here.
    Oracle-checked queries must still truncate to ≥ seconds before
    emitting it (DuckDB keeps the nanos)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
