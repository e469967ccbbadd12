"""Custom connector via the PySpark 4 Python DataSource API
(SURVEY.md §2.3 sources) — the modern way to plug an external system
into Spark without JVM code: implement partitions() for parallelism
and read(partition) as a plain row generator, and the engine gets a
fully parallel, schema'd source usable from ``spark.read.format(...)``.

The demo source is a deterministic "remote feed" generator (a stand-in
for a REST/queue connector): N_ROWS keyed records sharded into
N_PARTS independent partitions, each derived from pure modular
arithmetic so the DuckDB oracle can re-derive the exact feed without
the connector. At 100 TB the same shape holds — partitions() returns
one split per remote shard and each task pulls only its shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

N_ROWS = 20_000
N_PARTS = 8
_A = 2654435761
_M = 1_000_003


class _FeedPartition(InputPartition):
    def __init__(self, idx: int):
        self.idx = idx


class _FeedReader(DataSourceReader):
    def partitions(self):
        return [_FeedPartition(i) for i in range(N_PARTS)]

    def read(self, partition):
        per = N_ROWS // N_PARTS
        start = partition.idx * per
        for i in range(start, start + per):
            h = (i * _A) % _M
            yield (i, h, h % 10)


class FeedDataSource(DataSource):
    """``spark.read.format("detfeed")`` — deterministic feed connector."""

    @classmethod
    def name(cls) -> str:
        return "detfeed"

    def schema(self) -> str:
        return "i long, h long, bucket int"

    def reader(self, schema) -> DataSourceReader:
        return _FeedReader()


def _ensure_registered(spark: SparkSession) -> None:
    if getattr(spark, "_detfeed_registered", False):
        return
    spark.dataSource.register(FeedDataSource)
    spark._detfeed_registered = True


@query(
    "src_py_datasource",
    oracle=f"""
SELECT (((i * {_A}) % {_M}) % 10) AS bucket,
       count(*) AS n,
       CAST(SUM((i * {_A}) % {_M}) AS BIGINT) AS h_sum,
       min(i) AS min_i,
       max(i) AS max_i
FROM range({N_ROWS}) t(i)
GROUP BY 1
""",
)
def src_py_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered Python DataSource and aggregate per
    bucket — proving the connector's partitioned read path end to end
    (8 independent splits, no driver-side materialization). The oracle
    re-derives the deterministic feed from pure arithmetic, so a
    partitioning bug (lost/duplicated shard) or a schema drift breaks
    the hash."""
    _ensure_registered(spark)
    feed = spark.read.format("detfeed").load()
    return feed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h").alias("h_sum"),
        F.min("i").alias("min_i"),
        F.max("i").alias("max_i"),
    )
