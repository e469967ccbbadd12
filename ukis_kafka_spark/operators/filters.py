"""Projection & filter operators (SURVEY.md §2.2, reference stage R4:
property keep/drop/rename + message predicates, re-expressed as
Catalyst-optimizable select/filter so they push into the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "q_project_rename",
    oracle="""
SELECT p_partkey AS part_id,
       p_name AS part_name,
       p_retailprice,
       p_retailprice * 0.9 AS discounted,
       p_size + 1 AS size_next
FROM part
""",
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/rename/compute columns (R4 parity). Per-row double math is
    IEEE-deterministic, so emitted unrounded."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_retailprice"),
        (F.col("p_retailprice") * 0.9).alias("discounted"),
        (F.col("p_size") + 1).alias("size_next"),
    )


@query(
    "q_filter_basic",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
WHERE (o_totalprice > 150000 AND o_orderstatus = 'O')
   OR (NOT o_orderstatus = 'F' AND o_totalprice < 5000)
""",
)
def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        ((F.col("o_totalprice") > 150000) & (F.col("o_orderstatus") == "O"))
        | (~(F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 5000))
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


@query(
    "q_filter_in_between",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 50000 AND 100000
  AND o_orderstatus LIKE '_'
""",
)
def q_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 100000)
        & F.col("o_orderstatus").like("_")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "q_filter_null",
    oracle="""
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 'is-building' ELSE 'other' END AS tag
FROM customer
WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
   OR (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY')
""",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / null-safe equality. The corpus has no native NULLs, so
    they are manufactured with NULLIF — same trick on both sides."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg.alias("seg_or_null"),
        F.when(seg.isNull(), "is-building").otherwise("other").alias("tag"),
    ).where(F.col("seg_or_null").isNull() | F.col("seg_or_null").eqNullSafe("MACHINERY"))
