"""Sort / limit / top-k operators (SURVEY.md §2.2).

The driver's value-hash is order-insensitive, so each query emits an
explicit rank column to pin the ordering semantics into the values.
All orderings carry a unique-key tiebreak → fully deterministic.

Scale notes: a global ORDER BY + LIMIT k plans as
TakeOrderedAndProject (per-partition heap + driver merge of k·p rows —
no global sort); per-group top-k is one shuffle on the group key and a
partial window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "q_sort_multi",
    oracle="""
SELECT o_orderkey, status_or_null, rn FROM (
  SELECT o_orderkey,
         NULLIF(o_orderstatus, 'P') AS status_or_null,
         row_number() OVER (
           ORDER BY NULLIF(o_orderstatus, 'P') ASC NULLS FIRST,
                    o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 500
""",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort incl. NULLS FIRST placement, pinned via row_number."""
    o = load_table(spark, sf_dir, "orders")
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    w = Window.orderBy(
        status.asc_nulls_first(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            status.alias("status_or_null"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 500)
    )


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — plans as TakeOrderedAndProject (no full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal
FROM customer
QUALIFY row_number() OVER (
  PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )
