"""Set operations (SURVEY.md §2.2). Two derived key sets:
A = customers in the BUILDING segment, B = customers holding an order
above a price threshold."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_A_SQL = "SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'"
_B_SQL = "SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 250000"


def _ab(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    a = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    return a, b


@query("q_union_all", oracle=f"{_A_SQL} UNION ALL {_B_SQL}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _ab(spark, sf_dir)
    return a.unionByName(b)


@query("q_union_distinct", oracle=f"{_A_SQL} UNION {_B_SQL}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _ab(spark, sf_dir)
    return a.unionByName(b).distinct()


@query("q_intersect", oracle=f"{_A_SQL} INTERSECT {_B_SQL}")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _ab(spark, sf_dir)
    return a.intersect(b)


@query("q_except", oracle=f"{_A_SQL} EXCEPT {_B_SQL}")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _ab(spark, sf_dir)
    return a.subtract(b)  # EXCEPT DISTINCT semantics, matching SQL EXCEPT


@query(
    "q_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
FROM lineitem WHERE l_orderkey % 20 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS val
FROM lineitem WHERE l_orderkey % 20 = 0
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) — the inverse of m_pivot_lang.
    Plans as a generate/expand over each row: no shuffle, output is
    rows × measures."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice"],
        variableColumnName="measure",
        valueColumnName="val",
    )
