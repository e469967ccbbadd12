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


@query(
    "q_snapshot_diff",
    oracle="""
WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS h
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE doc_id % 29 = 0
),
joined AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.h <> n.h THEN 'modified'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON n.doc_id = o.doc_id
)
SELECT change_type, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM joined
GROUP BY change_type
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff — the audit between two corpus snapshots
    that every data release pipeline runs before publishing: a
    deterministic "v2" snapshot (drop every 17th doc, edit every 13th,
    append new ids from every 29th) is full-outer-joined to v1 on the
    key and classified added / removed / modified / unchanged by
    content hash.  At 100 TB this is one co-partitioned full-outer
    join on the snapshot key carrying only (key, 16-byte digest) —
    never document bodies — plus a partial-combined rollup; exactly
    the shape a lakehouse table-diff uses.  Counts per class are
    non-vacuous at every scale by the modulo construction."""
    d = load_table(spark, sf_dir, "documents")
    old = d.select("doc_id", F.md5("text").alias("h"))
    new = (
        d.where(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 13 == 0, F.md5(F.concat(F.col("text"), F.lit(" v2"))))
            .otherwise(F.md5("text"))
            .alias("h"),
        )
        .unionByName(
            d.where(F.col("doc_id") % 29 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.md5(F.col("doc_id").cast("string")).alias("h"),
            )
        )
    )
    joined = old.alias("o").join(
        new.alias("n"), F.col("n.doc_id") == F.col("o.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "modified")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "q_setops_all",
    oracle="""
SELECT 'intersect_all' AS op, event_type AS v, count(*) AS n FROM (
  SELECT event_type FROM events WHERE user_id % 2 = 0
  INTERSECT ALL
  SELECT event_type FROM events WHERE value > 500
) GROUP BY event_type
UNION ALL
SELECT 'except_all' AS op, event_type AS v, count(*) AS n FROM (
  SELECT event_type FROM events WHERE user_id % 2 = 0
  EXCEPT ALL
  SELECT event_type FROM events WHERE value > 500
) GROUP BY event_type
""",
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiplicity-aware membership — min(countA, countB) and
    max(countA − countB, 0) copies per value — which the DISTINCT
    variants silently collapse; SQL engines differ on whether ALL is
    even supported, so the surface is pinned here with both engines'
    native implementations checked against each other. Spark plans
    these as a single aggregate computing per-value counts on each
    side (no join explosion); output is rolled up per (op, value) so
    the multiplicities themselves are what hash."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("user_id") % 2 == 0).select("event_type")
    b = e.where(F.col("value") > 500).select("event_type")
    ia = (
        a.intersectAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), F.col("event_type").alias("v"), "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), F.col("event_type").alias("v"), "n")
    )
    return ia.unionByName(ea)
