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
    """Multi-key sort incl. NULLS FIRST placement, pinned via
    row_number.  The top-500 is taken FIRST (orderBy+limit plans as
    TakeOrderedAndProject — per-partition heads, one tiny merge, no
    full sort); the rank stamp's partition-less window then rides 500
    rows, the sanctioned bounded case, instead of the whole table."""
    o = load_table(spark, sf_dir, "orders")
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    order = [
        status.asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    top = o.orderBy(*order).limit(500)
    w = Window.orderBy(
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )
    return top.select(
        "o_orderkey", status.alias("status_or_null"), "o_totalprice"
    ).select(
        "o_orderkey",
        "status_or_null",
        F.row_number().over(w).alias("rn"),
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


@query(
    "q_skyline",
    oracle="""
WITH pts AS (
  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
         p_size, COUNT(*) AS n_parts
  FROM part GROUP BY 1, 2
),
per_price AS (
  SELECT price_cents, MAX(p_size) AS smax
  FROM pts GROUP BY price_cents
),
ranked AS (
  SELECT price_cents, smax,
         MAX(smax) OVER (ORDER BY price_cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_before
  FROM per_price
)
SELECT p.price_cents, p.p_size AS skyline_size, p.n_parts
FROM pts p JOIN ranked r ON p.price_cents = r.price_cents
WHERE p.p_size = r.smax AND p.p_size > COALESCE(r.best_before, -1)
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (pareto frontier): parts not dominated on
    (min price, max size) — dominance is cheaper-or-equal AND
    larger-or-equal with strictness somewhere.  The naive NOT EXISTS
    self-join is quadratic; the 2-D skyline is O(n log n) as a
    running max: aggregate to distinct (price, size) points, keep per
    price only the max size, and a point survives iff its size beats
    the best size seen at any STRICTLY cheaper price.  The frontier
    scan runs RANGE-PARTITIONED over the per-price aggregate
    (with_global_order's exclusive prefix max — |distinct prices|
    grows with the price domain, so no single-task window even
    there).  Prices in exact cents (floor(x·100+0.5); 2-dp data)."""
    from ..functions.ranks import with_global_order

    p = load_table(spark, sf_dir, "part")
    price = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("bigint")
    pts = p.select(price.alias("price_cents"), "p_size").groupBy(
        "price_cents", "p_size"
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    per_price = pts.groupBy("price_cents").agg(F.max("p_size").alias("smax"))
    ranked = with_global_order(
        per_price,
        [F.col("price_cents").asc()],
        cummax_before={"best_before": F.col("smax")},
    )
    return (
        pts.join(ranked, "price_cents")
        .where(
            (F.col("p_size") == F.col("smax"))
            & (F.col("p_size") > F.coalesce(F.col("best_before"), F.lit(-1)))
        )
        .select("price_cents", F.col("p_size").alias("skyline_size"), "n_parts")
    )
