"""Aggregation operators (SURVEY.md §2.2 "Aggregations").

All pure DataFrame API: Catalyst plans these as partial (map-side) +
final hash aggregates, so they scale linearly with input and shuffle
only the distinct group keys — the right shape at 100 TB where the
group-key cardinality (here ≤ a few thousand) is tiny relative to the
fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashsafe import (
    exact_avg,
    money_sum,
    oracle_exact_avg,
    oracle_money_sum,
)
from ..registry import query
from ..sources import load_table


@query(
    "q_agg_groupby",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_money_sum('l_quantity')} AS sum_qty,
  {oracle_money_sum('l_extendedprice')} AS sum_base_price,
  {oracle_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {oracle_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {oracle_exact_avg('l_quantity')} AS avg_qty,
  {oracle_exact_avg('l_extendedprice')} AS avg_price,
  {oracle_exact_avg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary.

    Scan → pushed-down date filter → 2-key hash aggregate. The shipdate
    predicate and the 8-column projection both reach the parquet reader
    (verified via explain: PushedFilters + ReadSchema), so at scale the
    scan reads a fraction of the table.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
