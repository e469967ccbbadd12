"""Aggregation operators (SURVEY.md §2.2 "Aggregations").

All pure DataFrame API: Catalyst plans these as partial (map-side) +
final hash aggregates, so they scale linearly with input and shuffle
only the distinct group keys — the right shape at 100 TB where the
group-key cardinality (here ≤ a few thousand) is tiny relative to the
fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashsafe import (
    DEC,
    exact_avg,
    exact_sum,
    money_sum,
    oracle_exact_avg,
    oracle_exact_sum,
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


@query(
    "q_agg_global",
    oracle=f"""
SELECT
  {oracle_money_sum('l_quantity')} AS total_qty,
  {oracle_exact_avg('l_extendedprice')} AS avg_price,
  MIN(l_extendedprice) AS min_price,
  MAX(l_extendedprice) AS max_price,
  COUNT(*) AS n_rows
FROM lineitem
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-wide aggregate — partial + final agg, no group keys."""
    return load_table(spark, sf_dir, "lineitem").agg(
        money_sum("l_quantity").alias("total_qty"),
        exact_avg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_having",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders, {oracle_money_sum('o_totalprice')} AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("spend"),
        )
        .where(F.col("n_orders") >= 12)
    )


@query(
    "q_agg_distinct",
    oracle=f"""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       CAST(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_dist_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM(DISTINCT). The distinct sum runs over decimals so the
    result is order-independent (set summation in exact space)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
            F.sum_distinct(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_dist_qty"),
        )
    )


@query("q_agg_approx_cd")  # approximate: HLL sketches differ across engines → rows-only + unit bound
def q_agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct of users per event_type (HLL). Checked by a
    bounded-relative-error unit test against the exact count, not by
    hash (sketch internals are engine-specific by design)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@query(
    "q_agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {oracle_money_sum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(money_sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {oracle_money_sum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(money_sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_agg_gsets",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {oracle_money_sum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL frontend (not expressible in the
    DataFrame API without union tricks)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST({oracle_exact_sum('l_quantity')} AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@query(
    "q_agg_filtered",
    oracle=f"""
SELECT l_linestatus,
       {oracle_money_sum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END")} AS returned_value,
       COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk
FROM lineitem
GROUP BY l_linestatus
""",
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            money_sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(F.lit(0.0))
            ).alias("returned_value"),
            F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        )
    )


def _oracle_stats_sql() -> str:
    # Engine-neutral moments: stddev/var/corr from exact decimal sums of
    # x, x², y, y², xy — double arithmetic on identical aggregates is
    # bit-identical, unlike the engines' native streaming estimators.
    sx = "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
    sxx = "CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)"
    sy = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
    syy = "CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)"
    sxy = "CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)"
    n = "CAST(COUNT(*) AS DOUBLE)"
    return f"""
SELECT l_returnflag,
       ({sxx} - {sx} * {sx} / {n}) / ({n} - 1) AS var_price,
       SQRT(({sxx} - {sx} * {sx} / {n}) / ({n} - 1)) AS std_price,
       ({sxy} - {sx} * {sy} / {n})
         / SQRT(({sxx} - {sx} * {sx} / {n}) * ({syy} - {sy} * {sy} / {n})) AS corr_price_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_agg_stats", oracle=_oracle_stats_sql())
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / correlation from exact decimal moment
    sums (single aggregation pass; see oracle builder for why not the
    native stddev_samp/corr: their streaming merge order makes the last
    double bits engine-specific)."""
    l = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    y = F.col("l_quantity")
    dec8 = "decimal(38,8)"
    agg = l.groupBy("l_returnflag").agg(
        exact_sum(x).cast("double").alias("sx"),
        F.sum((x * x).cast(dec8)).cast("double").alias("sxx"),
        exact_sum(y).cast("double").alias("sy"),
        F.sum((y * y).cast(dec8)).cast("double").alias("syy"),
        F.sum((x * y).cast(dec8)).cast("double").alias("sxy"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    cov_num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    var_y_num = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    var_x_num = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    return agg.select(
        "l_returnflag",
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
        (cov_num / F.sqrt(var_x_num * var_y_num)).alias("corr_price_qty"),
    )


@query(
    "q_agg_collect",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list(DISTINCT o_orderpriority ORDER BY o_orderpriority), '|')
           AS priorities
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set per group, emitted as a '|'-joined sorted string:
    the driver's canonicalizer (pandas sort_values + hash) cannot
    handle array-typed cells, so oracle-checked queries must emit
    scalar columns only (same rule that fixed q_map_ops)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.concat_ws(
                "|", F.sort_array(F.collect_set("o_orderpriority"))
            ).alias("priorities")
        )
    )


@query(
    "q_agg_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_quantity, 0.25) AS p25_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (probe-verified: Spark's percentile
    and DuckDB's quantile_cont share the a + (b-a)·frac interpolation
    over the sorted values, bit-for-bit). Spark evaluates this as an
    object-hash aggregate buffering a value->count map PER AGGREGATE
    EXPRESSION, so the two l_extendedprice percentiles share ONE buffer
    via the array form (measured 2.0-3.1 -> 1.3-1.7 s at sf0.1 — three
    maps down to two, and one shared sort). At 100 TB prefer
    approx_percentile (t-digest) — excluded here because sketches never
    hash-match."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("pp"),
            F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        )
        .select(
            "l_returnflag",
            F.col("pp")[0].alias("median_price"),
            F.col("pp")[1].alias("p90_price"),
            "p25_qty",
        )
    )


@query("q_agg_approx_quantile")  # approximate: t-digest internals are engine-specific
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile over prices per returnflag — the sketch-based
    scale path for q_agg_percentile (single pass, mergeable state, no
    sort). Bounded-error unit test vs the exact percentile; never
    hash-checked (sketches differ across engines by design). Emits the
    two percentiles as SCALAR columns — the driver canonicalizer
    materializes rows-only output too, and an ARRAY cell crashes its
    pandas sort (the r4 red row)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("approx_p90"),
    )


@query(
    "q_agg_stringagg",
    oracle="""
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities_csv
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG semantics) as
    sort_array(collect_set) + array_join — deterministic because the
    order is pinned, unlike a bare collect_list."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "|").alias(
                "priorities_csv"
            )
        )
    )


@query(
    "q_sql_q6",
    oracle=f"""
SELECT {oracle_money_sum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
)
def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast-revenue query through the SQL frontend:
    the canonical pushdown showcase — every predicate reaches the
    parquet scan, the aggregate is a single partial+final global sum,
    and nothing shuffles but one row per partition."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q6")
    return spark.sql(
        f"""
        SELECT CAST({oracle_exact_sum('l_extendedprice * l_discount')} AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem_q6
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
        """
    )


@query(
    "q_grouping_id",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       {oracle_money_sum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with GROUPING()/GROUPING_ID() indicator columns — the
    standard way to tell a real NULL group key from a subtotal row
    (both engines implement the same SQL-standard bit encoding)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.grouping_id().alias("gid"),
        money_sum("l_quantity").alias("sum_qty"),
    )


@query(
    "q_agg_mode",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, spelled as count + ranked
    pick with a deterministic tiebreak — engine-native MODE() functions
    break ties arbitrarily, so the portable form is the only
    hash-checkable one. Two hash aggregates, top-1 pruned before the
    shuffle (WindowGroupLimit)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


@query(
    "q_agg_percentile_disc",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice ASC, l_orderkey ASC,
                                     l_linenumber ASC) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_extendedprice END)
         AS p50_disc,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN l_extendedprice END)
         AS p90_disc
FROM ranked GROUP BY l_returnflag
""",
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentile (PERCENTILE_DISC semantics: the smallest
    actual value with cumulative rank ≥ p), built from row_number +
    one conditional aggregate so both engines pick the identical row —
    native implementations differ in interpolation and tie handling.
    Like q_agg_percentile this is the exact-sort family (the at-scale
    path is q_agg_approx_quantile's sketch)."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"), F.col("l_extendedprice")
            )
        ).alias("p50_disc"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"), F.col("l_extendedprice")
            )
        ).alias("p90_disc"),
    )


@query(
    "q_agg_bitbool",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 25)  AS all_bulk,
       bool_or(l_discount > 0.09) AS any_deep_disc,
       bit_and(l_linenumber) AS ln_and,
       bit_or(l_linenumber)  AS ln_or,
       bit_xor(l_linenumber) AS ln_xor,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_bitbool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregates (every/any, bit_and/or/xor) —
    all partial-aggregatable, so they combine map-side like sum/count
    and shuffle one row per group regardless of input size."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 25).alias("all_bulk"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_disc"),
        F.bit_and("l_linenumber").alias("ln_and"),
        F.bit_or("l_linenumber").alias("ln_or"),
        F.bit_xor("l_linenumber").alias("ln_xor"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_cte_reuse",
    oracle="""
WITH seg AS (
  SELECT c_mktsegment,
         CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS seg_avg
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_above,
       MIN(s.seg_avg) AS seg_avg
FROM customer c
JOIN seg s ON c.c_mktsegment = s.c_mktsegment
WHERE c.c_acctbal > s.seg_avg
GROUP BY c.c_mktsegment
""",
)
def q_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE through the SQL frontend: per-segment average account
    balance computed once in a WITH block, then joined back to count
    above-average customers. The CTE side is tiny (one row per
    segment), so at scale it broadcasts and the base table is scanned
    twice at most — Catalyst may also collapse the reuse via
    ReusedExchange."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_cte")
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS seg_avg
          FROM customer_cte GROUP BY c_mktsegment
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS n_above,
               MIN(s.seg_avg) AS seg_avg
        FROM customer_cte c
        JOIN seg s ON c.c_mktsegment = s.c_mktsegment
        WHERE c.c_acctbal > s.seg_avg
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "q_agg_twophase_salted",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       {oracle_money_sum('value')} AS total_value
FROM events
GROUP BY event_type
""",
)
def q_agg_twophase_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase aggregation with explicit salting: phase 1 aggregates
    by (key, salt=id%16) — 16-way spreading any hot key across
    reducers — phase 2 re-aggregates the per-salt partials by key.
    Result is identical to the direct group-by (the oracle IS the
    direct group-by); the point is the plan shape that survives a
    skewed key at 100 TB where one reducer would otherwise take the
    whole hot group. Decimal partials re-merge exactly (sum of sums)."""
    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            exact_sum("value").alias("pv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@query(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(28,10))
                          ELSE CAST(0 AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE) AS qty_f,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(28,10))
                          ELSE CAST(0 AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE) AS qty_o,
       COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
       COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: quantities and counts by returnflag, spread
    over the two linestatus values as columns. Uses the DataFrame
    pivot with an EXPLICIT value list — at scale the implicit form
    adds a full distinct-scan pre-pass to discover values; pinning
    them keeps it a single hash aggregate (Catalyst rewrites pivot
    into exactly the conditional aggregates the oracle spells out)."""
    l = load_table(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
    )


@query(
    "q_winsorize",
    oracle="""
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
), bounds AS (
  SELECT event_type,
         max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN value END) AS lo,
         max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       count(*) FILTER (WHERE e.value < b.lo) AS n_clip_lo,
       count(*) FILTER (WHERE e.value > b.hi) AS n_clip_hi,
       CAST(CAST(SUM(CAST(least(greatest(e.value, b.lo), b.hi) AS DECIMAL(28,10)))
            AS VARCHAR) AS DOUBLE) AS clipped_sum
FROM events e JOIN bounds b ON b.event_type = e.event_type
GROUP BY e.event_type
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping) of event values to per-group
    [p05, p95] — the standard robust-statistics cleaning step before
    any mean-based aggregate on heavy-tailed data. Percentiles use the
    DISCRETE construction (row_number + conditional max, identical row
    in both engines — see q_agg_percentile_disc) so the clip bounds
    are actual data values and the clipped sum stays in the corpus's
    2-6 dp decimal-safe space. Bounds are a tiny per-group table that
    broadcasts back onto the fact scan; at 100 TB swap the exact rank
    for approx_percentile and keep the identical clip dataflow."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    wn = Window.partitionBy("event_type")
    # NULL values are excluded from ranking on BOTH sides: Spark sorts
    # NULLs first under ASC while DuckDB sorts them last, so a NULL in
    # events.value would shift every rank (and the clip bounds) by one.
    ranked = e.where(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.05 * F.col("n")).cast("long"), F.col("value"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"), F.col("value"))
        ).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("value") < F.col("lo"), F.lit(1))).alias("n_clip_lo"),
            F.count(F.when(F.col("value") > F.col("hi"), F.lit(1))).alias("n_clip_hi"),
            F.sum(clipped.cast(DEC)).cast("double").alias("clipped_sum"),
        )
    )


@query(
    "q_funnel",
    oracle="""
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN event_id END) AS first_view,
         min(CASE WHEN event_type = 'click' THEN event_id END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN event_id END) AS first_buy
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       COUNT(CASE WHEN first_view IS NOT NULL THEN 1 END) AS n_view,
       COUNT(CASE WHEN first_view < first_click THEN 1 END) AS n_view_click,
       COUNT(CASE WHEN first_view < first_click AND first_click < first_buy THEN 1 END)
         AS n_full_funnel
FROM per
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase conversion):
    one conditional-min aggregate per step keyed by user, then ordering
    comparisons on the step ids — event_id is the corpus's verified
    ts-monotone order, so 'before' is exact integer comparison and NULL
    steps drop out of the inequalities for free. Two hash aggregates
    total (user-level then global); no window, no self-join — at
    100 TB this is the shape that replaces the naive per-step
    self-join funnel, which multiplies the events table once per
    step."""
    e = load_table(spark, sf_dir, "events")

    def first(step):
        return F.min(F.when(F.col("event_type") == step, F.col("event_id")))

    per = e.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_buy"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("first_view").isNotNull(), F.lit(1))).alias("n_view"),
        F.count(F.when(F.col("first_view") < F.col("first_click"), F.lit(1))).alias(
            "n_view_click"
        ),
        F.count(
            F.when(
                (F.col("first_view") < F.col("first_click"))
                & (F.col("first_click") < F.col("first_buy")),
                F.lit(1),
            )
        ).alias("n_full_funnel"),
    )


@query(
    "q_retention",
    oracle="""
WITH acts AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), firsts AS (
  SELECT user_id, min(d) AS d0 FROM acts GROUP BY user_id
)
SELECT CAST(f.d0 AS VARCHAR) AS cohort_day,
       CAST((a.d - f.d0) // 7 AS BIGINT) AS week_offset,
       count(DISTINCT a.user_id) AS n_active
FROM acts a JOIN firsts f ON f.user_id = a.user_id
GROUP BY f.d0, (a.d - f.d0) // 7
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted per
    week-offset of subsequent activity — the standard engagement
    rollup. Day truncation sidesteps the ns-timestamp hazard (dates
    are identical under ns vs µs precision); offsets are exact integer
    day arithmetic. Shape: distinct (user, day) activity set → min-day
    cohort table (user-keyed, co-partitioned with the activity set so
    the join adds no extra exchange) → one grouped count-distinct."""
    e = load_table(spark, sf_dir, "events")
    acts = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    firsts = acts.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        acts.join(firsts, "user_id")
        .groupBy(
            F.col("d0").cast("string").alias("cohort_day"),
            F.expr("CAST(datediff(d, d0) div 7 AS BIGINT)").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "q_mad",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
), med AS (
  SELECT event_type, max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS median
  FROM ranked GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.event_id,
         abs(CAST(e.value AS DECIMAL(28,10)) - CAST(m.median AS DECIMAL(28,10))) AS adev
  FROM events e JOIN med m ON m.event_type = e.event_type
  WHERE e.value IS NOT NULL
), ranked2 AS (
  SELECT event_type, adev,
         row_number() OVER (PARTITION BY event_type ORDER BY adev ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
)
SELECT event_type,
       CAST(CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN adev END)
            AS VARCHAR) AS DOUBLE) AS mad
FROM ranked2 GROUP BY event_type
""",
)
def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust scale
    estimator next to q_winsorize's robust location. Both medians use
    the DISCRETE construction (row_number + conditional max, identical
    row both engines; interpolated medians are rounded quotients —
    the banned midpoint class), deviations are exact decimals, and the
    per-group median table broadcasts back onto the fact scan."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"), F.col("value"))
        ).alias("median")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value").cast(DEC) - F.col("median").cast(DEC)).alias("adev"),
    )
    w2 = Window.partitionBy("event_type").orderBy(F.col("adev").asc(), F.col("event_id").asc())
    ranked2 = dev.select(
        "event_type",
        "adev",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked2.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"), F.col("adev")))
        .cast("double")
        .alias("mad")
    )


@query(
    "q_attribution",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, event_type,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS clicks_before,
         MAX(CASE WHEN event_type = 'click' THEN event_id END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
         MIN(CASE WHEN event_type = 'click' THEN event_id END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_click_id
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       COUNT(CASE WHEN clicks_before > 0 THEN 1 END) AS n_attributed,
       COALESCE(MIN(first_click_id), -1) AS first_touch_id,
       COALESCE(MAX(last_click_id), -1) AS last_touch_id
FROM seq
WHERE event_type = 'purchase'
GROUP BY user_id
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution: for every purchase,
    the user's first- and last-touch click strictly before it, done
    with conditional window aggregates over the user's timeline
    instead of a purchases-to-clicks self-join (the join shape would
    re-shuffle both sides and explode on heavy users; the window form
    is one user_id shuffle and linear in the timeline).  Emits per
    user the purchase count, how many had any prior click, and the
    first/last touch event ids (-1 when a purchase had no preceding
    click — COUNT(CASE..) not SUM(CASE..1 ELSE 0) for the DuckDB
    HUGEINT trap)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    seq = e.select("user_id", "event_id", "event_type").withColumn(
        "clicks_before", F.count(click_id).over(w)
    ).withColumn("last_click_id", F.max(click_id).over(w)).withColumn(
        "first_click_id", F.min(click_id).over(w)
    )
    return (
        seq.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count(F.when(F.col("clicks_before") > 0, 1)).alias("n_attributed"),
            F.coalesce(F.min("first_click_id"), F.lit(-1)).alias("first_touch_id"),
            F.coalesce(F.max("last_click_id"), F.lit(-1)).alias("last_touch_id"),
        )
    )


@query(
    "q_multi_distinct",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT CAST(epoch(date_trunc('day', ts)) AS BIGINT)) AS n_days,
       count(DISTINCT CAST(floor(value) AS BIGINT)) AS n_values,
       count(*) AS n
FROM events
GROUP BY event_type
""",
)
def q_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) over DIFFERENT columns in one
    aggregate — the shape Catalyst rewrites through an Expand node
    (each input row fans out once per distinct column, tagged by a
    grouping id) so all three distincts resolve in a single shuffled
    aggregation instead of three self-joined scans.  The physical
    trade is deliberate: 3x the shuffle rows buys one pass over the
    fact table — at 100 TB the single scan wins whenever the fact
    table dwarfs the exploded shuffle (it does; see also
    q_bitmap_distinct for the word-packed alternative when distinct
    domains are dense integers).  All distinct keys are exact
    integers (day epoch, floored value grid)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct(
            F.unix_timestamp(F.date_trunc("day", "ts"))
        ).alias("n_days"),
        F.count_distinct(F.floor("value").cast("bigint")).alias("n_values"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_relational_division",
    oracle="""
WITH per AS (
  SELECT user_id, event_type, dayofweek(ts) + 1 AS d
  FROM events GROUP BY user_id, event_type, dayofweek(ts) + 1
),
tot AS (
  SELECT count(*) AS t FROM (
    SELECT DISTINCT event_type, dayofweek(ts) + 1 FROM events)
),
u AS (SELECT user_id, count(*) AS covered FROM per GROUP BY user_id)
SELECT user_id, covered, t AS total_combos, covered = t AS complete
FROM u, tot WHERE covered >= 30
""",
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (Codd's ÷ — "suppliers who supply ALL the
    parts"): which users have events in EVERY (event_type, weekday)
    combination the corpus exhibits, reported as coverage counting —
    the division verdict is ``covered = total`` and the >= 30-of-35
    near-division band keeps the result non-vacuous at every scale
    factor (exact division holds for 0/0/6 users at sf0.001/0.01/0.1;
    the band admits 9/81/841 of 15/150/1500 — measured).  dayofweek is
    0-based in DuckDB, 1-based in Spark (the CLAUDE.md rule: +1 in the
    oracle).  Scale: division-by-counting is THE scalable formulation —
    a two-level distinct aggregate (partial-agg friendly, no expand
    node) plus one broadcast scalar, versus the textbook
    double-NOT-EXISTS which plans as two correlated anti-joins."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.dayofweek("ts").alias("d")
    )
    per = e.groupBy("user_id", "event_type", "d").agg(F.lit(1).alias("_one"))
    tot = (
        per.select("event_type", "d")
        .distinct()
        .agg(F.count(F.lit(1)).alias("t"))
    )
    u = per.groupBy("user_id").agg(F.count(F.lit(1)).alias("covered"))
    return (
        u.crossJoin(F.broadcast(tot))
        .where(F.col("covered") >= 30)
        .select(
            "user_id",
            "covered",
            F.col("t").alias("total_combos"),
            (F.col("covered") == F.col("t")).alias("complete"),
        )
    )
