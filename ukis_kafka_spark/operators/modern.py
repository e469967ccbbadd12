"""Spark-4 surface operators: collation-aware grouping and SQL pipe
syntax (SURVEY.md §2.3, round-4 continuation; VARIANT extraction is
q_variant in functions/scalars.py).

The reference pipeline ingests inconsistently-cased free-form feeds;
these operators are the Spark-4-native way a user queries them:
collation for case-insensitive keying without destroying the
original strings, and pipe syntax as the modern composition surface
over the same engine.

Scale notes: collation-aware grouping hashes the collation key
directly (one shuffle, same as any groupBy); pipe syntax lowers to
the identical Catalyst plan as the classic SQL it mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources import load_table

DEC = "decimal(28,10)"


@query(
    "q_collation",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS label,
         value
  FROM events
)
SELECT lower(label) AS label_ci,
       COUNT(*) AS n,
       COUNT(DISTINCT label) AS n_spellings,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
         AS value_sum
FROM mixed
GROUP BY lower(label)
ORDER BY label_ci
""",
)
def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware (case-insensitive) grouping via UTF8_LCASE.

    A deterministic mixed-case label is derived from the corpus
    (even event_ids report their type upper-cased — simulating the
    inconsistent casing real ingest feeds carry), then grouped under
    the UTF8_LCASE collation so 'CLICK' and 'click' land in one
    group. The group key is emitted through ``lower`` so both engines
    print one canonical spelling. COUNT(DISTINCT label) counts raw
    spellings per group (binary-collated inner distinct) proving the
    group genuinely merged distinct inputs. Collation grouping hashes
    the collation key — one shuffle, no extra pass vs lower()-and-
    group; unlike lower() it preserves the original strings for
    downstream use.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_coll")
    return spark.sql(
        """
        WITH mixed AS (
          SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                      ELSE event_type END AS label,
                 value
          FROM ev_coll
        )
        SELECT lower(min(collate(label, 'UTF8_BINARY'))) AS label_ci,
               count(*) AS n,
               count(DISTINCT collate(label, 'UTF8_BINARY')) AS n_spellings,
               cast(sum(cast(value AS DECIMAL(28,10))) AS DOUBLE) AS value_sum
        FROM mixed
        GROUP BY collate(label, 'UTF8_LCASE')
        ORDER BY label_ci
        """
    )


@query(
    "q_pipe_sql",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
         AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR)
            AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
ORDER BY l_returnflag, l_linestatus
""",
)
def q_pipe_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>`): the TPC-H Q1 shape written as a linear
    pipeline — scan |> filter |> aggregate |> filter-on-agg |> order.

    Pipe syntax is pure surface: Catalyst lowers this to the identical
    plan as the classic GROUP BY/HAVING oracle (pushdown, partial
    aggregation and whole-stage codegen all unchanged), which is
    exactly what the oracle check demonstrates. Decimal sums emitted
    as double per the repo's hash-safe rules.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pipe")
    return spark.sql(
        """
        FROM li_pipe
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE count(*) AS n,
                     cast(sum(cast(l_quantity AS DECIMAL(28,10))) AS DOUBLE)
                       AS sum_qty,
                     cast(sum(cast(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
                       AS sum_price
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n > 10
        |> SELECT l_returnflag, l_linestatus, n, sum_qty, sum_price
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q_recursive_cte",
    oracle="""
WITH RECURSIVE walk AS (
  SELECT l_partkey AS node, l_partkey AS part, 0 AS depth
  FROM (SELECT DISTINCT l_partkey FROM lineitem)
  UNION ALL
  SELECT node // 10, part, depth + 1 FROM walk WHERE node // 10 >= 1
)
SELECT depth,
       count(*) AS n_rows,
       count(DISTINCT node) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS node_sum
FROM walk
GROUP BY depth
ORDER BY depth
""",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE ``WITH RECURSIVE`` (Spark 4.x): the div-10 ancestor walk
    of the part tree executed by the engine's own recursion operator
    on BOTH sides — the general-recursion counterpart to
    q_hierarchy_rollup, which translates the same walk into a
    closed-form bounded unroll. Use the unroll when depth is known
    (one explode, no iteration); use native recursion when it isn't —
    Catalyst executes each recursive step as a new plan iteration
    under a UnionLoop, so cost is depth × step-plan, same as the
    hand-rolled loop but engine-managed. Integer-only output keeps it
    hash-safe; depth is bounded by the key domain (≤ 6 digits), so
    the loop terminates identically in both engines."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_rec")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT l_partkey AS node, l_partkey AS part, 0 AS depth
          FROM (SELECT DISTINCT l_partkey FROM li_rec)
          UNION ALL
          SELECT node DIV 10, part, depth + 1 FROM walk WHERE node DIV 10 >= 1
        )
        SELECT depth,
               count(*) AS n_rows,
               count(DISTINCT node) AS n_nodes,
               sum(node) AS node_sum
        FROM walk
        GROUP BY depth
        ORDER BY depth
        """
    )


@query(
    "q_sql_variables",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n,
       COUNT(CASE WHEN o_custkey > (SELECT max(o_custkey) // 2 FROM orders)
                  THEN 1 END) AS n_upper
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE / SET VAR, Spark 4): a scalar
    derived from the data is bound once into a session variable and
    referenced by a later statement — the scripting surface that
    replaces string-interpolated thresholds in multi-statement jobs
    (u_sql_params covers the per-statement parameter-marker path).
    The variable is folded into the plan as a literal at analysis
    time, so the consuming query plans exactly like the constant it
    is; the oracle states the same threshold as a scalar subquery.
    Integer threshold + counts keep it hash-safe."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_var")
    spark.sql("DECLARE OR REPLACE VARIABLE ukis_cust_cut BIGINT")
    spark.sql("SET VAR ukis_cust_cut = (SELECT max(o_custkey) DIV 2 FROM ord_var)")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               count(CASE WHEN o_custkey > ukis_cust_cut THEN 1 END) AS n_upper
        FROM ord_var
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q_lateral_alias",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(SUM(net_centi) AS BIGINT) AS net_centi_sum,
       CAST(SUM(charged_centi) AS BIGINT) AS charged_centi_sum
FROM (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e2) AS BIGINT)
           AS net_centi,
         net_centi
           + CAST(floor(l_extendedprice * l_tax * 1e2) AS BIGINT)
           AS charged_centi
  FROM lineitem
)
GROUP BY l_returnflag
""",
)
def q_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing
    an alias defined EARLIER in the same SELECT list (charged_centi
    builds on net_centi) — the surface that removes one subquery
    nesting level per derived column in wide feature projections;
    DuckDB resolves the same syntax, so the oracle is near-verbatim.
    Hash-safety: both derived columns floor pure-double products into
    integer centi-units (same IEEE doubles in both engines, floor not
    round — no tie sites), sums stay BIGINT (oracle casts DuckDB's
    HUGEINT back).  Literal arithmetic is e-notation per the
    round-5 decimal-literal trap.  Scale: one scan, one hash
    aggregate; the alias chain is inlined by the analyzer, so the
    plan is identical to the spelled-out expression."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_lat")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               SUM(net_centi) AS net_centi_sum,
               SUM(charged_centi) AS charged_centi_sum
        FROM (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e2) AS BIGINT)
                   AS net_centi,
                 net_centi
                   + CAST(floor(l_extendedprice * l_tax * 1e2) AS BIGINT)
                   AS charged_centi
          FROM li_lat
        )
        GROUP BY l_returnflag
        """
    )


@query(
    "q_group_by_all",
    oracle="""
SELECT event_type,
       CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
       count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
         AS value_sum
FROM events
GROUP BY ALL
""",
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 3.4+/DuckDB modern-SQL sugar): the
    engine infers the grouping keys as every non-aggregate select
    item — both engines here run the *same* inference over a
    two-key (type x day) aggregate, proving the resolved plan is the
    ordinary hash aggregate (no semantic drift vs explicit keys).
    Decimal-staged value sum per the repo's hash-safe rules.  Scale:
    identical to q_agg_groupby — inference is purely an analysis-time
    rewrite."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_gba")
    return spark.sql(
        """
        SELECT event_type,
               unix_timestamp(date_trunc('day', ts)) AS day_start,
               count(*) AS n,
               cast(sum(cast(value AS DECIMAL(28,10))) AS DOUBLE) AS value_sum
        FROM ev_gba
        GROUP BY ALL
        """
    )


@query(
    "q_sql_scripting",
    oracle="""
WITH nc AS (
  SELECT c_nationkey AS nk, count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey
),
ranked AS (
  SELECT nk, n, row_number() OVER (ORDER BY n DESC, nk ASC) AS r FROM nc
),
ks AS (SELECT unnest([4, 8, 16, 32, 64]) AS k),
cum AS (
  SELECT k, CAST(SUM(CASE WHEN r <= k THEN n END) AS BIGINT) AS cov,
         (SELECT count(*) FROM orders) AS total
  FROM ranked, ks GROUP BY k
)
SELECT CAST(k AS INTEGER) AS k, cov AS covered, total
FROM cum WHERE cov * 5 >= total * 3 ORDER BY k LIMIT 1
""",
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN..END procedural blocks — the
    feature that replaces driver-side orchestration loops for
    SQL-first users): a geometric coverage search — DOUBLE k until the
    top-k nations by order count cover >= 60% of all orders — written
    as DECLARE + WHILE + scalar-subquery SET, with the loop's LIMIT
    driven by the loop VARIABLE.  The oracle states the fixed point
    closed-form (first k in 4,8,16,... of the cumulative ranking
    past the threshold), so the script's terminating state is
    hash-checked, not just "it ran".  All-integer: counts and the
    5*cov >= 3*total cross-multiplied threshold (no division).
    Doubling, not k+=1, because each scripted SET is one Spark job
    (~0.3 s scheduling floor): the linear search measured 4.0 s at
    sf0.1, the geometric one ~1.5 s for the same fixed point
    guarantee-class.  The nation-count input is aggregated ONCE and
    localCheckpointed before the loop — each WHILE iteration re-queries
    25 materialized rows, not the orders×customer join (lazy temp
    views re-execute lineage per iteration, the round-4 O(k²) trap).
    Scale: one shuffle for the counts; the loop is O(log k) scans of a
    nation-sized table."""
    from ..registry import checkpoint_df
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nc = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(checkpoint_df)  # the WHILE body scans THIS, not the join
    )
    nc.createOrReplaceTempView("q_sql_scripting_counts")
    total_df = o.groupBy().agg(F.count(F.lit(1)).alias("t")).transform(checkpoint_df)
    total_df.createOrReplaceTempView("q_sql_scripting_total")
    return spark.sql(
        """
BEGIN
  DECLARE total BIGINT DEFAULT 0;
  DECLARE k INT DEFAULT 0;
  DECLARE cov BIGINT DEFAULT 0;
  SET total = (SELECT t FROM q_sql_scripting_total);
  SET k = 4;
  SET cov = (SELECT sum(n) FROM (
    SELECT n FROM q_sql_scripting_counts ORDER BY n DESC, nk ASC LIMIT k));
  WHILE cov * 5 < total * 3 DO
    SET k = k * 2;
    SET cov = (SELECT sum(n) FROM (
      SELECT n FROM q_sql_scripting_counts ORDER BY n DESC, nk ASC LIMIT k));
  END WHILE;
  SELECT k, cov AS covered, total;
END
"""
    )
