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
