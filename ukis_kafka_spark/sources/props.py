"""Schema-on-read over the events property bag, as a gated query
(reference parity: ukis_kafka's PostGIS sink derives its DDL from the
properties observed in the feature stream — no fixed catalog).

``infer_props_schema`` votes a type per key from a bounded sample
(driver-side, ≤1000 rows — the same bounded observation the reference
sink makes per batch); ``project_props`` then lifts the bag into typed
columns with plain columnar expressions, so the open-schema path costs
nothing at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from .schema_infer import infer_props_schema, project_props


@query(
    "src_props_infer",
    oracle="""
SELECT event_type,
       count(*) AS n,
       count(k) AS n_with_k,
       min(k) AS k_min,
       max(k) AS k_max,
       CAST(sum(k) AS BIGINT) AS k_sum
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
""",
)
def src_props_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infer the property-bag schema from a sample, project the bag
    into typed columns, aggregate the typed view. The oracle hardcodes
    what inference must discover (`k` → bigint, per the corpus), so a
    wrong inferred type shows up as a schema/value mismatch, not just
    a unit-test failure."""
    e = load_table(spark, sf_dir, "events").withColumnRenamed("props", "props_json")
    schema = infer_props_schema(e)
    typed = project_props(e, schema)
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("k").alias("n_with_k"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.sum("k").alias("k_sum"),
    )
