"""Driver-facing API: the implementations behind ``__spark_entry__``.

Importing this module imports every operator module, which populates
the registry (``ukis_kafka_spark.registry``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import for registration side effects — every module below registers
# its queries/oracles with ukis_kafka_spark.registry.
from .functions import scalars, udfs  # noqa: F401
from .ml import dedup, multimodal, similarity, text  # noqa: F401
from .sinks import files as sink_files  # noqa: F401
from .spatial import geo  # noqa: F401
from .streaming import batch_windows, jobs  # noqa: F401
from .operators import (  # noqa: F401
    aggregates,
    filters,
    joins,
    scans,
    setops,
    sorts,
    windows,
)

from .registry import ORACLE, QUERIES

FLAGSHIP = "q_agg_groupby"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke check: rows > 0)."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
