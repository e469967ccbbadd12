"""Dynamic property-bag schema inference (SURVEY.md §1.1: the
reference has no fixed catalog — its PostGIS sink derives table DDL
from the properties observed in the feature stream).

Spark twin: observe a batch of ``props_json`` strings, vote a type per
key (long ⊂ double ⊂ string, boolean separate), and project the open
bag into typed columns with ``get_json_object`` + casts. The inference
pass is one aggregate over a sample; the projection is plain columnar
expressions, so schema-on-read costs nothing at scan time.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_props_schema(df: DataFrame, props_col: str = "props_json", sample: int = 1000) -> dict[str, str]:
    """Observe up to ``sample`` rows and return {key: spark_type}.

    Type lattice per key: all-bool → boolean; ints only → bigint;
    numeric mix → double; anything else → string. Null/missing values
    don't narrow a type (columns stay nullable, like the reference's
    sink DDL)."""
    rows = df.select(props_col).limit(sample).collect()
    seen: dict[str, set[str]] = {}
    for r in rows:
        raw = r[0]
        if raw is None:
            continue
        obj = json.loads(raw)
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            kinds = seen.setdefault(k, set())
            if v is None:
                continue
            if isinstance(v, bool):
                kinds.add("boolean")
            elif isinstance(v, int):
                kinds.add("bigint")
            elif isinstance(v, float):
                kinds.add("double")
            else:
                kinds.add("string")
    out: dict[str, str] = {}
    for k, kinds in seen.items():
        if not kinds:  # only nulls observed: widest type, never narrow
            out[k] = "string"
        elif kinds <= {"boolean"}:
            out[k] = "boolean"
        elif kinds <= {"bigint"}:
            out[k] = "bigint"
        elif kinds <= {"bigint", "double"}:
            out[k] = "double"
        else:
            out[k] = "string"
    return out


def project_props(df: DataFrame, schema: dict[str, str], props_col: str = "props_json") -> DataFrame:
    """Project the JSON property bag into typed top-level columns
    (schema-on-read: the bag column stays available)."""
    cols = [df["*"]]
    for key, typ in sorted(schema.items()):
        cols.append(F.get_json_object(F.col(props_col), f"$.{key}").cast(typ).alias(key))
    return df.select(*cols)
