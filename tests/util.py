from __future__ import annotations

import math

import pandas as pd


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "tolist"):
        return norm_cell(v.tolist())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    return v


def norm_df(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in t) for t in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return cols, rows


def assert_scalar_schema(spark_df, name: str = "") -> None:
    """Oracle-checked queries must emit scalar columns only: the
    driver's canonicalizer (pandas sort_values over materialized cells)
    dies with `unhashable type: numpy.ndarray` on Array/Map/Struct
    output (the q_map_ops r1 / q_agg_collect r2 failure class, which
    this local harness used to mask by tuple-izing lists)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — stringify "
        "(concat_ws/to_json) before registering an oracle-checked query"
    )


def assert_parity(spark_df, duck_con, oracle_sql: str, name: str = "") -> None:
    assert_scalar_schema(spark_df, name)
    s_cols, s_rows = norm_df(spark_df.toPandas())
    o_cols, o_rows = norm_df(duck_con.execute(oracle_sql).fetchdf())
    assert s_cols == o_cols, f"{name}: columns spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        raise AssertionError(f"{name}: values differ, sample {bad}")
