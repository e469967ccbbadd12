"""PostGIS sink (reference parity R7: the ukis_kafka consumer creates
the target table from the inferred feature schema and upserts each
batch with the geometry as WKB).

No Postgres exists offline, so this module separates the pure parts —
DDL + upsert-SQL generation from a Spark schema, fully unit-tested —
from the I/O part (a ``foreachBatch`` writer that executes them over
any DB-API connection factory). With a real database the writer is the
production path; its dataflow (per-batch idempotent upsert) is what
sinks.files.upsert_parquet and the streaming suite already exercise.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PG_TYPES = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.StringType: "TEXT",
    T.BooleanType: "BOOLEAN",
    T.TimestampType: "TIMESTAMP",
    T.DateType: "DATE",
    T.BinaryType: "BYTEA",
}


def pg_type(dt: T.DataType, geom_col: bool = False) -> str:
    if geom_col:
        return "GEOMETRY"
    try:
        return _PG_TYPES[type(dt)]
    except KeyError:
        raise ValueError(f"no PostGIS mapping for Spark type {dt.simpleString()}")


def create_table_ddl(
    schema: T.StructType,
    table: str,
    key_cols: list[str],
    geom_col: str | None = None,
    srid: int = 4326,
    plain_wkb: bool = False,
) -> str:
    """CREATE TABLE IF NOT EXISTS from a Spark schema — the reference's
    inferred sink DDL. The geometry column is typed GEOMETRY(srid) and
    fed WKB (PostGIS's native binary ingest format).

    ``plain_wkb=True`` is the no-PostGIS degrade: the geometry column
    is stored as raw WKB BYTEA (no ST_* functions anywhere in the
    generated SQL), so the sink's full dataflow — inferred DDL,
    idempotent per-batch upsert, WKB round-trip — runs against a
    PLAIN PostgreSQL server.  The online twin test provisions a real
    throwaway cluster and exercises exactly this path."""
    cols = []
    for f in schema.fields:
        if f.name == geom_col and not plain_wkb:
            cols.append(f'"{f.name}" GEOMETRY(GEOMETRY, {srid})')
        else:
            cols.append(f'"{f.name}" {pg_type(f.dataType)}')
    pk = ", ".join(f'"{c}"' for c in key_cols)
    body = ",\n  ".join(cols)
    return (
        f'CREATE TABLE IF NOT EXISTS "{table}" (\n  {body},\n'
        f"  PRIMARY KEY ({pk})\n)"
    )


def upsert_sql(
    schema: T.StructType, table: str, key_cols: list[str], geom_col: str | None = None, srid: int = 4326,
    plain_wkb: bool = False,
) -> str:
    """INSERT ... ON CONFLICT DO UPDATE for one row of placeholders —
    the reference's idempotent per-feature write (R7+R9: at-least-once
    delivery requires the sink to absorb re-delivery).  With
    ``plain_wkb`` the geometry placeholder stays a raw ``%s`` (BYTEA
    WKB, no ST_GeomFromWKB — see create_table_ddl)."""
    names = [f.name for f in schema.fields]
    collist = ", ".join(f'"{n}"' for n in names)
    params = ", ".join(
        f"ST_GeomFromWKB(%s, {srid})" if (n == geom_col and not plain_wkb) else "%s"
        for n in names
    )
    conflict = ", ".join(f'"{c}"' for c in key_cols)
    updates = ", ".join(
        f'"{n}" = EXCLUDED."{n}"' for n in names if n not in key_cols
    )
    action = f"DO UPDATE SET {updates}" if updates else "DO NOTHING"
    return (
        f'INSERT INTO "{table}" ({collist}) VALUES ({params})\n'
        f"ON CONFLICT ({conflict}) {action}"
    )


def postgis_batch_writer(
    table: str,
    key_cols: list[str],
    connection_factory: Callable,
    geom_col: str | None = None,
    srid: int = 4326,
    plain_wkb: bool = False,
):
    """foreachBatch callback: executes the DDL once on the driver, then
    upserts every row of the micro-batch in one transaction per
    partition. Use as

        stream.writeStream.foreachBatch(
            postgis_batch_writer("features", ["fid"], psycopg2_connect, "geom")
        ).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        schema = batch_df.schema
        ddl = create_table_ddl(schema, table, key_cols, geom_col, srid, plain_wkb)
        sql = upsert_sql(schema, table, key_cols, geom_col, srid, plain_wkb)

        # DDL runs once, on the driver: concurrent CREATE TABLE IF NOT
        # EXISTS from partitions races inside Postgres
        conn = connection_factory()
        try:
            with conn:
                conn.cursor().execute(ddl)
        finally:
            conn.close()

        def write_partition(rows):
            pconn = connection_factory()
            try:
                with pconn:
                    cur = pconn.cursor()
                    for row in rows:
                        cur.execute(sql, tuple(row))
            finally:
                pconn.close()

        batch_df.rdd.foreachPartition(write_partition)

    return write_batch
