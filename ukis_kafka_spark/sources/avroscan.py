"""Parallel Avro ingestion through the PySpark 4 Python DataSource API
(SURVEY.md §2.3 sources) — ``spark.read.format("avroscan")``.

The pip pyspark distribution lacks the spark-avro datasource module,
so Avro — still a mainstream interchange format for Kafka ecosystems
(the reference's transport world [K]) — had no path into the engine.
This connector supplies one using only ``sources.avro`` (pure-stdlib
re-implementation of the public Avro 1.11 container format):

- ``schema()`` parses the container header once, driver-side;
- ``partitions()`` walks block headers only (seek past payloads) and
  groups contiguous block ranges into splits — the planning cost is
  O(blocks), never O(bytes);
- ``read(partition)`` decodes its block range independently on the
  executor — the same sync-marker split strategy Hadoop's Avro input
  format uses, so a 100 TB Avro lake reads with full parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from ..cache import cache_publish as _cache_publish
from ..cache import table_fingerprint as _table_fingerprint
from ..registry import query
from ..sources import load_table
from .avro import read_blocks, scan_blocks, spark_ddl

N_SPLITS = 8


class _AvroPartition(InputPartition):
    def __init__(self, path, schema, codec, blocks):
        self.path = path
        self.schema = schema
        self.codec = codec
        self.blocks = blocks


MANIFEST = "_LIVE"


def _resolve_files(path: str) -> list:
    """A path is one container file or a directory of them — the lake
    layout. Sorted for deterministic planning.  An empty directory
    (e.g. a sink path whose only batch aborted) is a descriptive error,
    not an IndexError downstream (ADVICE r5).

    When a ``_LIVE`` manifest is present (written atomically by every
    sink commit), only parts it lists are read: a crash between an
    overwrite's rename loop and its delete loop leaves old+new part
    files on disk, and without the manifest that half-committed state
    silently read as duplicated rows (ADVICE r7).  Parts listed but
    since deleted are skipped (the manifest is written BEFORE the
    delete loop, so that gap is normal); parts on disk but unlisted
    are orphans of a crashed commit and are ignored — the next
    overwrite commit garbage-collects them."""
    if os.path.isdir(path):
        names = {f for f in os.listdir(path) if f.endswith(".avro")}
        mpath = os.path.join(path, MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                listed = {ln.strip() for ln in fh if ln.strip()}
            names &= listed
        files = sorted(os.path.join(path, f) for f in names)
        if not files:
            raise ValueError(f"no live .avro files found in directory: {path}")
        return files
    return [path]


class _AvroReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        import json as _json

        parts = []
        first = None  # (path, canonical schema) — all files must agree
        for f in _resolve_files(self.path):
            schema, codec, blocks = scan_blocks(f)
            canon = _json.dumps(schema, sort_keys=True)
            if first is None:
                first = (f, canon)
            elif canon != first[1]:
                raise ValueError(
                    "avroscan: schema mismatch across directory — "
                    f"{first[0]} and {f} have different header schemas "
                    "(the planned read schema comes from the first file)"
                )
            per = max(1, (len(blocks) + N_SPLITS - 1) // N_SPLITS)
            parts.extend(
                _AvroPartition(f, schema, codec, blocks[i : i + per])
                for i in range(0, max(len(blocks), 1), per)
            )
        return parts

    def read(self, partition):
        """Yield one Arrow RecordBatch per container block — the
        columnar decode (avro.decode_columns) plus Arrow transfer is
        ~10× the tuple generator for wide scans (SPARK-48493: the
        Python DataSource read path accepts RecordBatches)."""
        import zlib

        import pyarrow as pa

        from .avro import decode_columns

        names = [f["name"] for f in partition.schema["fields"]]
        types = [f["type"] for f in partition.schema["fields"]]
        arrow_t = {
            "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "string": pa.string(), "bytes": pa.binary(),
        }

        def base(t):
            return t if not isinstance(t, list) else next(x for x in t if x != "null")

        with open(partition.path, "rb") as f:
            for offset, n_rec, size in partition.blocks:
                f.seek(offset)
                payload = f.read(size)
                if partition.codec == "deflate":
                    payload = zlib.decompress(payload, -15)
                cols = decode_columns(payload, types, n_rec)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(c, type=arrow_t[base(t)])
                        for c, t in zip(cols, types)
                    ],
                    names=names,
                )


class AvroScanDataSource(DataSource):
    """``spark.read.format("avroscan").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "avroscan"

    def schema(self) -> str:
        from .avro import read_header

        with open(_resolve_files(self.options["path"])[0], "rb") as f:
            schema, _, _ = read_header(f)
        return spark_ddl(schema)

    def reader(self, schema) -> DataSourceReader:
        return _AvroReader(self.options["path"])


def _ensure_registered(spark: SparkSession) -> None:
    if getattr(spark, "_avroscan_registered", False):
        return
    spark.dataSource.register(AvroScanDataSource)
    spark._avroscan_registered = True


_SCHEMA = {
    "type": "record",
    "name": "order",
    "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_custkey", "type": "long"},
        {"name": "o_orderstatus", "type": "string"},
        {"name": "o_orderpriority", "type": ["null", "string"]},
        {"name": "o_totalprice", "type": "double"},
    ],
}


@query(
    "src_avro_roundtrip",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       COUNT(CASE WHEN o_orderkey % 7 <> 0 THEN 1 END) AS n_pri,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR)
            AS DOUBLE) AS price_sum
FROM orders
GROUP BY o_orderstatus
""",
)
def src_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro container round-trip parity: orders are serialized into a
    REAL deflate-compressed Avro Object Container File (pure-stdlib
    writer, 512-record blocks → ~30 splits at sf0.01) and read back
    through the avroscan Python DataSource; the aggregate must equal
    the parquet original.  The nullable-union column (o_orderpriority,
    nulled where o_orderkey % 7 == 0) exercises the union branch
    encoding; the double column must come back bit-exact (IEEE bytes
    on the wire).  The file build is the driver-side build-once
    fixture; the block scan, parallel decode, and aggregate are the
    at-scale path.  Sum discipline per CLAUDE.md: DECIMAL(28,10) mass,
    VARCHAR-routed cast in DuckDB."""
    from .avro import write_avro

    def build(into: str) -> None:
        rows = (
            load_table(spark, sf_dir, "orders")
            .select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority", "o_totalprice",
            )
            .sort("o_orderkey")
            .collect()  # bounded: fixture build, one-time per corpus
        )
        write_avro(
            os.path.join(into, "orders.avro"),
            _SCHEMA,
            [
                (
                    r.o_orderkey,
                    r.o_custkey,
                    r.o_orderstatus,
                    None if r.o_orderkey % 7 == 0 else r.o_orderpriority,
                    r.o_totalprice,
                )
                for r in rows
            ],
            codec="deflate",
            block_records=512,
        )

    src = os.path.join(
        _cache_publish(build, ("avro", 1, _table_fingerprint(sf_dir, "orders"))),
        "orders.avro",
    )
    _ensure_registered(spark)
    back = spark.read.format("avroscan").option("path", src).load()
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
        F.count("o_orderpriority").alias("n_pri"),
        F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
        .cast("double")
        .alias("price_sum"),
    )


def _avro_schema_of(spark_schema) -> dict:
    """Map a Spark StructType to the writer's Avro record schema
    (nullable fields become ``["null", T]`` unions)."""
    m = {
        "boolean": "boolean", "integer": "int", "long": "long",
        "float": "float", "double": "double", "string": "string",
        "binary": "bytes",
    }
    fields = []
    for f in spark_schema.fields:
        t = m[f.dataType.typeName()]
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": "row", "fields": fields}


class _AvroCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _AvroWriter(DataSourceWriter):
    """Task-side Avro container writer with the same two-phase commit
    protocol as the JSONL sink (pydatasource.py): each task serializes
    its partition into a private temp container (deflate blocks),
    commit() renames the batch into place atomically, abort() removes
    the temp files — exactly-once batch writes to an Avro lake.

    Final part names carry a per-batch unique component
    (``part-<batchid>-NNNNN.avro``): plain ``part-NNNNN`` names made a
    second append-mode save() to the same directory silently clobber
    the first batch's files via os.replace (ADVICE r5).  Every commit
    atomically publishes a ``_LIVE`` manifest of the directory's live
    parts; readers honor it, which makes the overwrite commit's
    rename→delete sequence crash-safe in BOTH directions (see
    ``_resolve_files`` / the commit-point comment below, ADVICE r7)."""

    def __init__(self, path: str, avro_schema: dict, overwrite: bool = False):
        self.path = path
        self.avro_schema = avro_schema
        self.overwrite = overwrite

    def write(self, rows):
        import os as _os
        import uuid as _uuid

        from .avro import write_avro

        recs = [tuple(r) for r in rows]
        tmp = _os.path.join(self.path, f"_tmp_{_uuid.uuid4().hex}.avro")
        write_avro(tmp, self.avro_schema, recs, codec="deflate", block_records=512)
        return _AvroCommit(tmp, len(recs))

    def commit(self, messages):
        import os as _os
        import uuid as _uuid

        old_parts: list[str] = []
        if self.overwrite:
            # honor mode("overwrite"): snapshot the PREVIOUS batches'
            # part files NOW, but delete them only AFTER every new
            # part is renamed into place (rename-first). The old
            # delete-then-rename order could lose the previous batch
            # with nothing in its place if the commit crashed between
            # the two loops, and would also delete a concurrently
            # committed append batch landing mid-commit (ADVICE r6).
            # A part appended after this snapshot is never touched;
            # a crash mid-commit leaves old, old+new, or new — never
            # an empty directory.
            old_parts = [
                f
                for f in _os.listdir(self.path)
                if f.endswith(".avro") and not f.startswith("_tmp_")
            ]
        batch = _uuid.uuid4().hex[:12]
        for i, m in enumerate(messages):
            _os.replace(
                m.tmp_path,
                _os.path.join(self.path, f"part-{batch}-{i:05d}.avro"),
            )
        # Commit point: publish the _LIVE manifest (tmp + atomic
        # replace) BETWEEN the rename and delete loops. It lists the
        # directory's current parts minus the superseded snapshot —
        # adoptive, so legacy pre-manifest parts and a concurrent
        # append's parts landing mid-overwrite stay visible. Crash
        # windows: before the manifest lands, readers keep the
        # previous state (new parts are invisible orphans, GC'd by
        # the next overwrite's snapshot+delete); after it lands,
        # readers see exactly the new state even if the delete loop
        # never ran — the silent-duplicate window (ADVICE r7) is
        # closed. Manifest maintenance assumes one committing driver
        # per directory at a time (Spark's own batch-commit model);
        # concurrent READERS are always safe.
        live = sorted(
            f
            for f in _os.listdir(self.path)
            if f.endswith(".avro")
            and not f.startswith("_tmp_")
            and f not in set(old_parts)
        )
        mtmp = _os.path.join(self.path, f"_tmp_manifest_{batch}")
        with open(mtmp, "w") as fh:
            fh.write("\n".join(live) + "\n")
        _os.replace(mtmp, _os.path.join(self.path, MANIFEST))
        for f in old_parts:
            try:
                _os.remove(_os.path.join(self.path, f))
            except OSError:
                pass  # already gone — a racing overwrite beat us to it

    def abort(self, messages):
        import os as _os

        for m in messages:
            try:
                _os.remove(m.tmp_path)
            except OSError:
                pass


class AvroSinkDataSource(DataSource):
    """``df.write.format("avrosink").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "avrosink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _AvroWriter(
            self.options["path"], _avro_schema_of(schema), overwrite
        )


def _ensure_sink_registered(spark: SparkSession) -> None:
    if getattr(spark, "_avrosink_registered", False):
        return
    spark.dataSource.register(AvroSinkDataSource)
    spark._avrosink_registered = True


@query(
    "sink_avro_roundtrip",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
         AS value_sum,
       min(event_id) AS min_id,
       max(event_id) AS max_id
FROM events
WHERE event_id % 5 = 0
GROUP BY event_type
""",
)
def sink_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Avro WRITE parity: a filtered events projection is
    written task-parallel through the avrosink DataSource (one deflate
    container per task, two-phase commit), read back through avroscan
    in DIRECTORY mode (block splits across all committed parts), and
    aggregated — a lost, doubled, or uncommitted task file, or any
    encode/decode asymmetry, breaks the hash.  With src_avro_roundtrip
    this closes the Avro story both directions: the lake layout
    written here (many container files, sync-marker-splittable) is
    exactly what a 100 TB Avro dataset looks like.  Nullable columns
    ride the union encoding (events fields are nullable in-schema).
    Sum discipline per CLAUDE.md: DECIMAL mass, VARCHAR-routed cast."""
    import shutil as _shutil
    import tempfile as _tempfile

    _ensure_registered(spark)
    _ensure_sink_registered(spark)
    from ..cache import fast_scratch_root
    out = _tempfile.mkdtemp(prefix="avro_sink_", dir=fast_scratch_root())
    try:
        (
            load_table(spark, sf_dir, "events")
            .where(F.col("event_id") % 5 == 0)
            .select("event_id", "event_type", "value")
            .write.format("avrosink")
            .option("path", out)
            .mode("append")
            .save()
        )
        back = spark.read.format("avroscan").option("path", out).load()
        return (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("value_sum"),
                F.min("event_id").alias("min_id"),
                F.max("event_id").alias("max_id"),
            )
            .localCheckpoint()
        )
    finally:
        _shutil.rmtree(out, ignore_errors=True)
