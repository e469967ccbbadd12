"""Kafka source/sink wiring (reference parity R2/R3 online path).

No broker (and no spark-sql-kafka connector jar) exists in the offline
harness, so these builders are exercised there through their file-based
twins. The selectable entry point is ``envelope_raw_stream``: set
``UKIS_KAFKA_BROKERS`` (or pass ``brokers=``) and the SAME pipeline
reads ``format("kafka")``; leave it unset and it reads the wire-format
parquet twin. Everything downstream of the raw ``value binary`` column
— ``decode_feature_stream``, the aggregates, the sinks — is one shared
code path, byte-for-byte identical in both modes
(streaming.jobs.src_kafka_shape drives it through the oracle gate
offline).
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

ENV_BROKERS = "UKIS_KAFKA_BROKERS"
ENV_TOPIC = "UKIS_KAFKA_TOPIC"


def envelope_raw_stream(
    spark: SparkSession,
    *,
    brokers: str | None = None,
    topic: str | None = None,
    wire_dir: str | None = None,
    starting_offsets: str = "earliest",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """The ONE source switch for envelope pipelines: returns a streaming
    DataFrame of raw msgpack envelopes (single ``value binary`` column).

    With a broker (``brokers=`` argument or the ``UKIS_KAFKA_BROKERS``
    env var) the stream is ``format("kafka")`` on ``topic`` (or
    ``UKIS_KAFKA_TOPIC``); otherwise it is the file-stream twin over
    ``wire_dir`` — a parquet directory holding the identical envelope
    bytes, which is also exactly what a Kafka->parquet archiver sink
    writes. Flipping a deployment online is therefore one env var, no
    code change."""
    brokers = brokers or os.environ.get(ENV_BROKERS)
    if brokers:
        topic = topic or os.environ.get(ENV_TOPIC, "ukis-features")
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
            .select("value")
        )
    if wire_dir is None:
        raise ValueError(
            f"no Kafka brokers configured (set {ENV_BROKERS}) and no wire_dir fallback given"
        )
    return (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(wire_dir)
    )


def decode_feature_stream(raw: DataFrame, include_geom: bool = True) -> DataFrame:
    """msgpack feature envelopes (``value binary``) → decoded feature
    rows (layer, srid, geom_type, wkb, props_json). Shared by the Kafka
    and file-twin sources — the decode is source-agnostic.

    ``include_geom=False`` prunes the wkb payload INSIDE the kernel for
    consumers that only read properties (the geometry is still decoded
    as an integrity check, it just never crosses the Arrow boundary).
    At this corpus's ~21-byte point WKBs the saving is noise — the
    per-row msgpack decode dominates — but payload-heavy geometries
    (polygons, multipart) are exactly what a property-only consumer
    should not ship."""
    from .envelope import read_envelope
    from ..spatial.wkb import decode_wkb

    cols = ["layer", "srid", "geom_type"] + (["wkb"] if include_geom else []) + ["props_json"]

    def decode(iter_pdf):
        for pdf in iter_pdf:
            out = {c: [] for c in cols}
            for buf in pdf["value"]:
                env = read_envelope(bytes(buf))
                gtype, _ = decode_wkb(env["geom"])
                out["layer"].append(env["meta"]["layer"])
                out["srid"].append(env["meta"].get("srid", 4326))
                out["geom_type"].append(gtype)
                if include_geom:
                    out["wkb"].append(env["geom"])
                out["props_json"].append(json.dumps(env["props"], sort_keys=True))
            yield pd.DataFrame(out)

    schema = ", ".join(
        f"{c} {'binary' if c == 'wkb' else 'int' if c == 'srid' else 'string'}" for c in cols
    )
    return raw.mapInPandas(decode, schema)


def kafka_feature_stream(
    spark: SparkSession, brokers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """readStream from a topic of msgpack feature envelopes → decoded
    feature rows (layer, srid, geom_type, wkb, props_json)."""
    raw = envelope_raw_stream(
        spark, brokers=brokers, topic=topic, starting_offsets=starting_offsets
    )
    return decode_feature_stream(raw)


def write_features_to_kafka(
    features: DataFrame, brokers: str, topic: str, checkpoint: str
):
    """writeStream of (wkb, props_json, layer, srid) feature rows as
    msgpack envelopes to a topic. Returns the StreamingQuery."""
    from .envelope import make_envelope

    def encode(iter_pdf):
        for pdf in iter_pdf:
            vals = [
                make_envelope(
                    bytes(r.wkb), json.loads(r.props_json), layer=r.layer, srid=int(r.srid)
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame({"value": pd.Series(vals, dtype=object)})

    wire = features.mapInPandas(encode, "value binary")
    return (
        wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
