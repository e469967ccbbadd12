"""Kafka source/sink wiring (reference parity R2/R3 online path).

No broker (and no spark-sql-kafka connector jar) exists in the offline
harness, so these builders are exercised there through their file-based
twins (streaming.jobs.src_kafka_shape runs the identical
envelope→decode→aggregate path over a file stream). With a cluster +
connector on the classpath they are the production entry points; the
dataflow downstream of the source is byte-for-byte the same.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def kafka_feature_stream(
    spark: SparkSession, brokers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """readStream from a topic of msgpack feature envelopes → decoded
    feature rows (layer, srid, geom_type, wkb, props_json)."""
    from .envelope import read_envelope
    from ..spatial.wkb import decode_wkb

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select("value")
    )

    def decode(iter_pdf):
        for pdf in iter_pdf:
            out = {"layer": [], "srid": [], "geom_type": [], "wkb": [], "props_json": []}
            for buf in pdf["value"]:
                env = read_envelope(bytes(buf))
                gtype, _ = decode_wkb(env["geom"])
                out["layer"].append(env["meta"]["layer"])
                out["srid"].append(env["meta"].get("srid", 4326))
                out["geom_type"].append(gtype)
                out["wkb"].append(env["geom"])
                out["props_json"].append(json.dumps(env["props"], sort_keys=True))
            yield pd.DataFrame(out)

    return raw.mapInPandas(
        decode, "layer string, srid int, geom_type string, wkb binary, props_json string"
    )


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
