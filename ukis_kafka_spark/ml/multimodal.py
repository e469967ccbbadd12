"""Multimodal column plumbing (training-data-pipeline suite).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside — the pattern that scales: Spark never
interprets the bytes; decode/feature-extraction runs in Arrow-batched
``mapInPandas`` kernels whose batch shape (one pandas DataFrame per
~10k rows, bytes as object dtype) is exactly what a real
image/audio library consumes.

No media libraries exist in this container, so the *decoder* is a
deterministic stub behind ``decode_image`` (documented
NotImplementedError for real formats, deterministic fake for the
synthetic payloads) — while everything Spark-side (schema, binary
columns, metadata struct, UDF signature, batching, partitioning) is
real and tested.
"""

from __future__ import annotations

import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def decode_image(payload: bytes, fmt: str) -> dict:
    """Stub decoder. Real formats need an image library that is not in
    this container; the 'raw' format is a deterministic fake used by
    the synthetic corpus: byte i of the payload is pixel i."""
    if fmt != "raw":
        raise NotImplementedError(
            f"format {fmt!r} requires an image decoder (PIL/ffmpeg) not present offline"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "checksum": zlib.crc32(payload),
        "mean_pixel": (sum(payload) / n) if n else 0.0,
    }


def with_payload(d: DataFrame) -> DataFrame:
    """documents → multimodal shape: binary payload + metadata struct.
    The payload is the utf-8 encoding of the text (deterministic, so
    oracle SQL can reproduce byte-level facts with encode())."""
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("raw").alias("fmt"),
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("media_meta"),
    )


@query(
    "m_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha,  -- DuckDB 1.0 sha256 takes VARCHAR; hashes its utf-8 bytes

       hex(encode(substr(text, 1, 4))) AS head_hex
FROM documents
""",
)
def m_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed facts about an opaque binary payload — length, content
    hash, head bytes — all JVM-side (no decode needed): the metadata
    layer of the multimodal pattern."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
        F.hex(F.encode(F.substring(F.col("text"), 1, 4), "utf-8")).alias("head_hex"),
    )


@query("m_multimodal_features")  # rows-only: checksum kernel is python-side by design
def m_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas:
    one Arrow batch in, one feature frame out — the exact plumbing a
    real image featurizer plugs into (swap ``decode_image``'s stub for
    PIL and nothing else changes)."""
    d = with_payload(load_table(spark, sf_dir, "documents"))

    def extract(iter_pdf):
        for pdf in iter_pdf:
            feats = [
                decode_image(bytes(p), m["fmt"]) for p, m in zip(pdf.payload, pdf.media_meta)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf.doc_id,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "mean_pixel": [f["mean_pixel"] for f in feats],
                }
            )

    return d.mapInPandas(
        extract, "doc_id long, n_bytes int, checksum long, mean_pixel double"
    )


_FRAME_BYTES = 16
_FRAME_STRIDE = 4  # keep every 4th frame


@query(
    "m_frame_sample",
    oracle=f"""
SELECT d.doc_id,
       CAST(g.range * {_FRAME_STRIDE} AS BIGINT) AS frame_idx,
       CAST(g.range * {_FRAME_STRIDE} * {_FRAME_BYTES} AS BIGINT) AS byte_off,
       CAST(least({_FRAME_BYTES},
                  octet_length(encode(d.text)) - g.range * {_FRAME_STRIDE} * {_FRAME_BYTES})
            AS INTEGER) AS frame_len,
       hex(encode(substring(d.text,
                     CAST(g.range * {_FRAME_STRIDE} * {_FRAME_BYTES} + 1 AS INTEGER),
                     CAST(least(4, octet_length(encode(d.text))
                                   - g.range * {_FRAME_STRIDE} * {_FRAME_BYTES}) AS INTEGER))))
         AS head_hex  -- corpus text is ASCII: char slicing == byte slicing (DuckDB 1.0 substring can't take BLOB)
FROM documents d CROSS JOIN range(0, 4096) g
WHERE g.range * {_FRAME_STRIDE} * {_FRAME_BYTES} < octet_length(encode(d.text))
""",
)
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over an opaque binary column: the
    payload is cut into fixed {16}-byte "frames" and every 4th frame is
    emitted as its own row (offset, length, head bytes) — the exact
    mapInPandas fan-out plumbing a real ffmpeg frame sampler plugs
    into (multiple output rows per input row, Arrow-batched, no
    driver involvement). The byte slicing is deterministic, so the
    oracle reproduces every sampled frame from the utf-8 payload.

    Oracle coverage bound: the SQL side enumerates frame groups from a
    fixed range(0, 4096) → payloads up to 256 KiB (4096·4·16 B). The
    kernel raises on anything larger instead of silently emitting rows
    the oracle lacks (corpus max today: ~600 B)."""
    d = with_payload(load_table(spark, sf_dir, "documents"))

    def sample(iter_pdf):
        for pdf in iter_pdf:
            doc_ids, idxs, offs, lens, heads = [], [], [], [], []
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                buf = bytes(payload)
                if len(buf) > 4096 * _FRAME_STRIDE * _FRAME_BYTES:
                    raise ValueError(
                        f"payload of doc {doc_id} exceeds the 256 KiB oracle "
                        "coverage bound — widen the oracle's range() first"
                    )
                for i in range(0, (len(buf) + _FRAME_BYTES - 1) // _FRAME_BYTES, _FRAME_STRIDE):
                    off = i * _FRAME_BYTES
                    frame = buf[off : off + _FRAME_BYTES]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(frame))
                    heads.append(frame[:4].hex().upper())
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idxs,
                    "byte_off": offs,
                    "frame_len": lens,
                    "head_hex": heads,
                }
            )

    return d.mapInPandas(
        sample, "doc_id long, frame_idx long, byte_off long, frame_len int, head_hex string"
    )
