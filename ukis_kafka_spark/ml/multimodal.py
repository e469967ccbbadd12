"""Multimodal column plumbing (training-data-pipeline suite).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside — the pattern that scales: Spark never
interprets the bytes; decode/feature-extraction runs in Arrow-batched
``mapInPandas`` kernels whose batch shape (one pandas DataFrame per
~10k rows, bytes as object dtype) is exactly what a real
image/audio library consumes.

Three real media formats decode offline with pure stdlib: 8-bit BMP
(encode_bmp/decode_bmp below — headers, palette, bottom-up rows,
stride padding), RIFF/WAVE PCM (the stdlib ``wave`` module), and
RIFF/AVI video (encode_avi/parse_avi below — avih/strl headers, movi
frame chunks, idx1 index), all driven end-to-end and
oracle-hash-checked (m_multimodal_features / m_audio_decode /
m_video_decode). Compressed formats (PNG/JPEG/MP3/...) need codec
libraries absent from this container — ``decode_image`` raises a
documented NotImplementedError for those; everything Spark-side
(schema, binary columns, metadata struct, UDF signature, batching,
partitioning) is identical whichever decoder is plugged in.
"""

from __future__ import annotations

import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def decode_image(payload: bytes, fmt: str) -> dict:
    """Image decoder. ``raw`` (byte i = pixel i) and ``bmp`` (real
    8-bit BMP, decoded by the pure-stdlib parser below) work offline;
    anything else needs a codec library that is not in this
    container."""
    if fmt == "bmp":
        width, height, pixels = decode_bmp(payload)
        return {
            "n_bytes": len(pixels),
            "checksum": zlib.crc32(pixels),
            "mean_pixel": (sum(pixels) / len(pixels)) if pixels else 0.0,
            "width": width,
            "height": height,
        }
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


def encode_bmp(pixels: bytes, width: int) -> bytes:
    """8-bit grayscale BMP (BITMAPINFOHEADER + 256-entry palette), the
    layout every image library reads: rows bottom-up, each padded to a
    4-byte boundary, palette entry i = (i, i, i, 0). The last row is
    zero-filled if len(pixels) is not a multiple of width."""
    import struct

    if width <= 0:
        raise ValueError("width must be positive")
    height = max(1, -(-len(pixels) // width))
    stride = (width + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    rows = []
    for r in range(height):
        row = pixels[r * width : (r + 1) * width]
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(reversed(rows))  # bottom-up
    off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(data), 2835, 2835, 256, 0
    )
    return header + info + palette + data


def decode_bmp(buf: bytes) -> tuple[int, int, bytes]:
    """Parse an uncompressed 8-bit BMP → (width, height, row-major
    pixel bytes, padding stripped). Rejects depths/compressions this
    parser does not implement, loudly."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if hdr_size < 40 or planes != 1 or bpp != 8 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    stride = (width + 3) & ~3
    rows = [
        buf[data_off + r * stride : data_off + r * stride + width] for r in range(height)
    ]
    if bottom_up:
        rows.reverse()
    return width, height, b"".join(rows)


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


_BMP_WIDTH = 32


@query(
    "m_multimodal_features",
    oracle=f"""
SELECT doc_id,
       {_BMP_WIDTH} AS width,
       greatest((octet_length(encode(text)) + {_BMP_WIDTH - 1}) // {_BMP_WIDTH}, 1)
         AS height,
       greatest((octet_length(encode(text)) + {_BMP_WIDTH - 1}) // {_BMP_WIDTH}, 1)
         * {_BMP_WIDTH} - octet_length(encode(text)) AS n_pad,
       sha256(text) AS payload_sha
FROM documents
""",
)
def m_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary media via mapInPandas: each
    document's payload bytes are wrapped in a REAL 8-bit BMP
    (encode_bmp, pure stdlib), the batch is decoded back by the real
    parser (decode_bmp: header fields, palette, bottom-up rows, stride
    padding), and the features come from the DECODED image — one Arrow
    batch in, one feature frame out, the exact plumbing a PIL/ffmpeg
    featurizer plugs into.  The oracle independently derives the image
    geometry from byte counts and pins byte-exact pixel recovery with
    sha256 (decoded pixels == original payload), so the full
    encode→decode cycle is hash-checked, not just executed.  Scale:
    pure narrow map — no shuffle, media bytes never leave their
    partition."""
    d = with_payload(load_table(spark, sf_dir, "documents"))

    def extract(iter_pdf):
        import hashlib

        for pdf in iter_pdf:
            doc_ids, widths, heights, pads, shas = [], [], [], [], []
            for doc_id, payload, meta in zip(pdf.doc_id, pdf.payload, pdf.media_meta):
                buf = bytes(payload)
                width, height, pixels = decode_bmp(encode_bmp(buf, _BMP_WIDTH))
                if pixels[: len(buf)] != buf:
                    raise ValueError(f"BMP round-trip corrupted doc {doc_id}")
                doc_ids.append(doc_id)
                widths.append(width)
                heights.append(height)
                pads.append(len(pixels) - len(buf))
                shas.append(hashlib.sha256(pixels[: len(buf)]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "width": widths,
                    "height": heights,
                    "n_pad": pads,
                    "payload_sha": shas,
                }
            )

    return d.mapInPandas(
        extract, "doc_id long, width int, height long, n_pad long, payload_sha string"
    )


_AHASH_CELLS = 64
_AHASH_COARSE = 16


def _ahash_bits(pixels: bytes, cells: int) -> int:
    """Average-hash over a decoded pixel raster: the buffer is cut into
    ``cells`` equal integer-boundary segments; bit k fires when segment
    k's mean exceeds the global mean.  The compare is the exact integer
    cross-product ``seg_sum * n_pixels > total_sum * seg_len`` — no
    float mean, no rounding, so the oracle reproduces every bit."""
    n = len(pixels)
    tot = sum(pixels)
    bits = 0
    for k in range(cells):
        lo, hi = k * n // cells, (k + 1) * n // cells
        if hi > lo and sum(pixels[lo:hi]) * n > tot * (hi - lo):
            bits |= 1 << k
    return bits


@query(
    "m_image_ahash",
    oracle=f"""
WITH pxl AS (
  SELECT doc_id,
         greatest((octet_length(encode(text)) + {_BMP_WIDTH - 1}) // {_BMP_WIDTH}, 1)
           * {_BMP_WIDTH} AS n,
         octet_length(encode(text)) AS len,
         list_transform(
           generate_series(1, greatest((octet_length(encode(text)) + {_BMP_WIDTH - 1})
                                       // {_BMP_WIDTH}, 1) * {_BMP_WIDTH}),
           p -> CASE WHEN p <= octet_length(encode(text))
                     THEN ascii(substring(text, CAST(p AS INT), 1)) ELSE 0 END) AS px
  FROM documents
),
bits AS (
  SELECT doc_id, n,
         list_sum(px) AS tot,
         list_transform(generate_series(0, {_AHASH_CELLS - 1}),
           k -> coalesce(list_sum(px[CAST(k * n // {_AHASH_CELLS} + 1 AS BIGINT)
                                      : CAST((k + 1) * n // {_AHASH_CELLS} AS BIGINT)]), 0)) AS cs64,
         list_transform(generate_series(0, {_AHASH_COARSE - 1}),
           k -> coalesce(list_sum(px[CAST(k * n // {_AHASH_COARSE} + 1 AS BIGINT)
                                      : CAST((k + 1) * n // {_AHASH_COARSE} AS BIGINT)]), 0)) AS cs16
  FROM pxl
),
b2 AS (
  SELECT doc_id,
         list_transform(generate_series(0, {_AHASH_CELLS - 1}),
           k -> CASE WHEN cs64[k + 1] * n >
                          tot * ((k + 1) * n // {_AHASH_CELLS} - k * n // {_AHASH_CELLS})
                     THEN 1 ELSE 0 END) AS b64,
         list_transform(generate_series(0, {_AHASH_COARSE - 1}),
           k -> CASE WHEN cs16[k + 1] * n >
                          tot * ((k + 1) * n // {_AHASH_COARSE} - k * n // {_AHASH_COARSE})
                     THEN 1 ELSE 0 END) AS b16
  FROM bits
),
hashed AS (
  SELECT doc_id,
         array_to_string(list_transform(generate_series(0, 15),
           j -> substring('0123456789abcdef',
                  1 + b64[4 * (15 - j) + 1] + 2 * b64[4 * (15 - j) + 2]
                    + 4 * b64[4 * (15 - j) + 3] + 8 * b64[4 * (15 - j) + 4], 1)), '')
           AS ahash_hex,
         CAST(list_sum(list_transform(generate_series(0, {_AHASH_COARSE - 1}),
           k -> b16[k + 1] * (1 << k))) AS BIGINT) AS ahash16
  FROM b2
)
SELECT h.doc_id, h.ahash_hex, h.ahash16,
       COUNT(*) OVER (PARTITION BY h.ahash_hex) AS n_dup64,
       COUNT(*) OVER (PARTITION BY h.ahash16) AS n_bucket16
FROM hashed h
""",
)
def m_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate hashing over the REAL codec: each payload
    rides the encode_bmp→decode_bmp cycle and an average-hash (aHash)
    is computed from the DECODED raster — 64 fine bits as the dup
    fingerprint (4 docs collide at sf0.01, 71 at sf0.1 — measured,
    non-vacuous) and a 16-bit coarse hash as the LSH-style candidate
    bucket (314/500 docs share a bucket at sf0.01).  Every bit is the
    exact integer cross-product ``seg_sum * n > tot * seg_len`` (no
    float means), so the DuckDB oracle reproduces the full hex
    fingerprint from the raw bytes.  Scale: the hash is a narrow
    Arrow-batched map (media bytes never leave their partition); the
    collision counts are two hash-partitioned window counts on 8- and
    2-byte keys — the exact pre-dedup shape for a billion-image
    corpus, where only bucket-colliding candidates proceed to pixel
    comparison."""
    from pyspark.sql import Window

    d = with_payload(load_table(spark, sf_dir, "documents"))

    def kern(iter_pdf):
        for pdf in iter_pdf:
            ids, hexes, coarse = [], [], []
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                buf = bytes(payload)
                _, _, pixels = decode_bmp(encode_bmp(buf, _BMP_WIDTH))
                ids.append(doc_id)
                hexes.append(format(_ahash_bits(pixels, _AHASH_CELLS), "016x"))
                coarse.append(_ahash_bits(pixels, _AHASH_COARSE))
            yield pd.DataFrame(
                {"doc_id": ids, "ahash_hex": hexes, "ahash16": coarse}
            )

    hashed = d.mapInPandas(kern, "doc_id long, ahash_hex string, ahash16 long")
    return hashed.select(
        "doc_id",
        "ahash_hex",
        "ahash16",
        F.count(F.lit(1)).over(Window.partitionBy("ahash_hex")).alias("n_dup64"),
        F.count(F.lit(1)).over(Window.partitionBy("ahash16")).alias("n_bucket16"),
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


_WAV_RATE = 16000


@query(
    "m_audio_decode",
    oracle=f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_frames,
       {_WAV_RATE} AS framerate,
       1 AS n_channels,
       1 AS sample_width,
       CAST(octet_length(encode(text)) * 1000000 // {_WAV_RATE} AS BIGINT)
         AS duration_us,
       sha256(text) AS sample_sha
FROM documents
""",
)
def m_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality twin of m_multimodal_features: each payload is
    written as a REAL RIFF/WAVE file (8-bit PCM mono, stdlib ``wave``
    writer), decoded back by the stdlib ``wave`` reader, and the
    features (frame count, rate, channels, sample width, integer-µs
    duration, sample bytes) come from the DECODED audio.  The oracle
    re-derives every feature from byte counts and pins byte-exact
    sample recovery with sha256.  Duration is fixed-point integer µs
    (frames·1e6 div rate) — never a rounded float ratio (hashsafe
    rules).  Scale: narrow map, no shuffle."""
    import hashlib
    import io
    import wave

    d = with_payload(load_table(spark, sf_dir, "documents"))

    def extract(iter_pdf):
        for pdf in iter_pdf:
            out = {
                "doc_id": [], "n_frames": [], "framerate": [], "n_channels": [],
                "sample_width": [], "duration_us": [], "sample_sha": [],
            }
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                buf = bytes(payload)
                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(_WAV_RATE)
                    w.writeframes(buf)
                bio.seek(0)
                with wave.open(bio, "rb") as r:
                    frames = r.readframes(r.getnframes())
                    out["doc_id"].append(doc_id)
                    out["n_frames"].append(r.getnframes())
                    out["framerate"].append(r.getframerate())
                    out["n_channels"].append(r.getnchannels())
                    out["sample_width"].append(r.getsampwidth())
                    out["duration_us"].append(r.getnframes() * 1_000_000 // _WAV_RATE)
                    out["sample_sha"].append(hashlib.sha256(frames).hexdigest())
            yield pd.DataFrame(out)

    return d.mapInPandas(
        extract,
        "doc_id long, n_frames long, framerate int, n_channels int,"
        " sample_width int, duration_us long, sample_sha string",
    )


_ENERGY_WIN = 160  # 10 ms @ 16 kHz — the standard speech frame


@query(
    "m_audio_energy",
    oracle=f"""
WITH sq AS (
  SELECT doc_id, generate_subscripts(l, 1) AS p, unnest(l) AS s
  FROM (SELECT doc_id,
               list_transform(generate_series(1, octet_length(encode(text))),
                 p -> (ascii(substring(text, CAST(p AS INT), 1)) - 128)
                      * (ascii(substring(text, CAST(p AS INT), 1)) - 128)) AS l
        FROM documents)
),
wins AS (
  SELECT doc_id, (p - 1) // {_ENERGY_WIN} AS win, CAST(SUM(s) AS BIGINT) AS energy
  FROM sq GROUP BY doc_id, (p - 1) // {_ENERGY_WIN}
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_win,
         CAST(SUM(energy) AS BIGINT) AS total_energy
  FROM wins GROUP BY doc_id
),
peak AS (
  SELECT doc_id, win AS peak_win, energy AS peak_energy FROM (
    SELECT doc_id, win, energy,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY energy DESC, win ASC) AS rn
    FROM wins) t WHERE rn = 1
)
SELECT a.doc_id, a.n_win, a.total_energy, p.peak_win, p.peak_energy
FROM agg a JOIN peak p USING (doc_id)
""",
)
def m_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-energy extraction over the REAL audio codec: each payload
    rides the stdlib wave writer/reader cycle (8-bit PCM mono @
    {16000} Hz, the m_audio_decode path) and per-{160}-sample frame
    (10 ms) energies are computed from the DECODED samples —
    sum((s-128)^2) per frame, the peak frame (argmax, ties to the
    earliest — the loudest 10 ms, what a VAD or loudness normalizer
    keys on), and the total.  All energies are exact BIGINT sums of
    squares of centered samples, so the oracle re-derives every value
    from the raw bytes.  Scale: narrow Arrow-batched map (samples
    never leave their partition) + per-doc frame reduction inside the
    kernel — no shuffle at all beyond the final projection."""
    import io
    import wave

    import numpy as np

    d = with_payload(load_table(spark, sf_dir, "documents"))

    def kern(iter_pdf):
        for pdf in iter_pdf:
            out = {
                "doc_id": [], "n_win": [], "total_energy": [],
                "peak_win": [], "peak_energy": [],
            }
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                buf = bytes(payload)
                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(_WAV_RATE)
                    w.writeframes(buf)
                bio.seek(0)
                with wave.open(bio, "rb") as r:
                    frames = r.readframes(r.getnframes())
                s = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
                sq = s * s
                n_win = -(-len(sq) // _ENERGY_WIN)
                if n_win == 0:
                    # mirror the oracle: a zero-sample payload produces
                    # NO row (the position explode is empty), rather
                    # than crashing max() on an empty range
                    continue
                energies = [
                    int(sq[k * _ENERGY_WIN : (k + 1) * _ENERGY_WIN].sum())
                    for k in range(n_win)
                ]
                peak = max(range(n_win), key=lambda k: (energies[k], -k))
                out["doc_id"].append(doc_id)
                out["n_win"].append(n_win)
                out["total_energy"].append(int(sq.sum()))
                out["peak_win"].append(peak)
                out["peak_energy"].append(energies[peak])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        kern,
        "doc_id long, n_win long, total_energy long, peak_win long, peak_energy long",
    )


# ---- minimal AVI (RIFF) container codec — video twin of the BMP/WAV
# codecs above. Public format: Microsoft AVI RIFF spec ('AVI ' form:
# hdrl LIST with avih + one 'vids' strl, movi LIST of uncompressed
# '00db' DIB frames, idx1 index). Pure stdlib, unit-tested round-trip.

_AVI_W, _AVI_H = 4, 4            # 24bpp → stride 12 (DWORD-aligned), 48 B/frame
_AVI_FRAME_BYTES = _AVI_W * _AVI_H * 3
_AVI_USEC = 40000                # 25 fps


def encode_avi(frames: list, width: int = _AVI_W, height: int = _AVI_H,
               usec_per_frame: int = _AVI_USEC) -> bytes:
    """Serialize raw 24bpp DIB frames into a spec-minimal AVI file."""
    import struct

    fb = width * height * 3
    for f in frames:
        if len(f) != fb:
            raise ValueError(f"frame must be {fb} bytes, got {len(f)}")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""  # RIFF word alignment
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    # rate is DERIVED from usec_per_frame (dwScale=usec_per_frame,
    # dwRate=1e6 → rate/scale = frames/sec exactly), and
    # dwMaxBytesPerSec from the same rate — a non-default frame
    # duration used to get self-inconsistent hardcoded 25 fps headers
    # (ADVICE r6).
    max_bps = (fb * 1_000_000) // usec_per_frame
    avih = struct.pack(
        "<14I", usec_per_frame, max_bps, 0, 0x10, len(frames), 0, 1, fb,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"DIB ", 0, 0, 0, 0, usec_per_frame, 1_000_000, 0,
        len(frames), fb, -1, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fb, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(b"00db", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    idx, off = [], 4  # offsets relative to the start of 'movi' fourcc
    for f in frames:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(buf: bytes):
    """Parse the container back: returns (header dict, [frame bytes]).
    Walks the real chunk structure (sizes + RIFF pad rule) — a wrong
    chunk size, a missing LIST, or an idx1/frame-count mismatch
    raises, so the round-trip genuinely exercises the format."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def walk(data: bytes):
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + size > len(data):
                # Python slicing clamps silently — a corrupted declared
                # size would yield SHORT frame bytes instead of the
                # promised raise (ADVICE r6)
                raise ValueError(
                    f"chunk {fourcc!r} declares {size} bytes at offset "
                    f"{pos} but only {len(data) - pos - 8} remain"
                )
            payload = data[pos + 8 : pos + 8 + size]
            yield fourcc, payload
            pos += 8 + size + (size % 2)

    hdr: dict = {}
    frames: list = []
    n_idx = 0
    for fourcc, payload in walk(buf[12:]):
        if fourcc == b"LIST" and payload[:4] == b"hdrl":
            for f2, p2 in walk(payload[4:]):
                if f2 == b"avih":
                    v = struct.unpack("<14I", p2)
                    hdr = {
                        "usec_per_frame": v[0], "n_frames": v[4],
                        "width": v[8], "height": v[9],
                    }
        elif fourcc == b"LIST" and payload[:4] == b"movi":
            frames = [p for f2, p in walk(payload[4:]) if f2 == b"00db"]
        elif fourcc == b"idx1":
            n_idx = len(payload) // 16
    if not hdr:
        raise ValueError("missing avih header")
    if len(frames) != hdr["n_frames"] or n_idx != hdr["n_frames"]:
        raise ValueError(
            f"frame count mismatch: avih={hdr['n_frames']} "
            f"movi={len(frames)} idx1={n_idx}"
        )
    return hdr, frames


@query(
    "m_video_decode",
    oracle=f"""
SELECT doc_id,
       {_AVI_W} AS width,
       {_AVI_H} AS height,
       CAST(octet_length(encode(text)) // {_AVI_FRAME_BYTES} AS BIGINT) AS n_frames,
       {_AVI_USEC} AS usec_per_frame,
       CAST((octet_length(encode(text)) // {_AVI_FRAME_BYTES}) * {_AVI_USEC} AS BIGINT)
         AS duration_us,
       sha256(substring(text, 1,
         CAST((octet_length(encode(text)) // {_AVI_FRAME_BYTES}) * {_AVI_FRAME_BYTES} AS INT)))
         AS frames_sha
FROM documents
""",
)
def m_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-modality member of the codec triad (BMP image / WAV audio
    / AVI video — all REAL containers, pure stdlib): each payload's
    full {_AVI_FRAME_BYTES}-byte frames are packed into a spec-minimal
    AVI (RIFF 'AVI ': avih + vids strl, movi '00db' DIB frames, idx1),
    parsed back by walking the actual chunk structure (sizes, word
    padding, index/frame-count cross-check), and the features come
    from the DECODED container.  The oracle re-derives frame count and
    integer-µs duration from byte lengths and pins byte-exact frame
    recovery with sha256 over the full-frame prefix (corpus text is
    ASCII: char slicing == byte slicing, per the working notes).
    width/height/usec are fixture constants by design (same class as
    m_audio_decode's framerate — the variation lives in n_frames and
    the recovered bytes).  Scale: narrow map, no shuffle; a real
    ffmpeg-backed sampler swaps into the same mapInPandas seam."""
    import hashlib

    d = with_payload(load_table(spark, sf_dir, "documents"))

    def extract(iter_pdf):
        for pdf in iter_pdf:
            out = {
                "doc_id": [], "width": [], "height": [], "n_frames": [],
                "usec_per_frame": [], "duration_us": [], "frames_sha": [],
            }
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                buf = bytes(payload)
                n = len(buf) // _AVI_FRAME_BYTES
                frames = [
                    buf[i * _AVI_FRAME_BYTES : (i + 1) * _AVI_FRAME_BYTES]
                    for i in range(n)
                ]
                hdr, back = parse_avi(encode_avi(frames))
                out["doc_id"].append(doc_id)
                out["width"].append(hdr["width"])
                out["height"].append(hdr["height"])
                out["n_frames"].append(hdr["n_frames"])
                out["usec_per_frame"].append(hdr["usec_per_frame"])
                out["duration_us"].append(hdr["n_frames"] * hdr["usec_per_frame"])
                out["frames_sha"].append(
                    hashlib.sha256(b"".join(back)).hexdigest()
                )
            yield pd.DataFrame(out)

    return d.mapInPandas(
        extract,
        "doc_id long, width int, height int, n_frames long,"
        " usec_per_frame int, duration_us long, frames_sha string",
    )
