"""Pure-Python GeoPackage reader/writer (producer-side parity: the
reference ingests any OGR vector layer; GPKG is the last mainstream
OGR on-disk format without an offline path in — VERDICT r04 item 4).

GeoPackage (OGC 12-128r18, public spec) is an SQLite 3 database, so
the stdlib ``sqlite3`` module reads it without GDAL. This implements
the vector-features subset:

- ``gpkg_contents`` rows with ``data_type = 'features'`` enumerate the
  layers; ``gpkg_geometry_columns`` names each layer's geometry column
  and SRS id.
- Geometry cells hold *GeoPackageBinary*: a small header (magic
  ``GP``, version, flags, srs_id, optional envelope) followed by
  standard ISO WKB — which this repo already codecs (spatial.wkb), so
  the payload converts by stripping/prepending the header.

Flags byte (spec table 7): bit 0 = header byte order (1 = little
endian), bits 1-3 = envelope indicator (0 none, 1 XY 32 B, 2/3 XYZ/XYM
48 B, 4 XYZM 64 B), bit 4 = empty-geometry flag, bit 5 = extension
flag (rejected loudly — extension encodings are not plain WKB).

Everything is driver-side file parsing (a producer CLI concern, like
the GeoJSON/Shapefile readers); the distributed path starts after
envelopes are published to a topic.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from collections.abc import Iterator

from ..spatial.wkb import decode_wkb, encode_wkb

_ENVELOPE_SIZES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def parse_gpkg_blob(blob: bytes):
    """GeoPackageBinary → this repo's geometry tuple (or None for an
    empty geometry). Raises ValueError on a malformed or extension
    (non-WKB) encoding."""
    if blob is None:
        return None
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (missing GP magic)")
    version, flags = blob[2], blob[3]
    if version != 0:
        raise ValueError(f"unsupported GeoPackageBinary version {version}")
    if flags & 0b100000:
        raise ValueError("ExtendedGeoPackageBinary payloads are not plain WKB")
    env_ind = (flags >> 1) & 0b111
    if env_ind not in _ENVELOPE_SIZES:
        raise ValueError(f"invalid envelope indicator {env_ind}")
    if flags & 0b10000:  # empty-geometry flag
        return None
    off = 8 + _ENVELOPE_SIZES[env_ind]
    return decode_wkb(blob[off:])


def make_gpkg_blob(geom, srid: int = 4326) -> bytes:
    """Geometry tuple → GeoPackageBinary (little-endian header, no
    envelope — envelopes are an optional read optimization)."""
    header = b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", srid)
    return header + encode_wkb(geom)


def gpkg_layers(path: str) -> list[str]:
    """Feature-layer names registered in gpkg_contents."""
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            " ORDER BY table_name"
        ).fetchall()
    return [r[0] for r in rows]


def read_gpkg(path: str, layer: str | None = None) -> Iterator[tuple]:
    """Yield ``(geom_tuple_or_None, props_dict, srid)`` for every row
    of ``layer`` (default: the only feature layer; ambiguous if the
    file has several)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with sqlite3.connect(path) as con:
        if layer is None:
            layers = gpkg_layers(path)
            if len(layers) != 1:
                raise ValueError(
                    f"{path} has {len(layers)} feature layers {layers}; pass layer="
                )
            layer = layers[0]
        meta = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns"
            " WHERE table_name = ?",
            (layer,),
        ).fetchone()
        if meta is None:
            raise ValueError(f"layer {layer!r} not in gpkg_geometry_columns")
        geom_col, srs_id = meta
        # quoted identifier: layer names come from the gpkg metadata
        # tables, not user SQL, but quote anyway
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        for row in cur:
            rec = dict(zip(names, row))
            blob = rec.pop(geom_col, None)
            geom = parse_gpkg_blob(blob) if blob is not None else None
            yield geom, rec, int(srs_id)


def write_gpkg(
    path: str,
    layer: str,
    features: list[tuple],
    srid: int = 4326,
    geom_type: str = "GEOMETRY",
) -> None:
    """Write ``[(geom_tuple, props), ...]`` as a minimal spec-conformant
    GeoPackage: gpkg_spatial_ref_sys + gpkg_contents +
    gpkg_geometry_columns + one feature table with an integer pk.
    Property keys are unioned across features (missing → NULL), mirroring
    write_shapefile. Exists to round-trip-test the reader offline."""
    if os.path.exists(path):
        os.remove(path)
    keys: list[str] = []
    for _, props in features:
        for k in props:
            if k not in keys:
                keys.append(k)
    with sqlite3.connect(path) as con:
        con.executescript(
            """
            PRAGMA application_id = 0x47504B47;  -- 'GPKG'
            PRAGMA user_version = 10300;         -- GeoPackage 1.3
            CREATE TABLE gpkg_spatial_ref_sys (
              srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
              organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
              definition TEXT NOT NULL, description TEXT);
            CREATE TABLE gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
              identifier TEXT UNIQUE, description TEXT DEFAULT '',
              last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
              min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
              srs_id INTEGER);
            CREATE TABLE gpkg_geometry_columns (
              table_name TEXT NOT NULL, column_name TEXT NOT NULL,
              geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
              z TINYINT NOT NULL, m TINYINT NOT NULL,
              CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
            """
        )
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            (f"EPSG:{srid}", srid, "EPSG", srid, "undefined", None),
        )
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id)"
            " VALUES (?, 'features', ?, ?)",
            (layer, layer, srid),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (layer, geom_type, srid),
        )
        cols = ", ".join(f'"{k}"' for k in keys)
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT,'
            f" geom BLOB{', ' + cols if keys else ''})"
        )
        ph = ", ".join("?" for _ in range(1 + len(keys)))
        con.executemany(
            f'INSERT INTO "{layer}" (geom{", " + cols if keys else ""}) VALUES ({ph})',
            [
                (make_gpkg_blob(g, srid) if g is not None else None,)
                + tuple(props.get(k) for k in keys)
                for g, props in features
            ],
        )
        con.commit()
