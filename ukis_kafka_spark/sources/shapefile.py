"""Pure-Python ESRI Shapefile reader/writer (producer-side parity:
the reference ingests any OGR vector layer; offline this covers the
most common on-disk interchange format without GDAL).

Implements the subset of the public ESRI whitepaper ("ESRI Shapefile
Technical Description", 1998) that flat 2-D vector layers use:

- ``.shp``  geometry: Null (0), Point (1), PolyLine (3), Polygon (5),
  MultiPoint (8). Z/M variants are rejected loudly.
- ``.dbf``  attributes: dBASE III fixed-width records, field types
  C (text), N/F (numeric), L (logical), D (date as YYYYMMDD text).
- ``.shx``  is ignored on read (records are parsed sequentially) and
  written on write (fixed-size index derived from the records).

Geometries convert straight into this repo's WKB geometry tuples
(spatial.wkb): PolyLine with one part → LINESTRING, several parts →
MULTILINESTRING; Polygon rings are regrouped by ring orientation
(clockwise = outer per the spec) into POLYGON / MULTIPOLYGON.

Everything is driver-side file parsing (a producer CLI concern, like
the GeoJSON reader); the distributed path starts after envelopes are
published to a topic.
"""

from __future__ import annotations

import datetime as _dt
import os
import struct
from collections.abc import Iterator

_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5
_SHAPE_MULTIPOINT = 8
_SUPPORTED = {0, _SHAPE_POINT, _SHAPE_POLYLINE, _SHAPE_POLYGON, _SHAPE_MULTIPOINT}


def _ring_is_clockwise(ring: tuple) -> bool:
    """Signed shoelace area; clockwise (negative area) marks an outer
    ring in shapefile convention."""
    area2 = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        area2 += x1 * y2 - x2 * y1
    return area2 < 0


def _regroup_polygon_rings(rings: list[tuple]) -> tuple:
    """Shapefile polygons store all rings of all polygons flat; outer
    rings are clockwise, holes counter-clockwise and follow their
    outer. Regroup into the WKB nesting."""
    polys: list[list[tuple]] = []
    for ring in rings:
        if _ring_is_clockwise(ring) or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if len(polys) == 1:
        return ("POLYGON", tuple(polys[0]))
    return ("MULTIPOLYGON", tuple(tuple(p) for p in polys))


def _parse_shape(shape_type: int, content: bytes):
    """One record's geometry → WKB geometry tuple (or None for Null)."""
    if shape_type == 0:
        return None
    if shape_type == _SHAPE_POINT:
        x, y = struct.unpack_from("<2d", content, 0)
        return ("POINT", (x, y))
    if shape_type == _SHAPE_MULTIPOINT:
        (n,) = struct.unpack_from("<i", content, 32)
        pts = struct.unpack_from(f"<{2 * n}d", content, 36)
        return ("MULTIPOINT", tuple((pts[2 * i], pts[2 * i + 1]) for i in range(n)))
    if shape_type in (_SHAPE_POLYLINE, _SHAPE_POLYGON):
        n_parts, n_points = struct.unpack_from("<2i", content, 32)
        parts = struct.unpack_from(f"<{n_parts}i", content, 40)
        coords = struct.unpack_from(f"<{2 * n_points}d", content, 40 + 4 * n_parts)
        bounds = list(parts) + [n_points]
        rings = [
            tuple(
                (coords[2 * i], coords[2 * i + 1])
                for i in range(bounds[k], bounds[k + 1])
            )
            for k in range(n_parts)
        ]
        if shape_type == _SHAPE_POLYLINE:
            if len(rings) == 1:
                return ("LINESTRING", rings[0])
            return ("MULTILINESTRING", tuple(rings))
        return _regroup_polygon_rings(rings)
    raise ValueError(f"unsupported shapefile shape type {shape_type} (Z/M not handled)")


def read_shp(path: str) -> Iterator[tuple]:
    """Yield WKB geometry tuples from a ``.shp`` in record order (Null
    shapes yield None so records stay aligned with ``.dbf`` rows)."""
    with open(path, "rb") as fh:
        header = fh.read(100)
        if len(header) < 100 or struct.unpack_from(">i", header, 0)[0] != 9994:
            raise ValueError(f"{path}: not a shapefile (bad magic)")
        file_type = struct.unpack_from("<i", header, 32)[0]
        if file_type not in _SUPPORTED:
            raise ValueError(f"{path}: unsupported shape type {file_type} (Z/M not handled)")
        while True:
            rec_header = fh.read(8)
            if len(rec_header) < 8:
                return
            _, content_words = struct.unpack(">2i", rec_header)
            content = fh.read(content_words * 2)
            (shape_type,) = struct.unpack_from("<i", content, 0)
            yield _parse_shape(shape_type, content[4:])


def read_dbf(path: str) -> Iterator[dict]:
    """Yield one properties dict per (non-deleted) dBASE III record;
    values come back as str/int/float/bool/date-iso-str/None."""
    with open(path, "rb") as fh:
        header = fh.read(32)
        n_records, header_size, record_size = struct.unpack_from("<IHH", header, 4)
        fields = []
        while True:
            desc = fh.read(32)
            if desc[0:1] == b"\x0d":
                break
            name = desc[0:11].split(b"\x00", 1)[0].decode("ascii")
            ftype = desc[11:12].decode("ascii")
            flen = desc[16]
            fdec = desc[17]
            fields.append((name, ftype, flen, fdec))
        fh.seek(header_size)
        for _ in range(n_records):
            raw = fh.read(record_size)
            if len(raw) < record_size or raw[0:1] == b"*":  # deleted
                continue
            pos = 1
            rec: dict = {}
            for name, ftype, flen, fdec in fields:
                cell = raw[pos : pos + flen]
                pos += flen
                text = cell.decode("ascii", errors="replace").strip()
                if text == "":
                    rec[name] = None
                elif ftype in ("N", "F"):
                    rec[name] = float(text) if (fdec > 0 or "." in text) else int(text)
                elif ftype == "L":
                    rec[name] = text in "TtYy"
                elif ftype == "D":
                    rec[name] = f"{text[0:4]}-{text[4:6]}-{text[6:8]}"
                else:
                    rec[name] = text
            yield rec


def read_shapefile(shp_path: str) -> Iterator[tuple]:
    """Yield ``(geom_tuple, props_dict)`` pairs; properties come from
    the sibling ``.dbf`` when present, else empty dicts."""
    dbf_path = os.path.splitext(shp_path)[0] + ".dbf"
    props: Iterator[dict]
    if os.path.exists(dbf_path):
        props = read_dbf(dbf_path)
    else:
        props = iter(lambda: {}, None)  # endless empty dicts
    for geom in read_shp(shp_path):
        yield geom, next(props, {})


# ---------------------------------------------------------------------------
# Writer (fixtures, tests, and GeoJSON->shp export)


def _flatten(geom: tuple) -> tuple[int, list[tuple]]:
    """WKB geometry tuple → (shape_type, flat part list)."""
    kind, body = geom
    if kind == "POINT":
        return _SHAPE_POINT, [body]
    if kind == "MULTIPOINT":
        return _SHAPE_MULTIPOINT, [body]
    if kind == "LINESTRING":
        return _SHAPE_POLYLINE, [body]
    if kind == "MULTILINESTRING":
        return _SHAPE_POLYLINE, list(body)
    if kind == "POLYGON":
        return _SHAPE_POLYGON, list(body)
    if kind == "MULTIPOLYGON":
        return _SHAPE_POLYGON, [ring for poly in body for ring in poly]
    raise ValueError(f"cannot write geometry kind {kind} to shapefile")


def _record_bytes(shape_type: int, parts: list[tuple]) -> bytes:
    if shape_type == _SHAPE_POINT:
        ((x, y),) = parts
        return struct.pack("<i2d", shape_type, x, y)
    pts = [p for part in parts for p in part]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    bbox = struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    if shape_type == _SHAPE_MULTIPOINT:
        body = struct.pack("<i", len(pts))
    else:
        offs, acc = [], 0
        for part in parts:
            offs.append(acc)
            acc += len(part)
        body = struct.pack(f"<2i{len(parts)}i", len(parts), len(pts), *offs)
    coords = struct.pack(f"<{2 * len(pts)}d", *[c for p in pts for c in p])
    return struct.pack("<i", shape_type) + bbox + body + coords


def write_shapefile(shp_path: str, features: list[tuple]) -> None:
    """Write ``(geom_tuple, props_dict)`` features as .shp + .shx +
    .dbf (all geometries must share one shape type, as the format
    requires). Numeric props become N fields (18.6), everything else
    C(64) text."""
    geoms = [g for g, _ in features]
    all_props = [p or {} for _, p in features]
    types = {_flatten(g)[0] for g in geoms}
    if len(types) != 1:
        raise ValueError(f"shapefile layers hold ONE shape type, got {sorted(types)}")
    (shape_type,) = types

    records = [_record_bytes(*_flatten(g)) for g in geoms]
    # bbox over every coordinate of every part (POINT parts are a bare
    # coordinate pair, everything else tuples of pairs)
    all_pts = [
        p
        for g in geoms
        for part in _flatten(g)[1]
        for p in (part if isinstance(part[0], tuple) else [part])
    ]
    bx = [p[0] for p in all_pts]
    by = [p[1] for p in all_pts]
    file_words = (100 + sum(8 + len(r) for r in records)) // 2
    header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, file_words
    ) + struct.pack("<ii8d", 1000, shape_type, min(bx), min(by), max(bx), max(by), 0, 0, 0, 0)
    with open(shp_path, "wb") as fh:
        fh.write(header)
        for i, rec in enumerate(records):
            fh.write(struct.pack(">2i", i + 1, len(rec) // 2))
            fh.write(rec)
    # .shx: same header (its own length), then (offset, length) per record
    shx_path = os.path.splitext(shp_path)[0] + ".shx"
    with open(shx_path, "wb") as fh:
        shx_words = (100 + 8 * len(records)) // 2
        fh.write(header[:24] + struct.pack(">i", shx_words) + header[28:])
        off = 50
        for rec in records:
            fh.write(struct.pack(">2i", off, len(rec) // 2))
            off += 4 + len(rec) // 2
    _write_dbf(os.path.splitext(shp_path)[0] + ".dbf", all_props)


def _write_dbf(path: str, all_props: list[dict]) -> None:
    names: list[str] = []
    for p in all_props:
        for k in p:
            if k not in names:
                names.append(k)
    fields = []
    for name in names:
        vals = [p.get(name) for p in all_props]
        numeric = all(v is None or isinstance(v, (int, float)) for v in vals)
        fields.append((name[:10], "N", 18, 6) if numeric else (name[:10], "C", 64, 0))
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    today = _dt.date(2024, 1, 1)  # fixed: byte-reproducible fixtures
    with open(path, "wb") as fh:
        fh.write(
            struct.pack(
                "<4BIHH20x",
                0x03,
                today.year - 1900,
                today.month,
                today.day,
                len(all_props),
                header_size,
                record_size,
            )
        )
        for name, ftype, flen, fdec in fields:
            fh.write(
                struct.pack(
                    "<11sc4xBB14x", name.encode("ascii"), ftype.encode("ascii"), flen, fdec
                )
            )
        fh.write(b"\x0d")
        for p in all_props:
            fh.write(b" ")
            for name, ftype, flen, fdec in fields:
                v = p.get(name)
                if v is None:
                    cell = b" " * flen
                elif ftype == "N":
                    cell = f"{float(v):>{flen}.{fdec}f}".encode("ascii")[:flen]
                else:
                    cell = f"{v:<{flen}}".encode("ascii", errors="replace")[:flen]
                fh.write(cell)
        fh.write(b"\x1a")
