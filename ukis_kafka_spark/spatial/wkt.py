"""Pure-Python WKT (well-known text) codec over the same geometry
model as :mod:`ukis_kafka_spark.spatial.wkb`.

Reference parity: ukis_kafka's producer ingests any OGR-readable
vector layer (Shapefile/GPKG/GeoJSON/...). OGR is unavailable offline,
so the ingestion surface here is the library-free common denominator:
GeoJSON (cli produce) and WKT — the text twin of WKB, emitted by every
spatial database and by ``ogr2ogr -f CSV -lco GEOMETRY=AS_WKT``, which
makes CSV-with-WKT the practical bridge format off any OGR source.

Coordinates survive a format → parse round trip bit-exactly: numbers
are emitted with ``repr`` (shortest float repr) and parsed with
``float``, which is a lossless pair for IEEE doubles.

Geometry model (shared with the WKB codec): nested tuples —
  Point:       ("POINT", (x, y))
  LineString:  ("LINESTRING", ((x, y), ...))
  Polygon:     ("POLYGON", (ring, ...)) where ring = ((x, y), ...)
  Multi*:      ("MULTIPOINT"|..., (member_geom_body, ...))
"""

from __future__ import annotations

import re

from .wkb import Geometry

_TYPES = {
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
}

_TOKEN = re.compile(r"\(|\)|,|[^\s(),]+")


def _fmt_pair(pt) -> str:
    x, y = pt
    return f"{float(x)!r} {float(y)!r}"


def format_wkt(geom: Geometry) -> str:
    """Emit canonical WKT; coordinates use shortest-repr doubles."""
    gtype, body = geom
    if gtype == "POINT":
        return f"POINT ({_fmt_pair(body)})"
    if gtype == "LINESTRING":
        return "LINESTRING (" + ", ".join(_fmt_pair(p) for p in body) + ")"
    if gtype == "POLYGON":
        rings = ", ".join("(" + ", ".join(_fmt_pair(p) for p in r) + ")" for r in body)
        return f"POLYGON ({rings})"
    if gtype == "MULTIPOINT":
        return "MULTIPOINT (" + ", ".join(f"({_fmt_pair(p)})" for p in body) + ")"
    if gtype == "MULTILINESTRING":
        lines = ", ".join("(" + ", ".join(_fmt_pair(p) for p in ls) + ")" for ls in body)
        return f"MULTILINESTRING ({lines})"
    if gtype == "MULTIPOLYGON":
        polys = ", ".join(
            "(" + ", ".join("(" + ", ".join(_fmt_pair(p) for p in r) + ")" for r in poly) + ")"
            for poly in body
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(f"unsupported geometry type: {gtype}")


def _parse_group(tokens: list[str], i: int):
    """Parse one parenthesized group starting at ``tokens[i] == '('``.

    Returns (content, next_index) where content is a list whose
    elements are (x, y) coordinate pairs or nested sub-lists."""
    if i >= len(tokens) or tokens[i] != "(":
        got = tokens[i] if i < len(tokens) else "<end>"
        raise ValueError(f"expected '(' at token {i}, got {got!r}")
    i += 1
    out: list = []
    num_buf: list[float] = []

    def flush_pair():
        if num_buf:
            if len(num_buf) != 2:
                raise ValueError(f"expected 'x y' coordinate pair, got {num_buf}")
            out.append((num_buf[0], num_buf[1]))
            num_buf.clear()

    while i < len(tokens):
        t = tokens[i]
        if t == "(":
            sub, i = _parse_group(tokens, i)
            out.append(sub)
        elif t == ")":
            flush_pair()
            return out, i + 1
        elif t == ",":
            flush_pair()
            i += 1
        else:
            num_buf.append(float(t))
            i += 1
    raise ValueError("unbalanced parentheses in WKT")


def parse_wkt(s: str) -> Geometry:
    """Parse WKT text into the shared geometry tuple model.

    Accepts both MULTIPOINT spellings — ``MULTIPOINT ((1 2), (3 4))``
    and the legacy ``MULTIPOINT (1 2, 3 4)``. EMPTY geometries are
    rejected (the WKB codec has no representation for them)."""
    tokens = _TOKEN.findall(s)
    if not tokens:
        raise ValueError("empty WKT string")
    gtype = tokens[0].upper()
    if gtype not in _TYPES:
        raise ValueError(f"unsupported geometry type: {tokens[0]!r}")
    if len(tokens) > 1 and tokens[1].upper() == "EMPTY":
        raise ValueError(f"EMPTY geometry not supported: {s!r}")
    body, end = _parse_group(tokens, 1)
    if end != len(tokens):
        raise ValueError(f"trailing tokens after geometry: {tokens[end:]}")

    def pairs(items, what: str):
        if not all(isinstance(p, tuple) for p in items):
            raise ValueError(f"malformed {what}: {s!r}")
        return tuple(items)

    if gtype == "POINT":
        if len(body) != 1 or not isinstance(body[0], tuple):
            raise ValueError(f"malformed POINT: {s!r}")
        return ("POINT", body[0])
    if gtype == "LINESTRING":
        return ("LINESTRING", pairs(body, "LINESTRING"))
    if gtype == "POLYGON":
        return ("POLYGON", tuple(pairs(r, "POLYGON ring") for r in body))
    if gtype == "MULTIPOINT":
        members = []
        for m in body:
            if isinstance(m, tuple):  # legacy bare-pair spelling
                members.append(m)
            elif len(m) == 1 and isinstance(m[0], tuple):
                members.append(m[0])
            else:
                raise ValueError(f"malformed MULTIPOINT member: {s!r}")
        return ("MULTIPOINT", tuple(members))
    if gtype == "MULTILINESTRING":
        return ("MULTILINESTRING", tuple(pairs(ls, "MULTILINESTRING member") for ls in body))
    # MULTIPOLYGON
    return (
        "MULTIPOLYGON",
        tuple(tuple(pairs(r, "MULTIPOLYGON ring") for r in poly) for poly in body),
    )
