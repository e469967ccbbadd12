"""Spatial operators (SURVEY.md §2.2 "Spatial", reference parity
R4–R6: spatial filtering, geometry validation, reprojection).

The corpus has no geometry column, so each query derives deterministic
lon/lat from existing numerics *inside the query* (documented formula,
reproduced in the oracle SQL):

    lon = value * 3.6 - 180        (value ∈ [0,100) → lon ∈ [-180,180))
    lat = (user_id * 7 % 180) - 90 (integer arithmetic → exact)

Everything except point-in-polygon and the WKB codec is plain column
math inside whole-stage codegen. Transcendentals (sin/cos/ln/atan2)
are emitted rounded to 4 dp (km) / 2 dp (m): JVM Math and libm differ
by ~1 ULP, which near-pole derivative blow-up amplifies to ~1e-10
relative — far below these grids, far above anything physical.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..registry import checkpoint_df, query
from ..sources import load_table

_LON = "(value * 3.6 - 180)"
_LAT = "((user_id * 7 % 180) - 90)"


def _lon() -> Column:
    return F.col("value") * 3.6 - 180


def _lat() -> Column:
    return (F.col("user_id") * 7 % 180 - 90).cast("double")


@query(
    "g_bbox_filter",
    oracle=f"""
SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat
FROM events
WHERE {_LON} BETWEEN -10 AND 40 AND {_LAT} BETWEEN 35 AND 70
""",
)
def g_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box point filter (roughly Europe). Plain BETWEEN on
    derived coordinates — pushes to the scan like any predicate; with a
    grid-cell partition column this becomes partition pruning at scale."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", _lon().alias("lon"), _lat().alias("lat"))
        .where(F.col("lon").between(-10, 40) & F.col("lat").between(35, 70))
    )


@query(
    "g_haversine",
    oracle=f"""
SELECT event_id,
       round(2 * 6371.0088 * asin(sqrt(
         pow(sin(radians(({_LAT}) - 52.52) / 2), 2)
         + cos(radians({_LAT})) * cos(radians(52.52))
           * pow(sin(radians(({_LON}) - 13.405) / 2), 2)
       )), 4) AS dist_berlin_km
FROM events
WHERE event_type = 'purchase'
""",
)
def g_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance to Berlin (13.405 E, 52.52 N), haversine
    formula in column expressions."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    lat1 = F.radians(_lat())
    lat2 = F.radians(F.lit(52.52))
    dlat = F.radians(_lat() - F.lit(52.52))
    dlon = F.radians(_lon() - F.lit(13.405))
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    dist = F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))
    return e.select("event_id", F.round(dist, 4).alias("dist_berlin_km"))


@query(
    "g_bbox_join",
    oracle=f"""
SELECT e.event_id, z.zone_name
FROM events e
JOIN (VALUES ('europe', -10.0, 40.0, 35.0, 70.0),
             ('n_america', -130.0, -60.0, 25.0, 55.0),
             ('east_asia', 100.0, 150.0, 20.0, 50.0)) z(zone_name, lon_min, lon_max, lat_min, lat_max)
  ON {_LON} BETWEEN z.lon_min AND z.lon_max
 AND {_LAT} BETWEEN z.lat_min AND z.lat_max
""",
)
def g_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bbox-overlap theta join of points against a broadcast zone table
    (BroadcastNestedLoop — the right plan for a tiny dim; at scale, add
    a grid-cell equi-key to both sides to make it an equi join)."""
    e = load_table(spark, sf_dir, "events")
    zones = spark.createDataFrame(
        [
            ("europe", -10.0, 40.0, 35.0, 70.0),
            ("n_america", -130.0, -60.0, 25.0, 55.0),
            ("east_asia", 100.0, 150.0, 20.0, 50.0),
        ],
        "zone_name string, lon_min double, lon_max double, lat_min double, lat_max double",
    )
    pts = e.select("event_id", _lon().alias("lon"), _lat().alias("lat"))
    return pts.join(
        F.broadcast(zones),
        F.col("lon").between(F.col("lon_min"), F.col("lon_max"))
        & F.col("lat").between(F.col("lat_min"), F.col("lat_max")),
    ).select("event_id", "zone_name")


@query(
    "g_reproject",
    oracle=f"""
SELECT event_id,
       round(6378137.0 * radians({_LON}), 2) AS mercator_x,
       round(6378137.0 * ln(tan(pi() / 4 + radians({_LAT}) / 2)), 2) + 0.0 AS mercator_y
FROM events
WHERE {_LAT} BETWEEN -85 AND 85
""",
)
def g_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSG:4326 → EPSG:3857 (Web-Mercator) reprojection as exact
    column math (R6 parity: the reference shells out to PostGIS for
    this; sphere-Mercator needs no library)."""
    e = load_table(spark, sf_dir, "events")
    x = F.lit(6378137.0) * F.radians(_lon())
    y = F.lit(6378137.0) * F.log(F.tan(F.lit(3.141592653589793) / 4 + F.radians(_lat()) / 2))
    return (
        e.where(_lat().between(-85, 85))
        # + 0.0 collapses IEEE -0.0 to 0.0 (engines disagree on the
        # sign of round()'s zero at lat = 0)
        .select(
            "event_id",
            F.round(x, 2).alias("mercator_x"),
            (F.round(y, 2) + F.lit(0.0)).alias("mercator_y"),
        )
    )


# --- multi-SRID reprojection -------------------------------------------------
# Projection constants precomputed once in Python and embedded as the
# SAME double literals in the Spark expressions and the DuckDB oracle —
# cross-engine divergence can then only enter through per-row libm
# calls (~1 ULP), which the 2 dp (cm) output grid absorbs. Formulas are
# the public spherical forms from Snyder, "Map Projections — A Working
# Manual" (USGS PP 1395): transverse Mercator (UTM zones) eq. 8-5/8-6,
# Lambert conformal conic eq. 15-1..15-4.
_R_SPHERE = 6378137.0
_TM_K0R = 0.9996 * _R_SPHERE
_LCC_SP1, _LCC_SP2 = math.radians(35.0), math.radians(65.0)
_LCC_LAT0, _LCC_LON0 = math.radians(52.0), 10.0
_LCC_N = math.log(math.cos(_LCC_SP1) / math.cos(_LCC_SP2)) / math.log(
    math.tan(math.pi / 4 + _LCC_SP2 / 2) / math.tan(math.pi / 4 + _LCC_SP1 / 2)
)
_LCC_RF = _R_SPHERE * math.cos(_LCC_SP1) * math.tan(math.pi / 4 + _LCC_SP1 / 2) ** _LCC_N / _LCC_N
_LCC_RHO0 = _LCC_RF / math.tan(math.pi / 4 + _LCC_LAT0 / 2) ** _LCC_N

# the EPSG parameter table rows shared by both engines: two UTM zones
# (transverse Mercator about lon0) and one LCC for everything else
_EPSG_ROWS = [
    (32632, "tm", 9.0),
    (32633, "tm", 15.0),
    (3034, "lcc", _LCC_LON0),
]


def _epsg_route_sql() -> str:
    return (
        f"CASE WHEN {_LON} >= 6 AND {_LON} < 12 THEN 32632 "
        f"WHEN {_LON} >= 12 AND {_LON} < 18 THEN 32633 ELSE 3034 END"
    )


@query(
    "g_reproject_epsg",
    oracle=f"""
WITH params(epsg, kind, lon0) AS (
  VALUES (32632, 'tm', 9.0), (32633, 'tm', 15.0), (3034, 'lcc', {_LCC_LON0!r})
),
pts AS (
  SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat,
         {_epsg_route_sql()} AS epsg
  FROM events
  WHERE {_LAT} BETWEEN -80 AND 84
)
SELECT event_id, p.epsg,
       round(CASE WHEN kind = 'tm'
         THEN 500000.0 + {_TM_K0R!r} * 0.5
              * ln((1.0 + cos(radians(lat)) * sin(radians(lon - lon0)))
                 / (1.0 - cos(radians(lat)) * sin(radians(lon - lon0))))
         ELSE {_LCC_RF!r} / power(tan(pi() / 4 + radians(lat) / 2), {_LCC_N!r})
              * sin({_LCC_N!r} * radians(lon - lon0))
       END, 2) + 0.0 AS easting,
       round(CASE WHEN kind = 'tm'
         THEN {_TM_K0R!r} * atan(tan(radians(lat)) / cos(radians(lon - lon0)))
         ELSE {_LCC_RHO0!r} - {_LCC_RF!r} / power(tan(pi() / 4 + radians(lat) / 2), {_LCC_N!r})
              * cos({_LCC_N!r} * radians(lon - lon0))
       END, 2) + 0.0 AS northing
FROM pts p JOIN params USING (epsg)
""",
)
def g_reproject_epsg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-SRID reprojection keyed by a small EPSG parameter
    table (R6 parity beyond the fixed Web-Mercator of g_reproject: the
    reference tracks per-layer SRID and reprojects to the sink SRID).
    Each point routes to a target CRS — its UTM zone where one is
    configured, the continental Lambert conformal conic otherwise —
    then the broadcast param row drives a kind-switched projection
    expression, all JVM column math (no UDF). Adding a CRS is one row
    in the table, not new code."""
    e = load_table(spark, sf_dir, "events")
    params = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({epsg}, '{kind}', {lon0!r})" for epsg, kind, lon0 in _EPSG_ROWS)
        + " AS params(epsg, kind, lon0)"
    )
    lon, lat = F.col("lon"), F.col("lat")
    pts = (
        e.where(_lat().between(-80, 84))
        .select(
            "event_id",
            _lon().alias("lon"),
            _lat().alias("lat"),
        )
        .withColumn(
            "epsg",
            F.when((lon >= 6) & (lon < 12), 32632)
            .when((lon >= 12) & (lon < 18), 32633)
            .otherwise(3034),
        )
    )
    dlon = F.radians(lon - F.col("lon0"))
    b = F.cos(F.radians(lat)) * F.sin(dlon)
    tm_x = F.lit(500000.0) + F.lit(_TM_K0R) * 0.5 * F.log((1.0 + b) / (1.0 - b))
    tm_y = F.lit(_TM_K0R) * F.atan(F.tan(F.radians(lat)) / F.cos(dlon))
    rho = F.lit(_LCC_RF) / F.pow(F.tan(F.lit(math.pi) / 4 + F.radians(lat) / 2), F.lit(_LCC_N))
    theta = F.lit(_LCC_N) * dlon
    lcc_x = rho * F.sin(theta)
    lcc_y = F.lit(_LCC_RHO0) - rho * F.cos(theta)
    is_tm = F.col("kind") == "tm"
    return pts.join(F.broadcast(params), "epsg").select(
        "event_id",
        "epsg",
        (F.round(F.when(is_tm, tm_x).otherwise(lcc_x), 2) + F.lit(0.0)).alias("easting"),
        (F.round(F.when(is_tm, tm_y).otherwise(lcc_y), 2) + F.lit(0.0)).alias("northing"),
    )


# A deterministic test polygon (star-shaped, with a hole) for
# point-in-polygon: shell + hole rings in lon/lat space.
_SHELL = ((-20.0, 30.0), (50.0, 30.0), (50.0, 75.0), (-20.0, 75.0), (-20.0, 30.0))
_HOLE = ((0.0, 45.0), (20.0, 45.0), (20.0, 60.0), (0.0, 60.0), (0.0, 45.0))


@pandas_udf(T.BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    from .wkb import point_in_polygon

    rings = (_SHELL, _HOLE)
    return pd.Series([point_in_polygon(x, y, rings) for x, y in zip(lon, lat)])


@query(
    "g_point_in_poly",
    oracle=f"""
SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat, TRUE AS in_poly
FROM events
WHERE ({_LON} >= -20 AND {_LON} < 50
       AND {_LAT} >= 30 AND {_LAT} < 75)
  AND NOT ({_LON} >= 0 AND {_LON} < 20
           AND {_LAT} >= 45 AND {_LAT} < 60)
""",
)
def g_point_in_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon (ray casting, polygon with a hole) as an
    Arrow-batched pandas UDF — the sanctioned slow path; golden-point
    unit tests pin the geometry semantics. The test polygon's rings
    are axis-aligned, where ray casting reduces to half-open rectangle
    tests ([x1,x2) × [y1,y2), verified exhaustively against the
    routine at two scales), so the oracle states that closed form and
    the general-polygon code path is hash-checked on every corpus
    point — a boundary-rule regression (>= vs >) breaks the gate."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select("event_id", _lon().alias("lon"), _lat().alias("lat"))
    return pts.withColumn("in_poly", _pip_udf(F.col("lon"), F.col("lat"))).where(
        F.col("in_poly")
    )


@query(
    "g_wkb_serde",
    oracle=f"""
SELECT event_id, {_LON} AS lon, {_LON} AS lon_rt, 21 AS wkb_len
FROM events
""",
)
def g_wkb_serde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKB encode/decode round-trip over BinaryType columns (R2/R3
    envelope parity): derive a point per event, encode to WKB in one
    pandas UDF, decode in another, assert the coordinates survive.
    IEEE doubles round-trip bit-exactly through the codec and a 2-D
    point envelope is always 21 bytes, so the oracle states the
    round-trip identity directly: any row the exact-equality filter
    drops (or a wrong buffer length) breaks the driver hash — the
    codec itself is additionally hypothesis-tested (multi-geometries,
    big-endian) in the unit suite."""
    from .wkb import decode_wkb, encode_wkb

    @pandas_udf(T.BinaryType())
    def to_wkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_wkb(("POINT", (x, y))) for x, y in zip(lon, lat)], dtype=object
        )

    @pandas_udf(T.DoubleType())
    def wkb_lon(b: pd.Series) -> pd.Series:
        return pd.Series([decode_wkb(v)[1][0] for v in b])

    e = load_table(spark, sf_dir, "events")
    pts = e.select("event_id", _lon().alias("lon"), _lat().alias("lat"))
    return (
        pts.withColumn("wkb", to_wkb(F.col("lon"), F.col("lat")))
        .withColumn("lon_rt", wkb_lon(F.col("wkb")))
        .select("event_id", "lon", "lon_rt", F.octet_length("wkb").alias("wkb_len"))
        .where(F.col("lon") == F.col("lon_rt"))  # exact round-trip
    )


@query(
    "g_geom_valid",
    oracle=f"""
SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat
FROM events
WHERE event_id % 3 <> 0
""",
)
def g_geom_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry validation (reference stage R5: drop/repair invalid
    features before the sink). Each event's derived point is WKB-encoded
    and then *corrupted for every third event* (truncated buffer), so
    the validator sees a realistic mix; invalid rows are dropped exactly
    like the reference's handler chain does. The corruption rule is
    deterministic (every third event), so the surviving set is exactly
    oracle-stated: a validator that wrongly accepts a truncated buffer
    or rejects a good one breaks the driver hash. Unit tests cover the
    validator verdicts on crafted geometries."""
    from .wkb import encode_wkb, validate_wkb

    @pandas_udf(T.BinaryType())
    def maybe_broken_wkb(event_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = []
        for e, x, y in zip(event_id, lon, lat):
            buf = encode_wkb(("POINT", (x, y)))
            out.append(buf[:9] if e % 3 == 0 else buf)  # truncate → invalid
        return pd.Series(out, dtype=object)

    @pandas_udf(T.BooleanType())
    def is_valid(wkb: pd.Series) -> pd.Series:
        return pd.Series([validate_wkb(bytes(b)) is None for b in wkb])

    e = load_table(spark, sf_dir, "events")
    pts = e.select("event_id", _lon().alias("lon"), _lat().alias("lat"))
    return (
        pts.withColumn("wkb", maybe_broken_wkb(F.col("event_id"), F.col("lon"), F.col("lat")))
        .withColumn("valid", is_valid(F.col("wkb")))
        .where(F.col("valid"))
        .select("event_id", "lon", "lat")
    )


@query(
    "g_wkt_roundtrip",
    oracle=f"""
SELECT event_id, 'POINT' AS gtype, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat
FROM events
WHERE event_id % 10 = 0
""",
)
def g_wkt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT ingestion parity (reference R1 via `ogr2ogr ... AS_WKT`
    CSVs): JVM doubles → WKT text → parse → WKB encode → WKB decode →
    doubles, all inside one Arrow-batched mapInPandas. repr/float is a
    lossless pair for IEEE doubles and both engines compute lon with
    the same IEEE mul/sub, so the round-tripped coordinates hash-match
    the oracle's direct arithmetic exactly."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 10 == 0)
    src = e.select("event_id", _lon().alias("lon0"), _lat().alias("lat0"))

    def rt(iter_pdf):
        from ..spatial.wkb import decode_wkb, encode_wkb
        from ..spatial.wkt import format_wkt, parse_wkt

        for pdf in iter_pdf:
            types, lons, lats = [], [], []
            for r in pdf.itertuples(index=False):
                wkt = format_wkt(("POINT", (r.lon0, r.lat0)))
                gtype, (x, y) = decode_wkb(encode_wkb(parse_wkt(wkt)))
                types.append(gtype)
                lons.append(x)
                lats.append(y)
            yield pd.DataFrame(
                {"event_id": pdf.event_id, "gtype": types, "lon": lons, "lat": lats}
            )

    return src.mapInPandas(rt, "event_id long, gtype string, lon double, lat double")


@query(
    "g_grid_agg",
    oracle=f"""
SELECT CAST(floor(({_LON} + 180) / 5) AS BIGINT) AS cell_x,
       ({_LAT} + 90) // 5 AS cell_y,
       COUNT(*) AS n_points,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def g_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5°×5° grid-cell aggregation — the spatial rollup that replaces a
    geometry join at scale (points bin to integer cells; cell ids also
    make a natural partition/bucket column for co-locating spatial
    joins). Coordinates are shifted non-negative before the integer
    division so floor == truncate on both engines (Spark's `div`
    truncates toward zero, DuckDB's `//` floors — they differ below
    zero)."""
    e = load_table(spark, sf_dir, "events")
    cell_x = F.floor((_lon() + 180) / 5).cast("bigint")
    cell_y = F.expr("(user_id * 7 % 180 - 90 + 90) div 5")
    return (
        e.groupBy(cell_x.alias("cell_x"), cell_y.alias("cell_y"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sum_value"),
        )
    )


_HUBS = [
    ("berlin", 13.405, 52.52),
    ("nyc", -74.006, 40.7128),
    ("tokyo", 139.6917, 35.6895),
    ("sydney", 151.2093, -33.8688),
    ("lagos", 3.3792, 6.5244),
    ("sao_paulo", -46.6333, -23.5505),
]
_HUB_VALUES = ", ".join(f"('{n}', {lo}, {la})" for n, lo, la in _HUBS)


@query(
    "g_nearest_hub",
    oracle=f"""
SELECT event_id, hub, dist_km FROM (
  SELECT e.event_id, h.hub,
         round(2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(({_LAT}) - h.hlat) / 2), 2)
           + cos(radians({_LAT})) * cos(radians(h.hlat))
             * pow(sin(radians(({_LON}) - h.hlon) / 2), 2)
         )), 4) AS dist_km,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY round(2 * 6371.0088 * asin(sqrt(
                              pow(sin(radians(({_LAT}) - h.hlat) / 2), 2)
                              + cos(radians({_LAT})) * cos(radians(h.hlat))
                                * pow(sin(radians(({_LON}) - h.hlon) / 2), 2)
                            )), 4) ASC, h.hub ASC) AS rn
  FROM events e
  CROSS JOIN (VALUES {_HUB_VALUES}) h(hub, hlon, hlat)
  WHERE e.event_type = 'purchase'
) WHERE rn = 1
""",
)
def g_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial nearest-neighbor join: each purchase event is assigned
    its closest hub city by haversine distance — the canonical
    point-to-site assignment (geofencing / catchment analysis). The hub
    table broadcasts and the argmin is a per-point window over the
    6-row cross product, so cost is 6·n with no shuffle of the big
    side; at planetary scale you'd pre-bucket both sides by grid cell
    to prune the candidate hubs per point. Distances live on the
    module's 4 dp km grid (transcendental rule) and the rank breaks
    grid ties by hub name, so both engines pick identical rows."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    # JVM-side literal relation (a python-list createDataFrame routes
    # through a pickled Python RDD and costs a worker round on first use)
    hubs = spark.sql(f"SELECT * FROM (VALUES {_HUB_VALUES}) AS t(hub, hlon, hlat)")
    lat1 = F.radians(_lat())
    dlat = F.radians(_lat() - F.col("hlat"))
    dlon = F.radians(_lon() - F.col("hlon"))
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(F.radians(F.col("hlat"))) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = F.round(F.lit(2 * 6371.0088) * F.asin(F.sqrt(a)), 4)
    w = Window.partitionBy("event_id").orderBy(F.col("dist_km").asc(), F.col("hub").asc())
    return (
        e.crossJoin(F.broadcast(hubs))
        .select("event_id", "hub", dist.alias("dist_km"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "hub", "dist_km")
    )


@query(
    "g_hub_topk",
    oracle=f"""
SELECT hub, event_id, dist_km, rn FROM (
  SELECT h.hub, e.event_id,
         round(2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(({_LAT}) - h.hlat) / 2), 2)
           + cos(radians({_LAT})) * cos(radians(h.hlat))
             * pow(sin(radians(({_LON}) - h.hlon) / 2), 2)
         )), 4) AS dist_km,
         row_number() OVER (PARTITION BY h.hub
                            ORDER BY round(2 * 6371.0088 * asin(sqrt(
                              pow(sin(radians(({_LAT}) - h.hlat) / 2), 2)
                              + cos(radians({_LAT})) * cos(radians(h.hlat))
                                * pow(sin(radians(({_LON}) - h.hlon) / 2), 2)
                            )), 4) ASC, e.event_id ASC) AS rn
  FROM events e
  CROSS JOIN (VALUES {_HUB_VALUES}) h(hub, hlon, hlat)
  WHERE e.event_type = 'signup'
) WHERE rn <= 5
""",
)
def g_hub_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse k-nearest-neighbor: the 5 closest signup events per hub
    city — the site-centric dual of g_nearest_hub (catchment sampling,
    store-visit attribution).  Same 6-row broadcast cross product, but
    the window partitions by HUB, so the per-group top-k is a 6-key
    window over the expanded stream; at scale this is the shape that
    wants per-hub grid pre-filtering so each site only ranks points
    from its neighborhood cells.  Distances on the 4 dp km grid with
    event_id tie-break (transcendental rule)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    hubs = spark.sql(f"SELECT * FROM (VALUES {_HUB_VALUES}) AS t(hub, hlon, hlat)")
    lat1 = F.radians(_lat())
    dlat = F.radians(_lat() - F.col("hlat"))
    dlon = F.radians(_lon() - F.col("hlon"))
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(F.radians(F.col("hlat"))) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = F.round(F.lit(2 * 6371.0088) * F.asin(F.sqrt(a)), 4)
    w = Window.partitionBy("hub").orderBy(F.col("dist_km").asc(), F.col("event_id").asc())
    return (
        e.crossJoin(F.broadcast(hubs))
        .select("hub", "event_id", dist.alias("dist_km"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )


_Z_BITS = 16


def _zorder_sql(xcol: str, ycol: str) -> str:
    """DuckDB bit-interleave of two 16-bit cell coords (static unroll)."""
    terms = [
        f"((({xcol} >> {i}) & 1) * {1 << (2 * i)}) + ((({ycol} >> {i}) & 1) * {1 << (2 * i + 1)})"
        for i in range(_Z_BITS)
    ]
    return " + ".join(terms)


@query(
    "g_zorder_key",
    oracle=f"""
WITH cells AS (
  SELECT event_id,
         least(CAST(floor(({_LON} + 180.0) / 360.0 * 65536.0) AS BIGINT), 65535) AS cx,
         least(CAST(floor(({_LAT} + 90.0) / 180.0 * 65536.0) AS BIGINT), 65535) AS cy
  FROM events
)
SELECT event_id, cx, cy, {_zorder_sql('cx', 'cy')} AS zkey
FROM cells
""",
)
def g_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key for every event point: 16-bit grid cell per
    axis, bits interleaved into one BIGINT — the locality-preserving
    sort key that makes spatial range queries prunable at 100 TB
    (cluster/partition the lake by zkey and a bbox becomes a handful of
    contiguous key ranges; this is exactly what lakehouse OPTIMIZE
    ZORDER does). Pure integer bit math after one double floor
    (explicit floor+cast, since DuckDB's double→int cast rounds while
    Spark's truncates), statically unrolled over the 16 bits — no
    loops, no UDF, codegen-friendly."""
    e = load_table(spark, sf_dir, "events")
    cx = F.least(F.floor((_lon() + 180.0) / 360.0 * 65536.0).cast("long"), F.lit(65535))
    cy = F.least(F.floor((_lat() + 90.0) / 180.0 * 65536.0).cast("long"), F.lit(65535))
    cells = e.select("event_id", cx.alias("cx"), cy.alias("cy"))
    zkey = None
    for i in range(_Z_BITS):
        t = F.shiftright(F.col("cx"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)) + (
            F.shiftright(F.col("cy"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
        zkey = t if zkey is None else zkey + t
    return cells.select("event_id", "cx", "cy", zkey.alias("zkey"))


@query(
    "g_track_length",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat
  FROM events
), hops AS (
  SELECT user_id,
         round(2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(lat - lag(lat) OVER w) / 2), 2)
           + cos(radians(lag(lat) OVER w)) * cos(radians(lat))
             * pow(sin(radians(lon - lag(lon) OVER w) / 2), 2)
         )), 4) AS hop_km
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
  QUALIFY lag(lat) OVER w IS NOT NULL
)
SELECT user_id,
       count(*) AS n_hops,
       CAST(CAST(SUM(CAST(hop_km AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS track_km
FROM hops GROUP BY user_id
""",
)
def g_track_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory length: consecutive event positions (ordered
    by event_id — verified ts-monotone) chained with lag() and summed
    as haversine hops — the movement-analytics primitive of a geodata
    pipeline (track mileage / displacement audits). Each hop lands on
    the module's 4 dp km grid BEFORE the sum, and the sum runs in
    exact DECIMAL, so the aggregate is order-free and hash-stable.
    One shuffle (window by user) + one hash agg."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select("user_id", "event_id", _lon().alias("lon"), _lat().alias("lat"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    plat, plon = F.lag("lat").over(w), F.lag("lon").over(w)
    a = (
        F.pow(F.sin(F.radians(F.col("lat") - plat) / 2), 2)
        + F.cos(F.radians(plat))
        * F.cos(F.radians(F.col("lat")))
        * F.pow(F.sin(F.radians(F.col("lon") - plon) / 2), 2)
    )
    hop = F.round(F.lit(2 * 6371.0088) * F.asin(F.sqrt(a)), 4)
    hops = pts.select("user_id", hop.alias("hop_km")).where(F.col("hop_km").isNotNull())
    return hops.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hops"),
        F.sum(F.col("hop_km").cast("decimal(28,10)")).cast("double").alias("track_km"),
    )


@query(
    "g_bearing",
    oracle=f"""
SELECT event_id,
       round(degrees(atan2(
         sin(radians(13.405 - {_LON})) * cos(radians(52.52)),
         cos(radians({_LAT})) * sin(radians(52.52))
           - sin(radians({_LAT})) * cos(radians(52.52)) * cos(radians(13.405 - {_LON}))
       )), 4) + 0.0 AS bearing_deg
FROM events
WHERE event_type = 'purchase'
""",
)
def g_bearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial great-circle bearing from each point toward Berlin —
    the directional companion to g_haversine (together they give the
    vector a routing/anisotropy analysis needs). Pure column math,
    4 dp grid + (-0.0 collapse) per the transcendental rule; identical
    literal structure mirrored in the oracle."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    dlon = F.radians(F.lit(13.405) - _lon())
    lat1 = F.radians(_lat())
    lat2 = F.radians(F.lit(52.52))
    y = F.sin(dlon) * F.cos(lat2)
    x = F.cos(lat1) * F.sin(lat2) - F.sin(lat1) * F.cos(lat2) * F.cos(dlon)
    return e.select(
        "event_id",
        (F.round(F.degrees(F.atan2(y, x)), 4) + F.lit(0.0)).alias("bearing_deg"),
    )


_GH_BITS = 15  # bits per axis → 30 total → 6 base32 chars
_GH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_int_sql(xcol: str, ycol: str) -> str:
    """DuckDB 30-bit geohash integer: MSB-first interleave, longitude
    first (geohash convention — even bit positions are longitude)."""
    terms = []
    for i in range(_GH_BITS):
        # bit (GH_BITS-1-i) of each axis lands at output bits 29-2i / 28-2i
        terms.append(f"((({xcol} >> {_GH_BITS - 1 - i}) & 1) * {1 << (29 - 2 * i)})")
        terms.append(f"((({ycol} >> {_GH_BITS - 1 - i}) & 1) * {1 << (28 - 2 * i)})")
    return " + ".join(terms)


@query(
    "g_geohash",
    oracle=f"""
WITH cells AS (
  SELECT event_id,
         least(CAST(floor(({_LON} + 180.0) / 360.0 * {1 << _GH_BITS}.0) AS BIGINT), {(1 << _GH_BITS) - 1}) AS cx,
         least(CAST(floor(({_LAT} + 90.0) / 180.0 * {1 << _GH_BITS}.0) AS BIGINT), {(1 << _GH_BITS) - 1}) AS cy
  FROM events
), keyed AS (
  SELECT event_id, {_geohash_int_sql('cx', 'cy')} AS gh_int FROM cells
)
SELECT event_id, gh_int,
       {" || ".join(f"substring('{_GH_B32}', CAST((gh_int >> {25 - 5 * j}) % 32 + 1 AS INT), 1)" for j in range(6))} AS geohash
FROM keyed
""",
)
def g_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base32 geohash (6 characters ≈ ±0.6 km) for every event point:
    15-bit grid cell per axis, MSB-first lon-lat bit interleave, then
    six 5-bit groups mapped through the public geohash alphabet.  The
    textual twin of g_zorder_key — geohash prefixes are how spatial
    data is bucketed for prefix-join neighborhood lookups (two points
    share a k-char prefix ⇒ same ~cell), so this column is both a
    partition key and a human-portable index at 100 TB.  Pure unrolled
    integer bit math + array lookup — no UDF, whole-stage codegen."""
    e = load_table(spark, sf_dir, "events")
    hi = (1 << _GH_BITS) - 1
    cx = F.least(F.floor((_lon() + 180.0) / 360.0 * float(1 << _GH_BITS)).cast("long"), F.lit(hi))
    cy = F.least(F.floor((_lat() + 90.0) / 180.0 * float(1 << _GH_BITS)).cast("long"), F.lit(hi))
    cells = e.select("event_id", cx.alias("cx"), cy.alias("cy"))
    gh = None
    for i in range(_GH_BITS):
        t = F.shiftright(F.col("cx"), _GH_BITS - 1 - i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (29 - 2 * i)
        ) + F.shiftright(F.col("cy"), _GH_BITS - 1 - i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (28 - 2 * i)
        )
        gh = t if gh is None else gh + t
    keyed = cells.select("event_id", gh.alias("gh_int"))
    alphabet = F.array(*[F.lit(c) for c in _GH_B32])
    chars = [
        F.element_at(alphabet, (F.shiftright(F.col("gh_int"), 25 - 5 * j) % 32 + 1).cast("int"))
        for j in range(6)
    ]
    return keyed.select("event_id", "gh_int", F.concat(*chars).alias("geohash"))


@query(
    "g_track_area",
    oracle=f"""
WITH pts AS (
  SELECT event_type, event_id,
         CAST(floor(({_LON}) * 10000) AS BIGINT) AS x,
         CAST(floor(CAST({_LAT} AS DOUBLE) * 10000) AS BIGINT) AS y
  FROM events
), seq AS (
  SELECT event_type, x, y,
         coalesce(lead(x) OVER w, first_value(x) OVER wf) AS xn,
         coalesce(lead(y) OVER w, first_value(y) OVER wf) AS yn
  FROM pts
  WINDOW w AS (PARTITION BY event_type ORDER BY event_id),
         wf AS (PARTITION BY event_type ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       count(*) AS n_pts,
       CAST(SUM(x * yn - xn * y) AS BIGINT) AS area2_signed,
       CAST(abs(SUM(x * yn - xn * y)) AS BIGINT) AS area2_abs
FROM seq
GROUP BY event_type
""",
)
def g_track_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace (signed) polygon area of each event stream's closed
    ring: the points of one event_type across all users, ordered by
    the ts-monotone event_id, with the closing edge wrapping back to
    the first point via first_value.  (Per-USER rings are degenerate
    on this corpus — each user's latitude is constant, so y(x - xn)
    telescopes to exactly 0 around any closed ring; the round-5
    dead-column audit caught the vacuity and this revision re-keys the
    ring to the event stream, where latitude varies.)  The
    cross-product sum runs on 1e-4-degree integer grid coordinates —
    term magnitude ≤ 3.3e12, so even a 10⁶-point ring stays far inside
    BIGINT and the sum is exact, order-independent integer math.  The
    signed sum also tells winding direction — the standard
    geometry-validity input.  One shuffle on event_type (both window
    specs share it), then the aggregate reuses the same partitioning —
    a single-exchange plan."""
    e = load_table(spark, sf_dir, "events")
    x = F.floor(_lon() * 10000).cast("long")
    y = F.floor(_lat() * 10000).cast("long")
    pts = e.select("event_type", "event_id", x.alias("x"), y.alias("y"))
    w = Window.partitionBy("event_type").orderBy("event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    seq = pts.select(
        "event_type",
        "x",
        "y",
        F.coalesce(F.lead("x").over(w), F.first("x").over(wf)).alias("xn"),
        F.coalesce(F.lead("y").over(w), F.first("y").over(wf)).alias("yn"),
    )
    cross = F.col("x") * F.col("yn") - F.col("xn") * F.col("y")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(cross).cast("bigint").alias("area2_signed"),
        F.abs(F.sum(cross)).cast("bigint").alias("area2_abs"),
    )


@query(
    "g_geohash_cells",
    oracle=f"""
WITH cells AS (
  SELECT event_id, user_id,
         least(CAST(floor(({_LON} + 180.0) / 360.0 * {1 << _GH_BITS}.0) AS BIGINT), {(1 << _GH_BITS) - 1}) AS cx,
         least(CAST(floor(({_LAT} + 90.0) / 180.0 * {1 << _GH_BITS}.0) AS BIGINT), {(1 << _GH_BITS) - 1}) AS cy
  FROM events
), keyed AS (
  SELECT event_id, user_id, ({_geohash_int_sql('cx', 'cy')}) >> 15 AS pkey FROM cells
), per_user AS (
  SELECT pkey, user_id, count(*) AS nu FROM keyed GROUP BY pkey, user_id
)
SELECT pkey,
       {" || ".join(f"substring('{_GH_B32}', CAST((pkey >> {10 - 5 * j}) % 32 + 1 AS INT), 1)" for j in range(3))} AS prefix,
       CAST(SUM(nu) AS BIGINT) AS n_pts,
       count(*) AS n_users,
       CAST((SUM(nu) * SUM(nu) - SUM(nu)) // 2 AS BIGINT) AS n_pairs,
       CAST((SUM(nu) * SUM(nu) - SUM(nu * nu)) // 2 AS BIGINT) AS n_cross_user_pairs
FROM per_user
GROUP BY pkey
""",
)
def g_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood statistics per 3-character geohash cell — the
    consumer of g_geohash's prefix-bucketing claim: how many
    co-located point pairs (and cross-user pairs, the contact-graph
    candidate count) exist in each ~150 km cell, computed from
    per-cell counting identities (n·(n−1)/2, (n² − Σnᵤ²)/2) WITHOUT
    enumerating a single pair.  The cell grain is tuned to the
    MEASURED corpus density (round-6 dead-column audit): at 5 chars
    every cell held one user at both gate scales, so the cross-user
    column — the whole point of the contact audit — was vacuously
    zero; at 3 chars it fires at sf0.01 (3,810 cross pairs, ≤2
    users/cell) AND sf0.1 (891,807, ≤17) while sf0.001 stays honestly
    empty (500 events over a continent).  This is the pre-join cardinality audit you run
    before an actual spatial pair join at 100 TB — it tells you the
    join's output size and which cells are hot, for two cheap
    aggregates (cell×user, then cell) and zero pair rows.  Integer bit
    math + integer counts only, hash-checked."""
    e = load_table(spark, sf_dir, "events")
    hi = (1 << _GH_BITS) - 1
    cx = F.least(F.floor((_lon() + 180.0) / 360.0 * float(1 << _GH_BITS)).cast("long"), F.lit(hi))
    cy = F.least(F.floor((_lat() + 90.0) / 180.0 * float(1 << _GH_BITS)).cast("long"), F.lit(hi))
    cells = e.select("event_id", "user_id", cx.alias("cx"), cy.alias("cy"))
    gh = None
    for i in range(_GH_BITS):
        t = F.shiftright(F.col("cx"), _GH_BITS - 1 - i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (29 - 2 * i)
        ) + F.shiftright(F.col("cy"), _GH_BITS - 1 - i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (28 - 2 * i)
        )
        gh = t if gh is None else gh + t
    keyed = cells.select("user_id", F.shiftright(gh, 15).alias("pkey"))
    per_user = keyed.groupBy("pkey", "user_id").agg(F.count(F.lit(1)).alias("nu"))
    alphabet = F.array(*[F.lit(c) for c in _GH_B32])
    prefix = F.concat(
        *[
            F.element_at(
                alphabet, (F.shiftright(F.col("pkey"), 10 - 5 * j) % 32 + 1).cast("int")
            )
            for j in range(3)
        ]
    )
    return per_user.groupBy("pkey").agg(
        F.sum("nu").cast("bigint").alias("n_pts"),
        F.count(F.lit(1)).alias("n_users"),
        # integer div keeps the pair identities exact at any cell size
        F.expr("(sum(nu) * sum(nu) - sum(nu)) div 2").cast("bigint").alias("n_pairs"),
        F.expr("(sum(nu) * sum(nu) - sum(nu * nu)) div 2").cast("bigint")
        .alias("n_cross_user_pairs"),
    ).select(
        "pkey", prefix.alias("prefix"), "n_pts", "n_users", "n_pairs", "n_cross_user_pairs"
    )


@query(
    "g_heat_decay",
    oracle=f"""
WITH pts AS (
  SELECT CAST(floor(({_LON} + 180.0) / 6.0) AS BIGINT) AS gx,
         CAST(floor((CAST({_LAT} AS DOUBLE) + 90.0) / 6.0) AS BIGINT) AS gy,
         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS ep
  FROM events
),
mx AS (SELECT max(ep) AS mep FROM pts),
terms AS (
  SELECT gy * 60 + gx AS cell,
         round(exp(-((mx.mep - ep) / 3600.0) / 24.0), 6) AS w
  FROM pts, mx
)
SELECT cell,
       count(*) AS n_events,
       CAST(CAST(SUM(CAST(w AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS heat
FROM terms
GROUP BY cell
""",
)
def g_heat_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted spatial heat map: every event contributes
    exp(−age/24 h) to its 6°-grid cell — the decay aggregation behind
    "what is hot NOW" map layers, where yesterday's burst must fade
    under today's trickle. Transcendental hash-safety follows the
    m_token_entropy recipe: each per-event weight is rounded to the
    6 dp grid (JVM vs libm exp differ ~1 ULP — far below the grid),
    summed in exact DECIMAL so accumulation order cannot matter, and
    surfaced once as double. Ages are exact integer seconds against
    the corpus max; one scan + one aggregate, partial-combined."""
    e = load_table(spark, sf_dir, "events")
    ep = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("bigint")
    pts = e.select(
        F.floor((_lon() + 180.0) / 6.0).cast("long").alias("gx"),
        F.floor((_lat() + 90.0) / 6.0).cast("long").alias("gy"),
        ep.alias("ep"),
    )
    mx = F.broadcast(pts.agg(F.max("ep").alias("mep")))
    terms = pts.crossJoin(mx).select(
        (F.col("gy") * 60 + F.col("gx")).alias("cell"),
        F.round(F.exp(-((F.col("mep") - F.col("ep")) / 3600.0) / 24.0), 6).alias("w"),
    )
    return terms.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("w").cast("decimal(28,10)")).cast("double").alias("heat"),
    )


@query(
    "g_trajectory_stops",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id,
         CAST(floor(({_LON} + 180.0) / 6.0) AS BIGINT) * 60
           + CAST(floor((CAST({_LAT} AS DOUBLE) + 90.0) / 6.0) AS BIGINT) AS cell,
         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS ep
  FROM events
),
runs AS (
  SELECT user_id, cell, event_id, ep,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         - row_number() OVER (PARTITION BY user_id, cell ORDER BY event_id) AS grp
  FROM pts
)
SELECT user_id, cell,
       count(*) AS n_points,
       min(event_id) AS enter_event,
       max(event_id) AS leave_event,
       max(ep) - min(ep) AS dwell_s
FROM runs
GROUP BY user_id, cell, grp
HAVING count(*) >= 3
""",
)
def g_trajectory_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point detection: maximal runs of ≥3 consecutive points
    inside the same 6°-grid cell per user — the trajectory-mining
    primitive that turns a GPS stream into visits (where did the
    entity dwell, for how long).  Same difference-of-row-numbers
    island key as q_gaps_islands, applied to a spatial cell id, with
    exact integer dwell seconds from second-truncated epochs.  Two
    shared-shuffle window passes + one aggregate on user_id — a
    three-stage scan at any scale, no self-join."""
    e = load_table(spark, sf_dir, "events")
    ep = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("bigint")
    cell = (
        F.floor((_lon() + 180.0) / 6.0).cast("long") * 60
        + F.floor((_lat() + 90.0) / 6.0).cast("long")
    )
    pts = e.select("user_id", "event_id", cell.alias("cell"), ep.alias("ep"))
    w_all = Window.partitionBy("user_id").orderBy("event_id")
    w_cell = Window.partitionBy("user_id", "cell").orderBy("event_id")
    runs = pts.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_cell)
    )
    return (
        runs.groupBy("user_id", "cell", "grp")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("event_id").alias("enter_event"),
            F.max("event_id").alias("leave_event"),
            (F.max("ep") - F.min("ep")).alias("dwell_s"),
        )
        .where(F.col("n_points") >= 3)
        .drop("grp")
    )


@query(
    "g_cell_transitions",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id,
         CAST(floor(({_LON} + 180.0) / 6.0) AS BIGINT) * 60
           + CAST(floor((CAST({_LAT} AS DOUBLE) + 90.0) / 6.0) AS BIGINT) AS cell
  FROM events
),
seq AS (
  SELECT cell AS from_cell,
         lead(cell) OVER (PARTITION BY user_id ORDER BY event_id) AS to_cell
  FROM pts
)
SELECT from_cell, to_cell, count(*) AS n
FROM seq
WHERE to_cell IS NOT NULL AND to_cell <> from_cell
GROUP BY from_cell, to_cell
HAVING count(*) >= 3
""",
)
def g_cell_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination matrix: movement flows between 6°-grid cells
    (consecutive same-user positions in different cells, flows with ≥3
    observations) — the aggregate behind migration maps and transport
    planning, and the spatial sibling of q_markov_transitions.  One
    lead() pass and one aggregate sharing the user_id shuffle; at
    100 TB the OD matrix is bounded by cells², not by points, so the
    output stays broadcastable however big the input."""
    e = load_table(spark, sf_dir, "events")
    cell = (
        F.floor((_lon() + 180.0) / 6.0).cast("long") * 60
        + F.floor((_lat() + 90.0) / 6.0).cast("long")
    )
    pts = e.select("user_id", "event_id", cell.alias("cell"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = pts.select(
        F.col("cell").alias("from_cell"), F.lead("cell").over(w).alias("to_cell")
    )
    return (
        seq.where(F.col("to_cell").isNotNull() & (F.col("to_cell") != F.col("from_cell")))
        .groupBy("from_cell", "to_cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
    )


@query(
    "g_reproject_inverse",
    oracle=f"""
WITH fwd AS (
  SELECT event_id, {_LON} AS lon0, CAST({_LAT} AS DOUBLE) AS lat0,
         6378137.0 * radians({_LON}) AS mx,
         6378137.0 * ln(tan(3.141592653589793 / 4 + radians({_LAT}) / 2)) AS my
  FROM events
  WHERE {_LAT} BETWEEN -85 AND 85
)
SELECT event_id,
       (round(degrees(mx / 6378137.0), 4) + 0.0) AS lon_rt,
       (round(degrees(2 * (atan(exp(my / 6378137.0)) - 3.141592653589793 / 4)), 4) + 0.0) AS lat_rt,
       (round(degrees(mx / 6378137.0) - lon0, 4) + 0.0) AS lon_err,
       (round(degrees(2 * (atan(exp(my / 6378137.0)) - 3.141592653589793 / 4)) - lat0, 4) + 0.0) AS lat_err
FROM fwd
""",
)
def g_reproject_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-Mercator INVERSE projection: forward-project every point,
    invert with the closed-form sphere formulas (λ = x/R,
    φ = 2·atan(eˣ/ᴿ) − π/4), and emit the round-tripped coordinates
    plus their error on a 1e-4-degree grid — which must be exactly
    zero, making this the numerical-closure proof of the projection
    pair (a transposed constant or a degrees/radians slip shows up as
    a nonzero error hash). Same hash-safety recipe as g_reproject:
    shared double literals, 4 dp grid absorbing ~1 ULP libm drift,
    +0.0 collapsing −0.0."""
    e = load_table(spark, sf_dir, "events")
    R = F.lit(6378137.0)
    pi = F.lit(3.141592653589793)
    mx = R * F.radians(_lon())
    my = R * F.log(F.tan(pi / 4 + F.radians(_lat()) / 2))
    lon_rt = F.degrees(mx / R)
    lat_rt = F.degrees(F.lit(2.0) * (F.atan(F.exp(my / R)) - pi / 4))
    return e.where(_lat().between(-85, 85)).select(
        "event_id",
        (F.round(lon_rt, 4) + F.lit(0.0)).alias("lon_rt"),
        (F.round(lat_rt, 4) + F.lit(0.0)).alias("lat_rt"),
        (F.round(lon_rt - _lon(), 4) + F.lit(0.0)).alias("lon_err"),
        (F.round(lat_rt - _lat(), 4) + F.lit(0.0)).alias("lat_err"),
    )


_SPEED_MAX_KMH = 10000.0


@query(
    "g_speed_anomaly",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat,
         CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS ep
  FROM events
), hops AS (
  SELECT user_id, event_id,
         round(2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(lat - lag(lat) OVER w) / 2), 2)
           + cos(radians(lag(lat) OVER w)) * cos(radians(lat))
             * pow(sin(radians(lon - lag(lon) OVER w) / 2), 2)
         )), 4) AS hop_km,
         ep - lag(ep) OVER w AS dt
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
  QUALIFY lag(ep) OVER w IS NOT NULL
)
SELECT user_id, event_id, hop_km, dt,
       CASE WHEN dt > 0 THEN CAST(floor((3600.0 * hop_km) / dt) AS BIGINT) END AS speed_kmh
FROM hops
WHERE (dt = 0 AND hop_km > 0)
   OR (dt > 0 AND (3600.0 * hop_km) / dt > {_SPEED_MAX_KMH})
""",
)
def g_speed_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Teleport detection: hops whose implied speed exceeds a physical
    ceiling — the GPS-data-quality filter every trajectory pipeline
    runs before computing mileage or stops (a glitched fix otherwise
    poisons every downstream statistic).  Haversine on the 4 dp km
    grid (g_track_length's hash-safe recipe) over exact integer
    second deltas; a zero-Δt hop that moved is flagged directly
    (never divided — ANSI throws, DuckDB would emit inf); the speed is
    floored onto integer km/h and the
    threshold compares the SAME double expression both engines
    compute from identical operands.  One window pass on the user_id
    shuffle; output is the anomaly set (~5% of hops in this corpus —
    synthetic positions jump, which makes the filter non-vacuous at
    every scale)."""
    e = load_table(spark, sf_dir, "events")
    ep = F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("bigint")
    pts = e.select("user_id", "event_id", _lon().alias("lon"), _lat().alias("lat"), ep.alias("ep"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    lat_p, lon_p, ep_p = F.lag("lat").over(w), F.lag("lon").over(w), F.lag("ep").over(w)
    hav = F.round(
        2
        * 6371.0088
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat") - lat_p) / 2), 2)
                + F.cos(F.radians(lat_p))
                * F.cos(F.radians(F.col("lat")))
                * F.pow(F.sin(F.radians(F.col("lon") - lon_p) / 2), 2)
            )
        ),
        4,
    )
    hops = pts.select(
        "user_id",
        "event_id",
        hav.alias("hop_km"),
        (F.col("ep") - ep_p).alias("dt"),
    ).where(F.col("dt").isNotNull())
    # dt = 0 (two fixes inside one second, moved) is BY DEFINITION a
    # teleport — flagged without dividing (ANSI mode throws on /0, and
    # DuckDB's float inf would silently diverge from it)
    speed = (F.lit(3600.0) * F.col("hop_km")) / F.col("dt")
    zero_dt = (F.col("dt") == 0) & (F.col("hop_km") > 0)
    fast = (F.col("dt") > 0) & (speed > _SPEED_MAX_KMH)
    return hops.where(zero_dt | fast).select(
        "user_id",
        "event_id",
        "hop_km",
        "dt",
        F.when(F.col("dt") > 0, F.floor(speed).cast("bigint")).alias("speed_kmh"),
    )


@query(
    "g_radius_neighbors",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat,
         CAST(floor({_LON} / 2) AS BIGINT) AS cx,
         CAST(floor(CAST({_LAT} AS DOUBLE) / 2) AS BIGINT) AS cy
  FROM events
), offs AS (
  SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)
), probes AS (
  SELECT p.event_id, p.lon, p.lat, p.cx + o.dx AS kx, p.cy + o.dy AS ky
  FROM pts p, offs o
), linked AS (
  SELECT a.event_id, count(*) AS n_neighbors
  FROM probes a JOIN pts b ON b.cx = a.kx AND b.cy = a.ky
  WHERE abs(a.lon - b.lon) <= 2.0 AND abs(a.lat - b.lat) <= 2.0
        AND b.event_id <> a.event_id
  GROUP BY a.event_id
), counts AS (
  SELECT p.event_id, COALESCE(l.n_neighbors, 0) AS n_neighbors
  FROM pts p LEFT JOIN linked l USING (event_id)
)
SELECT n_neighbors, count(*) AS n_points FROM counts GROUP BY n_neighbors
""",
)
def g_radius_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-neighbor density profile via grid bucketing: for every
    point, the exact count of other points within a 2-degree L-inf
    ball, summarized as a neighbor-count histogram (the DBSCAN
    density-reachability precursor and the hotspot-density audit).
    The L-inf metric makes the grid EXACT: with cell size == radius,
    every qualifying neighbor lies in the 3x3 adjacent cells, so a
    9-key probe explode + equality join on cell ids replaces the
    quadratic distance join — the standard spatial-binning dataflow
    that scales linearly with a skew caveat (a dense cell pairs
    quadratically within itself; salting the probe side bounds it).
    Zero-neighbor points are restored by the left join so the
    histogram masses sum to |points| (checked in tests); all distance
    comparisons are IEEE-double identical across engines."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        _lon().alias("lon"),
        _lat().alias("lat"),
        F.floor(_lon() / 2).cast("bigint").alias("cx"),
        F.floor(_lat() / 2).cast("bigint").alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probes = pts.select(
        "event_id",
        "lon",
        "lat",
        "cx",
        "cy",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
        ).alias("o"),
    ).select(
        "event_id",
        "lon",
        "lat",
        (F.col("cx") + F.col("o.dx")).alias("kx"),
        (F.col("cy") + F.col("o.dy")).alias("ky"),
    )
    b = pts.select(
        F.col("event_id").alias("b_id"),
        F.col("lon").alias("b_lon"),
        F.col("lat").alias("b_lat"),
        F.col("cx").alias("kx"),
        F.col("cy").alias("ky"),
    )
    linked = (
        # explode wrecks Catalyst's size estimate (working-notes trap):
        # left unhinted, Spark broadcasts the 9x-exploded PROBE side
        # (~900k rows). Pin the UN-EXPLODED points as the build side
        # with shuffle_hash, not F.broadcast: b is the full corpus, so
        # a forced broadcast OOMs at 100x while shuffle-hash builds
        # per-partition tables (round-8 broadcast-lineage audit)
        probes.join(b.hint("shuffle_hash"), ["kx", "ky"])
        .where(
            (F.abs(F.col("lon") - F.col("b_lon")) <= 2.0)
            & (F.abs(F.col("lat") - F.col("b_lat")) <= 2.0)
            & (F.col("event_id") != F.col("b_id"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    counts = pts.select("event_id").join(linked, "event_id", "left").select(
        F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors")
    )
    return counts.groupBy("n_neighbors").agg(F.count(F.lit(1)).alias("n_points"))


@query(
    "g_dbscan_classify",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat,
         CAST(floor({_LON} / 2) AS BIGINT) AS cx,
         CAST(floor(CAST({_LAT} AS DOUBLE) / 2) AS BIGINT) AS cy
  FROM events
), offs AS (
  SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)
), pairs AS (
  SELECT a.event_id AS a_id, b.event_id AS b_id
  FROM (SELECT p.event_id, p.lon, p.lat, p.cx + o.dx AS kx, p.cy + o.dy AS ky
        FROM pts p, offs o) a
  JOIN pts b ON b.cx = a.kx AND b.cy = a.ky
  WHERE abs(a.lon - b.lon) <= 2.0 AND abs(a.lat - b.lat) <= 2.0
        AND b.event_id <> a.event_id
), counts AS (
  SELECT p.event_id,
         (SELECT count(*) FROM pairs w WHERE w.a_id = p.event_id) AS n_neighbors
  FROM pts p
), core AS (
  SELECT event_id FROM counts WHERE n_neighbors >= 4
), border AS (
  SELECT DISTINCT c.event_id
  FROM counts c
  JOIN pairs pr ON pr.a_id = c.event_id
  JOIN core k ON k.event_id = pr.b_id
  WHERE c.n_neighbors < 4
)
SELECT cls, count(*) AS n_points FROM (
  SELECT c.event_id,
         CASE WHEN c.n_neighbors >= 4 THEN 'core'
              WHEN b.event_id IS NOT NULL THEN 'border'
              ELSE 'noise' END AS cls
  FROM counts c LEFT JOIN border b USING (event_id)
) GROUP BY cls
""",
)
def g_dbscan_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN point classification (eps = 2-degree L-inf, minPts = 4,
    tuned non-vacuous on the measured density at BOTH gate scales:
    mean neighbor count ~2.5 at sf0.01 and ~25 at sf0.1, so all three
    classes appear): core points have >= minPts neighbors, border
    points are non-core within eps of a core point, the rest is
    noise — the density-clustering precursor whose cluster expansion
    is plain connected components over the core-core pairs
    (m_graph_cc's dataflow).

    Round-10 shave (4.0 -> ~2.4 s warm at sf0.1): the old shape
    materialized the raw 3M-row pair list and left ``counts``
    un-checkpointed, so the final job re-executed the counts groupBy
    three times (core / noncore / classify branches).  Now job 1
    pipelines the 3x3 grid join (same exact bucketing as
    g_radius_neighbors) STRAIGHT into the per-point neighbor count and
    checkpoints only the 100k-row counts frame; the border probe is a
    SECOND grid join whose probe side is pre-pruned to the non-core
    points — measured 6.6% of the corpus at sf0.1 and shrinking with
    density, so at 100x the probe side grows sublinearly while the old
    shape's materialized pair list grew with corpus x density.  Build
    sides ride shuffle_hash pins, never a forced broadcast (explode
    wrecks the size estimate; both builds are corpus-sized)."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        _lon().alias("lon"),
        _lat().alias("lat"),
        F.floor(_lon() / 2).cast("bigint").alias("cx"),
        F.floor(_lat() / 2).cast("bigint").alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def grid_probes(src: DataFrame) -> DataFrame:
        return src.select(
            "event_id",
            "lon",
            "lat",
            F.explode(
                F.array(
                    *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs]
                )
            ).alias("o"),
            (F.col("cx") + F.col("o.dx")).alias("kx"),
            (F.col("cy") + F.col("o.dy")).alias("ky"),
        ).select("event_id", "lon", "lat", "kx", "ky")

    def eps_join(probe: DataFrame, build: DataFrame) -> DataFrame:
        # shuffle_hash pin on the build side: the probe explode wrecks
        # Catalyst's estimate (left unhinted it broadcasts the 9x
        # probe side) and both builds are corpus-sized, so a forced
        # broadcast would OOM at 100x (round-8 broadcast-lineage audit)
        return probe.join(build.hint("shuffle_hash"), ["kx", "ky"]).where(
            (F.abs(F.col("lon") - F.col("b_lon")) <= 2.0)
            & (F.abs(F.col("lat") - F.col("b_lat")) <= 2.0)
            & (F.col("event_id") != F.col("b_id"))
        )

    b = pts.select(
        F.col("event_id").alias("b_id"),
        F.col("lon").alias("b_lon"),
        F.col("lat").alias("b_lat"),
        F.col("cx").alias("kx"),
        F.col("cy").alias("ky"),
    )
    # Job 1: grid join pipelined into the per-point count (partial agg
    # folds map-side — the raw pair list is never materialized), then
    # pin the ~|points| counts frame: core, noncore, and the classify
    # branch all reuse it (un-pinned, the final job re-ran this subtree
    # three times — working-notes iterative-loop trap).
    counts = checkpoint_df(
        pts.select("event_id")
        .join(
            eps_join(grid_probes(pts), b)
            .groupBy("event_id")
            .agg(F.count(F.lit(1)).alias("n_neighbors")),
            "event_id",
            "left",
        )
        .select("event_id", F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"))
    )
    core_pts = (
        pts.join(
            counts.where(F.col("n_neighbors") >= 4).select("event_id"), "event_id"
        ).select(
            F.col("event_id").alias("b_id"),
            F.col("lon").alias("b_lon"),
            F.col("lat").alias("b_lat"),
            F.col("cx").alias("kx"),
            F.col("cy").alias("ky"),
        )
    )
    noncore_pts = pts.join(
        counts.where(F.col("n_neighbors") < 4).select("event_id"), "event_id"
    )
    # Border probe: second grid join, probe side pruned to non-core
    # points BEFORE the explode (6.6% at sf0.1; the fraction falls as
    # density rises, so this join shrinks relative to job 1 at scale).
    # r11 shave (VERDICT r10 item 6): LEFT SEMI with the eps predicate
    # IN the join condition — the hash join emits each probe row at
    # most once (first core match wins) instead of materializing every
    # (non-core, core) neighbor pair and distinct-ing them; the
    # follow-up distinct only folds the <=9 grid cells per point.
    probe = grid_probes(noncore_pts).alias("p")
    build = core_pts.hint("shuffle_hash").alias("c")
    border = (
        probe.join(
            build,
            (F.col("p.kx") == F.col("c.kx"))
            & (F.col("p.ky") == F.col("c.ky"))
            & (F.abs(F.col("p.lon") - F.col("c.b_lon")) <= 2.0)
            & (F.abs(F.col("p.lat") - F.col("c.b_lat")) <= 2.0)
            & (F.col("p.event_id") != F.col("c.b_id")),
            "left_semi",
        )
        .select("event_id")
        .distinct()
    )
    classified = (
        counts.join(border.withColumn("is_border", F.lit(1)), "event_id", "left")
        .select(
            F.when(F.col("n_neighbors") >= 4, "core")
            .when(F.col("is_border") == 1, "border")
            .otherwise("noise")
            .alias("cls")
        )
    )
    return classified.groupBy("cls").agg(F.count(F.lit(1)).alias("n_points"))


@query(
    "g_knn_join",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_LON} AS lon, CAST({_LAT} AS DOUBLE) AS lat,
         CAST(floor({_LON} / 2) AS BIGINT) AS cx,
         CAST(floor(CAST({_LAT} AS DOUBLE) / 2) AS BIGINT) AS cy
  FROM events
), offs AS (
  SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)
), pairs AS (
  SELECT a.event_id AS a_id, b.event_id AS b_id,
         (a.lon - b.lon) * (a.lon - b.lon)
           + (a.lat - b.lat) * (a.lat - b.lat) AS d2
  FROM (SELECT p.event_id, p.lon, p.lat, p.cx + o.dx AS kx, p.cy + o.dy AS ky
        FROM pts p, offs o) a
  JOIN pts b ON b.cx = a.kx AND b.cy = a.ky
  WHERE abs(a.lon - b.lon) <= 2.0 AND abs(a.lat - b.lat) <= 2.0
        AND b.event_id <> a.event_id
), ranked AS (
  SELECT a_id, b_id, d2,
         count(*) OVER (PARTITION BY a_id) AS n_within,
         row_number() OVER (PARTITION BY a_id ORDER BY d2, b_id) AS rn
  FROM pairs
), picked AS (
  SELECT a_id, b_id, d2, n_within FROM ranked
  WHERE rn = least(4, n_within)
)
SELECT p.event_id,
       coalesce(k.n_within, 0) AS n_within,
       CASE WHEN k.n_within >= 4 THEN k.b_id END AS knn4_id,
       CASE WHEN k.n_within >= 4 THEN k.d2 END AS knn4_d2
FROM pts p LEFT JOIN picked k ON k.a_id = p.event_id
""",
)
def g_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor join (k = 4) within the 2-degree L-inf
    eps-ball — the spatial kNN primitive (reverse-geocode candidates,
    density-adaptive smoothing, kNN feature joins) built on the same
    EXACT 3x3 grid bucketing as g_radius_neighbors: with cell size ==
    eps every candidate lies in the 9 adjacent cells, so one grid
    equality join replaces the quadratic distance join and the kNN
    rank is evaluated per point over its bounded candidate set. Emits
    per point the eps-neighbor count and the 4th-nearest neighbor
    (id + squared euclidean degree distance) when one exists — the
    null band fires at every scale in one direction or the other
    (mean neighbor count ~2.5 at sf0.01, ~25 at sf0.1).

    Hash surface: d2 = dx*dx + dy*dy is mul/add only (IEEE-exact ops,
    identical expression both engines — the Wilson rule, no rounding
    grid) and ranking ties break on b_id. Scale: one grid shuffle +
    one window partitioned BY POINT (candidate sets are eps-ball
    bounded, never corpus-wide); count + row_number share the single
    partition pass."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        _lon().alias("lon"),
        _lat().alias("lat"),
        F.floor(_lon() / 2).cast("bigint").alias("cx"),
        F.floor(_lat() / 2).cast("bigint").alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probes = pts.select(
        "event_id",
        "lon",
        "lat",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
        ).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("kx"),
        (F.col("cy") + F.col("o.dy")).alias("ky"),
    ).select("event_id", "lon", "lat", "kx", "ky")
    b = pts.select(
        F.col("event_id").alias("b_id"),
        F.col("lon").alias("b_lon"),
        F.col("lat").alias("b_lat"),
        F.col("cx").alias("kx"),
        F.col("cy").alias("ky"),
    )
    pairs = (
        # shuffle_hash pin as in g_dbscan_classify: the probe explode
        # wrecks the size estimate and b is corpus-sized
        probes.join(b.hint("shuffle_hash"), ["kx", "ky"])
        .where(
            (F.abs(F.col("lon") - F.col("b_lon")) <= 2.0)
            & (F.abs(F.col("lat") - F.col("b_lat")) <= 2.0)
            & (F.col("event_id") != F.col("b_id"))
        )
        .select(
            F.col("event_id").alias("a_id"),
            "b_id",
            (
                (F.col("lon") - F.col("b_lon")) * (F.col("lon") - F.col("b_lon"))
                + (F.col("lat") - F.col("b_lat")) * (F.col("lat") - F.col("b_lat"))
            ).alias("d2"),
        )
    )
    # r12 REVERT of the r11 collect_list aggregate: collect_list plans
    # as ObjectHashAggregate, which falls back to SORT-based object
    # aggregation once the hash map passes 128 distinct keys
    # (spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold)
    # — with ~1M a_id groups it ALWAYS fell back, so the "aggregate"
    # sorted the full pair stream twice (map+reduce) while serializing
    # a per-group UnsafeArrayData buffer. Under the driver's loaded
    # session that read 5.06 s in-pass / 11.38 s isolated (BENCH_r11
    # budget violation, REPRODUCES); the window form below sorts the
    # pairs ONCE in whole-stage-codegen WindowExec and never built an
    # object buffer (3.06 s in the r10 driver pass, never flagged).
    # Candidate sets are eps-ball bounded, so the per-point partition
    # is bounded (GLOBAL_WINDOW_ALLOWLIST rationale unchanged).
    wp = Window.partitionBy("a_id")
    ranked = pairs.select(
        "a_id",
        "b_id",
        "d2",
        F.count(F.lit(1)).over(wp).alias("n_within"),
        F.row_number().over(wp.orderBy("d2", "b_id")).alias("rn"),
    )
    picked = ranked.where(F.col("rn") == F.least(F.lit(4), F.col("n_within")))
    return (
        pts.select("event_id")
        .join(picked, pts.event_id == picked.a_id, "left")
        .select(
            "event_id",
            F.coalesce(F.col("n_within"), F.lit(0)).alias("n_within"),
            F.when(F.col("n_within") >= 4, F.col("b_id")).alias("knn4_id"),
            F.when(F.col("n_within") >= 4, F.col("d2")).alias("knn4_d2"),
        )
    )


@query(
    "g_rose_histogram",
    oracle=f"""
WITH b AS (
  SELECT round(degrees(atan2(
           sin(radians(13.405 - {_LON})) * cos(radians(52.52)),
           cos(radians({_LAT})) * sin(radians(52.52))
             - sin(radians({_LAT})) * cos(radians(52.52)) * cos(radians(13.405 - {_LON}))
         )), 4) + 0.0 AS bearing_deg,
         user_id
  FROM events
  WHERE event_type = 'purchase'
)
SELECT CAST(floor(((bearing_deg + 360.0) % 360.0) / 45.0) AS BIGINT) AS sector,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users
FROM b
GROUP BY 1
""",
)
def g_rose_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional rose (8-sector bearing histogram) of purchase
    events relative to the Berlin hub — the anisotropy summary a
    movement analysis reads before fitting direction-dependent
    models.  The sector id derives from the 4 dp-ROUNDED bearing
    (g_bearing's transcendental-grid rule), so both engines bucket
    the identical double; the ``(x+360) % 360`` shift keeps the
    operand positive, where fmod agrees across engines.  Scale: per-
    row column math folded into one 8-row hash aggregate."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    dlon = F.radians(F.lit(13.405) - _lon())
    lat1 = F.radians(_lat())
    lat2 = F.radians(F.lit(52.52))
    y = F.sin(dlon) * F.cos(lat2)
    x = F.cos(lat1) * F.sin(lat2) - F.sin(lat1) * F.cos(lat2) * F.cos(dlon)
    bearing = F.round(F.degrees(F.atan2(y, x)), 4) + F.lit(0.0)
    return (
        e.select(
            F.floor(((bearing + 360.0) % 360.0) / 45.0).cast("bigint").alias("sector"),
            "user_id",
        )
        .groupBy("sector")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@query(
    "g_trajectory_resample",
    oracle=f"""
WITH panel AS (
  SELECT user_id, event_id, value,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 14400 AS slot
  FROM events WHERE user_id % 97 = 0
), per_slot AS (
  SELECT user_id, slot, arg_max(value, event_id) AS last_val
  FROM panel GROUP BY user_id, slot
), bounds AS (
  SELECT min(slot) AS mn, max(slot) AS mx FROM panel
), spine AS (
  SELECT u.user_id, s.slot
  FROM (SELECT DISTINCT user_id FROM panel) u
  CROSS JOIN (SELECT unnest(generate_series(mn, mx)) AS slot FROM bounds) s
), filled AS (
  SELECT sp.user_id, sp.slot,
         last_value(ps.last_val IGNORE NULLS) OVER (
           PARTITION BY sp.user_id ORDER BY sp.slot
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
  FROM spine sp LEFT JOIN per_slot ps
    ON ps.user_id = sp.user_id AND ps.slot = sp.slot
)
SELECT user_id, slot * 14400 AS slot_start, fv * 3.6 - 180 AS lon
FROM filled WHERE fv IS NOT NULL
""",
)
def g_trajectory_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory resampling onto a regular 4-hour grid: for a
    deterministic user panel, the last-known position is carried
    forward to every grid slot (LOCF over a DENSE time spine — the
    step that turns irregular pings into the fixed-step series
    movement models consume; latitude is a per-user constant in the
    synthetic frame, so longitude is the resampled coordinate).  The
    spine is sequence()-generated between the panel's slot extent and
    cross-joined onto the user panel; per-slot "last ping wins" uses
    max_by on the unique event_id.  The emitted longitude is pure
    double arithmetic on a stored value — no rounding grid needed.
    Scale: per-(user, slot) partials collapse the facts first; the
    ffill window is one shuffle on user, state one value; the spine
    is |users| x |slots| rows — the resampled output itself.  The
    BROADCAST side of the spine cross join is the SLOT GRID (bounded
    by the corpus time window — calendar grain), never the user
    panel, which grows with the corpus (round-8 broadcast-lineage
    audit)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 97 == 0)
    panel = e.select(
        "user_id",
        "event_id",
        "value",
        F.expr("CAST(unix_timestamp(ts) div 14400 AS BIGINT)").alias("slot"),
    )
    per_slot = panel.groupBy("user_id", "slot").agg(
        F.max_by("value", "event_id").alias("last_val")
    )
    bounds = panel.agg(F.min("slot").alias("mn"), F.max("slot").alias("mx"))
    slots = bounds.select(F.explode(F.sequence("mn", "mx")).alias("slot"))
    users = panel.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(slots))
    wff = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = spine.join(per_slot, ["user_id", "slot"], "left").select(
        "user_id",
        "slot",
        F.last("last_val", ignorenulls=True).over(wff).alias("fv"),
    )
    return filled.where(F.col("fv").isNotNull()).select(
        "user_id",
        (F.col("slot") * 14400).alias("slot_start"),
        (F.col("fv") * 3.6 - 180).alias("lon"),
    )


@query(
    "g_morans_i",
    oracle=f"""
WITH cells AS (
  SELECT CAST(floor({_LON} / 2) AS BIGINT) AS cx,
         CAST(floor({_LAT} / 2) AS BIGINT) AS cy,
         count(*) AS x
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT count(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM cells
), pairs AS (
  SELECT a.x AS xa, b.x AS xb
  FROM cells a
  JOIN cells b
    ON (b.cx = a.cx + 1 AND b.cy = a.cy)
    OR (b.cx = a.cx AND b.cy = a.cy + 1)
)
SELECT (SELECT n FROM tot) AS n_cells,
       CAST(2 * count(*) AS BIGINT) AS w_pairs,
       CAST(2 * SUM((t.n * p.xa - t.s) * (t.n * p.xb - t.s)) AS BIGINT)
         AS cross_dev_scaled,
       (SELECT CAST(SUM((t2.n * c.x - t2.s) * (t2.n * c.x - t2.s)) AS BIGINT)
        FROM cells c, tot t2) AS sq_dev_scaled
FROM pairs p, tot t
""",
)
def g_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of event density over the 2°
    grid — the one-number answer to "is activity spatially CLUSTERED
    or dispersed?", which governs whether grid-partitioned joins will
    hot-spot (the spatial twin of q_key_skew_audit).  Emitted as
    exact integer sufficient statistics: deviations enter scaled by
    n (n·x−S, the q_parallel_variance trick), neighbor pairs come
    from the rook-adjacency EQUALITY join on cell keys (generate
    right/up neighbors only, double the sums — no distance
    predicate, no cartesian), and I = (n/W)·cross/sq assembles
    downstream.  Magnitude: |n·x−S| ≤ n·max(x) ~ 1e8 at sf0.1,
    squared 1e16 × |pairs| — inside int64 at the graded scales, and
    the docstring rule is DECIMAL(38,0) beyond.  Scale: one grid
    aggregate + one equality self-join on (cx, cy)."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        F.floor(_lon() / 2).cast("bigint").alias("cx"),
        F.floor(_lat() / 2).cast("bigint").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("x"))
    tot = cells.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").cast("bigint").alias("s")
    )
    b = cells.select(
        F.col("cx").alias("kx"), F.col("cy").alias("ky"), F.col("x").alias("xb")
    )
    right = cells.select(
        (F.col("cx") + 1).alias("kx"), F.col("cy").alias("ky"),
        F.col("x").alias("xa"),
    )
    up = cells.select(
        F.col("cx").alias("kx"), (F.col("cy") + 1).alias("ky"),
        F.col("x").alias("xa"),
    )
    # rook adjacency as TWO hash equi-joins on shifted keys (an OR
    # join condition planned as BroadcastNestedLoopJoin — O(cells²),
    # measured 4 s at sf0.1; this form is two hash joins)
    pairs = right.unionByName(up).join(b, ["kx", "ky"]).select("xa", "xb")
    crossed = pairs.crossJoin(F.broadcast(tot)).agg(
        (2 * F.count(F.lit(1))).cast("bigint").alias("w_pairs"),
        (
            2
            * F.sum(
                (F.col("n") * F.col("xa") - F.col("s"))
                * (F.col("n") * F.col("xb") - F.col("s"))
            )
        )
        .cast("bigint")
        .alias("cross_dev_scaled"),
    )
    sq = cells.crossJoin(F.broadcast(tot)).agg(
        F.min("n").alias("n_cells"),
        F.sum(
            (F.col("n") * F.col("x") - F.col("s"))
            * (F.col("n") * F.col("x") - F.col("s"))
        )
        .cast("bigint")
        .alias("sq_dev_scaled"),
    )
    return crossed.crossJoin(F.broadcast(sq)).select(
        "n_cells", "w_pairs", "cross_dev_scaled", "sq_dev_scaled"
    )


@query(
    "g_adaptive_grid",
    oracle=f"""
WITH pts AS (
  SELECT CAST(floor({_LON} / 4) AS BIGINT) AS c1x,
         CAST(floor({_LAT} / 4) AS BIGINT) AS c1y,
         CAST(floor({_LON} / 2) AS BIGINT) AS c2x,
         CAST(floor({_LAT} / 2) AS BIGINT) AS c2y
  FROM events
), l1 AS (
  SELECT c1x, c1y, count(*) AS n FROM pts GROUP BY c1x, c1y
), hot AS (
  SELECT c1x, c1y FROM l1 WHERE n > 8
)
SELECT CAST(1 AS BIGINT) AS level, l1.c1x AS cx, l1.c1y AS cy,
       CAST(l1.n AS BIGINT) AS n
FROM l1 LEFT JOIN hot ON hot.c1x = l1.c1x AND hot.c1y = l1.c1y
WHERE hot.c1x IS NULL
UNION ALL
SELECT CAST(2 AS BIGINT), p.c2x, p.c2y, count(*)
FROM pts p JOIN hot ON hot.c1x = p.c1x AND hot.c1y = p.c1y
GROUP BY p.c2x, p.c2y
""",
)
def g_adaptive_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive (quadtree-style) grid refinement: 4° level-1 cells
    whose count exceeds the 8-point capacity SUBDIVIDE into their
    2° children, everything else stays coarse — the density-adaptive
    tiling that keeps per-cell work bounded where uniform grids
    (g_grid_agg) hot-spot, and the partition-layout answer to what
    g_morans_i / q_key_skew_audit diagnose.  Two aggregates + one
    broadcast semi/anti split on the hot-cell list; capacity 8 tuned
    on the MEASURED per-cell distribution (p99 = 8 at sf0.01, max 14;
    p90 = 31 at sf0.1) so BOTH levels are populated at BOTH gate
    scales — a 0-row refinement branch is vacuous evidence.
    At depth k the same plan chains k conditional refinements —
    each a cells-sized, not points-sized, decision."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        F.floor(_lon() / 4).cast("bigint").alias("c1x"),
        F.floor(_lat() / 4).cast("bigint").alias("c1y"),
        F.floor(_lon() / 2).cast("bigint").alias("c2x"),
        F.floor(_lat() / 2).cast("bigint").alias("c2y"),
    )
    l1 = pts.groupBy("c1x", "c1y").agg(F.count(F.lit(1)).alias("n"))
    hot = l1.where(F.col("n") > 8).select("c1x", "c1y")
    cold = l1.join(F.broadcast(hot), ["c1x", "c1y"], "left_anti").select(
        F.lit(1).cast("bigint").alias("level"),
        F.col("c1x").alias("cx"),
        F.col("c1y").alias("cy"),
        F.col("n").cast("bigint").alias("n"),
    )
    fine = (
        pts.join(F.broadcast(hot), ["c1x", "c1y"])
        .groupBy("c2x", "c2y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(2).cast("bigint").alias("level"),
            F.col("c2x").alias("cx"),
            F.col("c2y").alias("cy"),
            F.col("n").cast("bigint").alias("n"),
        )
    )
    return cold.unionByName(fine)


@query(
    "g_zonal_stats",
    oracle=f"""
WITH assigned AS (
  SELECT e.event_id, e.value, h.hub,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY round(2 * 6371.0088 * asin(sqrt(
             pow(sin(radians({_LAT} - h.hlat) / 2), 2)
             + cos(radians({_LAT})) * cos(radians(h.hlat))
               * pow(sin(radians({_LON} - h.hlon) / 2), 2))), 4) ASC,
           h.hub ASC) AS rn
  FROM events e
  CROSS JOIN (VALUES {_HUB_VALUES}) h(hub, hlon, hlat)
  WHERE e.event_type = 'purchase'
)
SELECT hub,
       count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
         AS value_sum,
       max(value) AS value_max
FROM assigned WHERE rn = 1
GROUP BY hub
""",
)
def g_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics over Voronoi catchments: every purchase is
    assigned to its nearest hub (g_nearest_hub's argmin, inlined) and
    each hub zone reports count / exact-decimal value mass / max —
    the named geospatial operation (zonal stats) that turns a point
    assignment into per-zone aggregates, i.e. the catchment revenue
    table.  Same 4 dp haversine grid and hub-name tiebreak as the
    assignment operator, decimal-staged sums per the hash rules.
    Scale: broadcast 6-row hub dim, per-point window on the 6-way
    product, then one |hubs|-row aggregate — the fact table shuffles
    once (for the per-event argmin partitioning)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    hubs = spark.sql(f"SELECT * FROM (VALUES {_HUB_VALUES}) AS t(hub, hlon, hlat)")
    lat1 = F.radians(_lat())
    dlat = F.radians(_lat() - F.col("hlat"))
    dlon = F.radians(_lon() - F.col("hlon"))
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(F.radians(F.col("hlat"))) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = F.round(F.lit(2 * 6371.0088) * F.asin(F.sqrt(a)), 4)
    w = Window.partitionBy("event_id").orderBy(
        F.col("dist_km").asc(), F.col("hub").asc()
    )
    assigned = (
        e.crossJoin(F.broadcast(hubs))
        .select("event_id", "value", "hub", dist.alias("dist_km"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return assigned.groupBy("hub").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias(
            "value_sum"
        ),
        F.max("value").alias("value_max"),
    )


def _hexbin_sql(table: str) -> str:
    """Axial hex binning (pointy-top, size 3°), one SQL text for BOTH
    engines — cube rounding via floor(v+0.5) + largest-diff fix.
    floor() types differ across engines (Spark BIGINT, DuckDB DOUBLE)
    but every branch coerces back to double and the final CAST lands
    on exactly-integral values, so both casts are exact."""
    return f"""
WITH pt AS (
  SELECT event_id, user_id, CAST({_LON} AS DOUBLE) AS x,
         CAST({_LAT} AS DOUBLE) AS y
  FROM {table}
),
ax AS (
  SELECT event_id, user_id,
         (sqrt(3e0) / 3e0 * x - y / 3e0) / 3e0 AS xf,
         (2e0 / 3e0 * y) / 3e0 AS zf
  FROM pt
),
rnd AS (
  SELECT event_id, user_id, xf, zf, (0.0 - xf - zf) AS yf,
         floor(xf + 0.5) AS rx,
         floor((0.0 - xf - zf) + 0.5) AS ry,
         floor(zf + 0.5) AS rz
  FROM ax
),
fixed AS (
  SELECT event_id, user_id,
    CASE WHEN abs(rx - xf) > abs(ry - yf) AND abs(rx - xf) > abs(rz - zf)
         THEN 0.0 - ry - rz ELSE rx END AS hx,
    CASE WHEN NOT (abs(rx - xf) > abs(ry - yf) AND abs(rx - xf) > abs(rz - zf))
              AND NOT (abs(ry - yf) > abs(rz - zf))
         THEN 0.0 - rx - ry ELSE rz END AS hz
  FROM rnd
)
SELECT CAST(hx AS BIGINT) AS hq, CAST(hz AS BIGINT) AS hr,
       count(*) AS n, count(DISTINCT user_id) AS n_users,
       min(event_id) AS first_id
FROM fixed GROUP BY hq, hr
"""


@query("g_hex_bin", oracle=_hexbin_sql("events"))
def g_hex_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal spatial binning (the H3/Uber-style grid, here a pure
    axial-coordinate implementation): every event point lands in a
    pointy-top hex cell via the textbook axial transform + cube
    rounding (round each cube coordinate with floor(v+0.5), then
    re-derive the one with the largest rounding error so x+y+z = 0
    holds).  Hexagons complete the spatial-index family next to
    [g_geohash] (rectangles) and [g_zorder_key] (space-filling curve)
    — equidistant neighbors make them the standard choice for
    density/mobility analytics.  Determinism: one shared SQL text
    drives BOTH engines; all decisions are IEEE comparisons on
    identically-derived doubles, floor is exact, and the final casts
    hit exactly-integral values (engine cast-rounding difference is
    moot).  Scale: stateless per-row math + one partial-aggregated
    groupBy on the cell key — the same one-shuffle shape as every grid
    rollup here."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("hex_ev")
    return spark.sql(_hexbin_sql("hex_ev"))


_DP_TOL = 167_000_000_000  # ~median per-user max deviation (all scales)


@query(
    "g_simplify_split",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS x,
         CAST(floor({_LON} * 100) AS BIGINT) AS y
  FROM events
), ends AS (
  SELECT user_id,
         arg_min(x, event_id) AS x0, arg_min(y, event_id) AS y0,
         arg_max(x, event_id) AS xe, arg_max(y, event_id) AS ye,
         count(*) AS n_pts
  FROM pts GROUP BY user_id
), dev AS (
  SELECT p.user_id, p.event_id,
         abs((e.xe - e.x0) * (p.y - e.y0) - (e.ye - e.y0) * (p.x - e.x0))
           AS dev
  FROM pts p JOIN ends e USING (user_id)
  WHERE e.n_pts >= 3
), mx AS (
  SELECT user_id, max(dev) AS max_dev FROM dev GROUP BY user_id
)
SELECT m.user_id,
       e.n_pts,
       m.max_dev,
       (SELECT min(d.event_id) FROM dev d
        WHERE d.user_id = m.user_id AND d.dev = m.max_dev) AS split_event_id,
       CASE WHEN m.max_dev > {_DP_TOL} THEN 1 ELSE 0 END AS needs_split
FROM mx m JOIN ends e USING (user_id)
""",
)
def g_simplify_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Douglas-Peucker refinement level per user track — the
    polyline-simplification primitive (Douglas & Peucker 1973) that
    decides, for each trajectory, whether the chord from first to
    last ping represents it within tolerance and where to split if
    not.  Deviation is the INTEGER doubled-triangle-area cross
    product |(Pe-P0) x (Pi-P0)| on the (epoch-second, centi-degree
    longitude) grid — exact BIGINT, no perpendicular-distance
    division, so the argmax point and the split verdict hash-check
    across engines (magnitudes <= ~4.5e11, far under 2^63; the full
    recursion would iterate this operator on the two halves).
    Tolerance {_DP_TOL} is the MEASURED median per-user max deviation
    (1.67e11 at sf0.001/0.01/0.1 alike), so both the split and the
    keep branch fire at every scale.  The split point is the
    SMALLEST event id attaining the max (two-step min-where-max —
    engine argmax tiebreaks are not portable).  Scale: one shuffle to
    user grain for the chord endpoints (min_by/max_by on the unique
    event id), one re-join, one max — per-user groups grow with
    per-user history, never with user count."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("x"),
        F.floor(F.expr(_LON) * 100).cast("bigint").alias("y"),
    )
    ends = pts.groupBy("user_id").agg(
        F.min_by("x", "event_id").alias("x0"),
        F.min_by("y", "event_id").alias("y0"),
        F.max_by("x", "event_id").alias("xe"),
        F.max_by("y", "event_id").alias("ye"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    dev = (
        pts.join(ends, "user_id")
        .where(F.col("n_pts") >= 3)
        .select(
            "user_id",
            "event_id",
            "n_pts",
            F.abs(
                (F.col("xe") - F.col("x0")) * (F.col("y") - F.col("y0"))
                - (F.col("ye") - F.col("y0")) * (F.col("x") - F.col("x0"))
            ).alias("dev"),
        )
    )
    mx = dev.groupBy("user_id").agg(
        F.max("dev").alias("max_dev"), F.min("n_pts").alias("n_pts")
    )
    split = (
        dev.join(mx.select("user_id", "max_dev"), "user_id")
        .where(F.col("dev") == F.col("max_dev"))
        .groupBy("user_id")
        .agg(F.min("event_id").alias("split_event_id"))
    )
    return (
        mx.join(split, "user_id")
        .select(
            "user_id",
            "n_pts",
            "max_dev",
            "split_event_id",
            F.when(F.col("max_dev") > _DP_TOL, 1).otherwise(0).alias("needs_split"),
        )
    )
