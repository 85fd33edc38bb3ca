"""Geo-point queries over (lat, lon) doc columns — the LatLonPoint
family re-expressed relationally.

Reference semantics:
- ``document/LatLonPoint.java`` ``newBoxQuery`` / ``newDistanceQuery``
  — box matching with dateline crossing (minLon > maxLon splits into
  two ranges), distance matching within ``radiusMeters`` of a center;
- ``search/LatLonPointDistanceQuery.java`` — two-phase execution: a
  cheap bounding-box reject (BKD tree ranges there; parquet row-group
  min/max pruning here) before the exact haversine test;
- ``geo/GeoUtils.java`` — EARTH_MEAN_RADIUS as the haversine sphere,
  polar-cap handling when the radius box touches a pole;
- ``document/LatLonPoint.nearest`` (LatLonPointPrototypeQueries) —
  k nearest points by haversine distance.

Spark shape: every predicate is a plain JVM column expression on two
double columns, so Catalyst pushes the box ranges into the scan
(``PushedFilters`` on lat/lon) and the haversine runs inside
whole-stage codegen — no Python, no UDF.  ``nearest`` is a projection +
TakeOrderedAndProject.  At 10^12-row scale, point sets queried
repeatedly should be stored partitioned/z-ordered by a coarse geohash
of (lat, lon) so the box prefilter prunes whole partitions — the same
pre-bucketing contract the IVF ANN path uses for vectors."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# GeoUtils.EARTH_MEAN_RADIUS (meters) — the haversine sphere radius
EARTH_MEAN_RADIUS_M = 6_371_008.7714150598


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


def haversine_meters(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters (haversine on the mean-radius
    sphere, ``geo/SloppyMath.haversinMeters`` contract).  Pure JVM
    column arithmetic; accepts Columns or float literals."""
    lat1, lon1, lat2, lon2 = _c(lat1), _c(lon1), _c(lat2), _c(lon2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlon) * F.sin(dlon))
    return 2.0 * EARTH_MEAN_RADIUS_M * F.asin(F.sqrt(a))


def box_predicate(lat_col, lon_col, min_lat: float, max_lat: float,
                  min_lon: float, max_lon: float) -> Column:
    """Bounding-box membership (``LatLonPoint.newBoxQuery``).  A box
    with ``min_lon > max_lon`` crosses the dateline and matches the
    union of the two lon ranges (``LatLonPointInBoxQuery`` splits the
    same way)."""
    lat_col, lon_col = _c(lat_col), _c(lon_col)
    lat_ok = (lat_col >= min_lat) & (lat_col <= max_lat)
    if min_lon <= max_lon:
        return lat_ok & (lon_col >= min_lon) & (lon_col <= max_lon)
    return lat_ok & ((lon_col >= min_lon) | (lon_col <= max_lon))


def distance_box(center_lat: float, center_lon: float,
                 radius_m: float) -> tuple[float, float, float, float]:
    """The smallest lat/lon box containing the distance circle
    (``GeoUtils.boundingBox`` role): used as the pushdown prefilter.
    Returns (min_lat, max_lat, min_lon, max_lon); a polar-cap overlap
    or a full wrap widens lon to the whole range (min_lon <= -180 and
    max_lon >= 180 → no lon constraint)."""
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    min_lat = max(center_lat - dlat, -90.0)
    max_lat = min(center_lat + dlat, 90.0)
    # if the circle touches a pole every longitude can match
    if min_lat <= -90.0 + 1e-12 or max_lat >= 90.0 - 1e-12:
        return min_lat, max_lat, -180.0, 180.0
    # widest lon span occurs at the circle's extreme |latitude|; using
    # it everywhere is conservative (a slightly larger box), which is
    # safe — the exact haversine verify runs after the prefilter
    extreme = max(abs(min_lat), abs(max_lat))
    cos_lat = max(math.cos(math.radians(min(extreme, 89.999999))), 1e-12)
    dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_M * cos_lat))
    if dlon >= 180.0:
        return min_lat, max_lat, -180.0, 180.0
    min_lon = center_lon - dlon
    max_lon = center_lon + dlon
    # wrap across the dateline into a crossing box
    if min_lon < -180.0:
        min_lon += 360.0
    if max_lon > 180.0:
        max_lon -= 360.0
    return min_lat, max_lat, min_lon, max_lon


def polygon_predicate(lat_col, lon_col,
                      vertices: list[tuple[float, float]]) -> Column:
    """Point-in-polygon membership (``LatLonPoint.newPolygonQuery`` /
    ``geo/Polygon.java``) by even-odd ray casting: a point is inside
    iff a ray cast eastward crosses an odd number of edges
    (``geo/GeoUtils.java`` lineage; the standard crossing-number test).

    ``vertices`` is the (lat, lon) ring, closed implicitly (last joins
    first); must not cross the dateline (split such polygons into two,
    as the reference's Polygon docs require).  Boundary points follow
    the half-open crossing rule (deterministic, may differ from the
    reference on exact-edge hits — documented).  The whole test
    compiles to one JVM boolean column (a sum of per-edge CASE terms
    mod 2), so it runs in whole-stage codegen and survives at scale
    with zero Python."""
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    lat_col, lon_col = _c(lat_col), _c(lon_col)
    crossings = None
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses an eastward ray
        # half-open rule: edge counts when exactly one endpoint is
        # strictly above the point's latitude
        straddles = (F.lit(y1) > lat_col) != (F.lit(y2) > lat_col)
        # lon of the edge at the point's latitude
        x_at = (x2 - x1) * (lat_col - y1) / (y2 - y1) + x1
        term = F.when(straddles & (lon_col < x_at), 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    if crossings is None:
        return F.lit(False)
    return crossings % 2 == 1


def polygon_query(df: DataFrame, lat: str = "lat", lon: str = "lon", *,
                  vertices: list[tuple[float, float]]) -> DataFrame:
    """Rows inside the polygon, with the ring's bounding box pushed to
    the scan before the ray cast (the BKD-reject two-phase shape of
    ``LatLonPointInPolygonQuery``)."""
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    pre = box_predicate(F.col(lat), F.col(lon),
                        min(lats), max(lats), min(lons), max(lons))
    return df.filter(pre).filter(
        polygon_predicate(F.col(lat), F.col(lon), vertices))


def distance_query(df: DataFrame, lat: str = "lat", lon: str = "lon", *,
                   center_lat: float, center_lon: float, radius_m: float,
                   distance_col: str | None = None) -> DataFrame:
    """Rows within ``radius_m`` meters of the center
    (``LatLonPoint.newDistanceQuery`` /
    ``LatLonPointDistanceQuery.java`` two-phase): the bounding-box
    predicate prunes at the scan, then the exact haversine keeps true
    matches.  ``distance_col`` optionally appends the distance."""
    mn_lat, mx_lat, mn_lon, mx_lon = distance_box(
        center_lat, center_lon, radius_m)
    pre = box_predicate(F.col(lat), F.col(lon),
                        mn_lat, mx_lat, mn_lon, mx_lon)
    dist = haversine_meters(F.col(lat), F.col(lon),
                            center_lat, center_lon)
    out = df.filter(pre).filter(dist <= float(radius_m))
    if distance_col:
        out = out.withColumn(distance_col, dist)
    return out


def nearest(df: DataFrame, lat: str = "lat", lon: str = "lon", *,
            center_lat: float, center_lon: float, k: int = 10,
            distance_col: str = "distance_m") -> DataFrame:
    """k nearest rows by haversine distance
    (``LatLonPoint.nearest``).  One projection + TakeOrdered; ties
    break on every remaining column deterministically only if the
    caller orders them — the returned frame is sorted (distance asc)
    and limited to k."""
    dist = haversine_meters(F.col(lat), F.col(lon), center_lat, center_lon)
    # only docs with indexed points participate (LatLonPoint.nearest):
    # ascending sort is NULLS FIRST in Spark, so null lat/lon rows
    # would otherwise fill the top-k ahead of every real neighbor
    return (df.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
            .withColumn(distance_col, dist)
            .orderBy(F.asc(distance_col)).limit(k))
