"""spatial3d analog — geodesic queries via 3D unit-sphere vectors.

The reference's ``lucene/spatial3d`` module models geo shapes as 3D
planar solids on the unit sphere (``geom3d/GeoPoint.java`` — points as
(x, y, z); ``geom3d/GeoStandardPath.java`` — a buffered polyline "path"
shape; ``geom3d/Plane.java`` — membership/distance via plane algebra).
Its headline capability beyond the 2D LatLonPoint family is the PATH
query: "points within distance D of a polyline route".

Spark shape: every formula below is closed-form trigonometry over two
double columns, compiled once per path SEGMENT into plain JVM column
expressions (the segment constants — endpoint vectors, great-circle
normals, lune test vectors — are Python floats baked into the plan at
build time, the spatial3d XYZBounds analog).  The whole predicate runs
inside whole-stage codegen: no UDF, no Python, and the path's expanded
bounding box is emitted as a separate lat/lon range conjunct so
Catalyst pushes it into the scan (parquet min/max pruning) before the
exact arc math runs — the same two-phase plan as
``functions/geo.distance_query``.

Geometry (unit sphere, mean Earth radius for meters):
for a segment A -> B with great-circle normal n = unit(A x B), a point
P lies "inside the segment's lune" iff ((n x A) . P) >= 0 and
((B x n) . P) >= 0 — then its distance to the arc is the cross-track
angle asin(|P . n|); otherwise it is the nearer endpoint arc
acos(P . A) / acos(P . B).  Path distance = min over segments.  This
is the textbook cross-track/along-track construction
(``GeoStandardPath.PathSegment.pathDistance`` computes the same
quantity with plane algebra)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from lucene_1_spark.functions.geo import EARTH_MEAN_RADIUS_M


def _xyz(lat_deg: float, lon_deg: float) -> tuple[float, float, float]:
    la, lo = math.radians(lat_deg), math.radians(lon_deg)
    return (math.cos(la) * math.cos(lo),
            math.cos(la) * math.sin(lo),
            math.sin(la))


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _unit(v):
    n = math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    if n == 0.0:
        raise ValueError("degenerate path segment (antipodal or "
                         "coincident endpoints)")
    return (v[0] / n, v[1] / n, v[2] / n)


def _dot_col(v, px: Column, py: Column, pz: Column) -> Column:
    return px * float(v[0]) + py * float(v[1]) + pz * float(v[2])


def _clamp1(c: Column) -> Column:
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), c))


def point_xyz(lat_col, lon_col) -> tuple[Column, Column, Column]:
    """Unit-sphere (x, y, z) columns for (lat, lon) degree columns —
    the GeoPoint constructor as three codegen'd expressions."""
    la, lo = F.radians(lat_col), F.radians(lon_col)
    return (F.cos(la) * F.cos(lo), F.cos(la) * F.sin(lo), F.sin(la))


def _segment_dist_rad(seg, px: Column, py: Column, pz: Column) -> Column:
    """Angular distance (radians) from P to one great-circle segment."""
    a, b = seg
    n = _unit(_cross(a, b))
    lune_a = _cross(n, a)        # points from A toward B
    lune_b = _cross(b, n)        # points from B toward A
    inside = (_dot_col(lune_a, px, py, pz) >= 0.0) & \
             (_dot_col(lune_b, px, py, pz) >= 0.0)
    cross_track = F.asin(_clamp1(F.abs(_dot_col(n, px, py, pz))))
    endpoint = F.least(F.acos(_clamp1(_dot_col(a, px, py, pz))),
                       F.acos(_clamp1(_dot_col(b, px, py, pz))))
    return F.when(inside, cross_track).otherwise(endpoint)


def path_distance_meters(lat_col, lon_col,
                         path: list[tuple[float, float]]) -> Column:
    """Meters from each (lat, lon) row to the geodesic polyline
    ``path`` (list of (lat, lon) vertices) — GeoStandardPath's
    distance, min over segments, as ONE column expression."""
    if len(path) < 2:
        raise ValueError("path needs >= 2 vertices")
    pts = [_xyz(la, lo) for la, lo in path]
    px, py, pz = point_xyz(lat_col, lon_col)
    dists = [_segment_dist_rad((pts[i], pts[i + 1]), px, py, pz)
             for i in range(len(pts) - 1)]
    rad = dists[0] if len(dists) == 1 else F.least(*dists)
    return rad * EARTH_MEAN_RADIUS_M


def path_bbox(path: list[tuple[float, float]],
              radius_m: float) -> tuple[float, float, float, float] | None:
    """Expanded (min_lat, max_lat, min_lon, max_lon) prefilter box for
    the buffered path, or None when the expansion wraps (polar/dateline
    regimes — then the exact test runs unprefiltered, the same
    degradation GeoUtils applies to polar-cap circles)."""
    lat_pad = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    min_lat = min(p[0] for p in path) - lat_pad
    max_lat = max(p[0] for p in path) + lat_pad
    if min_lat <= -89.0 or max_lat >= 89.0:
        return None
    max_abs = max(abs(min_lat), abs(max_lat))
    lon_pad = lat_pad / math.cos(math.radians(max_abs))
    min_lon = min(p[1] for p in path) - lon_pad
    max_lon = max(p[1] for p in path) + lon_pad
    if min_lon < -180.0 or max_lon > 180.0 or (max_lon - min_lon) >= 180.0:
        return None
    return (min_lat, max_lat, min_lon, max_lon)


def path_distance_query(df: DataFrame, path: list[tuple[float, float]],
                        radius_m: float, lat_col: str = "lat",
                        lon_col: str = "lon") -> DataFrame:
    """Rows within ``radius_m`` of the geodesic path — two-phase: a
    pushable bbox range conjunct (when the expanded box is sane), then
    the exact min-over-segments arc test."""
    la, lo = F.col(lat_col), F.col(lon_col)
    out = df
    box = path_bbox(path, radius_m)
    if box is not None:
        out = out.filter((la >= box[0]) & (la <= box[1])
                         & (lo >= box[2]) & (lo <= box[3]))
    return out.filter(
        path_distance_meters(la, lo, path) <= float(radius_m))


# ---------------------------------------------------------------------------
# SQL twin generator — the same closed form in ANSI SQL, used by the
# driver oracle so the formula (not just the rows) is cross-checked
# ---------------------------------------------------------------------------

def path_distance_sql(lat_expr: str, lon_expr: str,
                      path: list[tuple[float, float]]) -> str:
    """ANSI-SQL expression (DuckDB-compatible) computing the same
    path distance in meters."""
    pts = [_xyz(la, lo) for la, lo in path]
    px = f"(cos(radians({lat_expr})) * cos(radians({lon_expr})))"
    py = f"(cos(radians({lat_expr})) * sin(radians({lon_expr})))"
    pz = f"(sin(radians({lat_expr})))"

    def dot(v):
        return (f"({px} * {v[0]!r} + {py} * {v[1]!r} + {pz} * {v[2]!r})")

    def clamp(e):
        return f"least(1.0, greatest(-1.0, {e}))"

    segs = []
    for i in range(len(pts) - 1):
        a, b = pts[i], pts[i + 1]
        n = _unit(_cross(a, b))
        lune_a, lune_b = _cross(n, a), _cross(b, n)
        seg = (f"(CASE WHEN {dot(lune_a)} >= 0 AND {dot(lune_b)} >= 0 "
               f"THEN asin({clamp(f'abs({dot(n)})')}) "
               f"ELSE least(acos({clamp(dot(a))}), acos({clamp(dot(b))})) "
               f"END)")
        segs.append(seg)
    body = segs[0] if len(segs) == 1 else "least(" + ", ".join(segs) + ")"
    return f"({body} * {EARTH_MEAN_RADIUS_M!r})"
