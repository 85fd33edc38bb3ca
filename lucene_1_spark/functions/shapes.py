"""Geo-shape queries over polygon-per-document columns — the
LatLonShape family re-expressed relationally.

Reference semantics:
- ``document/LatLonShape.java:79-98`` — ``createIndexableFields``
  stores a polygon per document (triangulated into a BKD tree there);
  ``newBoxQuery`` / ``newPolygonQuery`` match documents whose shape
  relates to the query geometry under a ``QueryRelation``;
- ``document/ShapeField.java`` ``QueryRelation`` —
  INTERSECTS / WITHIN / DISJOINT / CONTAINS;
- ``geo/Polygon.java`` — rings must not cross the dateline (the
  reference requires callers to split such polygons; same contract
  here); even-odd interior rule.

Spark shape: a document's ring is two ``array<double>`` columns
(``ring_lats`` / ``ring_lons``, closed implicitly).  ``index_shapes``
adds four bounding-box columns — at scale these are persisted in the
parquet so row-group min/max stats prune whole files before any exact
test runs, the same two-phase reject the reference gets from the BKD
tree.  The exact relation tests (point-in-ring crossing counts,
segment-segment orientation tests) compile to JVM higher-order-function
expressions over the ring arrays — no Python, no UDF, codegen-friendly,
cost O(ring length) per surviving row.

Boundary semantics: interior tests use the half-open crossing rule and
edge-crossing tests use strict orientation signs, so shapes that only
touch at a boundary point/edge (measure-zero configurations) may
classify either way — deterministic, but may differ from the
reference's tessellation-exact boundary handling (documented
deviation)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BBOX_COLS = ("shape_min_lat", "shape_max_lat", "shape_min_lon",
             "shape_max_lon")


def index_shapes(df: DataFrame, lats_col: str = "ring_lats",
                 lons_col: str = "ring_lons") -> DataFrame:
    """Add the ring bounding-box columns (``LatLonShape``'s coarse
    index role): persist these with the table so parquet row-group
    stats prune scans before the exact per-ring tests."""
    return (df
            .withColumn("shape_min_lat", F.array_min(F.col(lats_col)))
            .withColumn("shape_max_lat", F.array_max(F.col(lats_col)))
            .withColumn("shape_min_lon", F.array_min(F.col(lons_col)))
            .withColumn("shape_max_lon", F.array_max(F.col(lons_col))))


def _edges(lats_col: str, lons_col: str) -> Column:
    """Ring edge list: array of structs (y1,x1,y2,x2), last vertex
    joined back to the first.  (lon, lat) plays (x, y)."""
    lats, lons = F.col(lats_col), F.col(lons_col)
    n = F.size(lats)
    i = F.sequence(F.lit(1), n)  # element_at is 1-based
    nxt = lambda j: F.when(j == n, F.lit(1)).otherwise(j + 1)  # noqa: E731
    return F.transform(i, lambda j: F.struct(
        F.element_at(lats, j).alias("y1"),
        F.element_at(lons, j).alias("x1"),
        F.element_at(lats, nxt(j)).alias("y2"),
        F.element_at(lons, nxt(j)).alias("x2")))


def _point_in_ring(py: Column, px: Column, edges: Column) -> Column:
    """Even-odd crossing count of an eastward ray from (py, px)
    against the ring's edges (``geo/GeoUtils`` crossing-number
    lineage, identical formula to geo.polygon_predicate)."""
    def term(e):
        straddles = (e["y1"] > py) != (e["y2"] > py)
        x_at = ((e["x2"] - e["x1"]) * (py - e["y1"])
                / (e["y2"] - e["y1"]) + e["x1"])
        return F.when(straddles & (px < x_at), 1).otherwise(0)
    total = F.aggregate(edges, F.lit(0), lambda acc, e: acc + term(e))
    return total % 2 == 1


def _orient(ax, ay, bx, by, cx, cy) -> Column:
    """Signed twice-area of triangle ABC: >0 counter-clockwise."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _seg_cross(e: Column, cx1, cy1, cx2, cy2) -> Column:
    """Proper (strict) crossing of ring edge ``e`` with the constant
    segment (cx1,cy1)→(cx2,cy2): both endpoint pairs on strictly
    opposite sides of the other segment's line."""
    ax, ay, bx, by = e["x1"], e["y1"], e["x2"], e["y2"]
    o1 = _orient(ax, ay, bx, by, F.lit(cx1), F.lit(cy1))
    o2 = _orient(ax, ay, bx, by, F.lit(cx2), F.lit(cy2))
    o3 = _orient(F.lit(cx1), F.lit(cy1), F.lit(cx2), F.lit(cy2), ax, ay)
    o4 = _orient(F.lit(cx1), F.lit(cy1), F.lit(cx2), F.lit(cy2), bx, by)
    return (o1 * o2 < 0) & (o3 * o4 < 0)


def _cross_with(seg):
    """Unary-lambda factory for higher-order functions (PySpark
    inspects lambda arity, so default-arg capture is not usable)."""
    return lambda e: _seg_cross(e, *seg)


def _bbox_overlap(min_lat: float, max_lat: float,
                  min_lon: float, max_lon: float) -> Column:
    return ((F.col("shape_min_lat") <= max_lat)
            & (F.col("shape_max_lat") >= min_lat)
            & (F.col("shape_min_lon") <= max_lon)
            & (F.col("shape_max_lon") >= min_lon))


def box_intersects(df: DataFrame, min_lat: float, max_lat: float,
                   min_lon: float, max_lon: float,
                   lats_col: str = "ring_lats",
                   lons_col: str = "ring_lons") -> Column:
    """INTERSECTS relation against a query box
    (``LatLonShape.newBoxQuery`` with ``QueryRelation.INTERSECTS``).

    Exactness: a simple ring and an axis-aligned box share interior
    iff (a) some ring vertex lies in the box, or (b) some box corner
    lies in the ring (covers box-inside-polygon), or (c) some ring
    edge properly crosses a box edge (covers pass-through overlap).
    The bbox test runs first as the prunable prefilter."""
    del df  # predicate builder; frame passed for API symmetry
    lats, lons = F.col(lats_col), F.col(lons_col)
    edges = _edges(lats_col, lons_col)
    vertex_in_box = F.exists(
        F.arrays_zip(lats.alias("la"), lons.alias("lo")),
        lambda v: (v["la"] >= min_lat) & (v["la"] <= max_lat)
        & (v["lo"] >= min_lon) & (v["lo"] <= max_lon))
    corners = [(min_lat, min_lon), (min_lat, max_lon),
               (max_lat, max_lon), (max_lat, min_lon)]
    corner_in_ring = None
    for (cy, cx) in corners:
        t = _point_in_ring(F.lit(cy), F.lit(cx), edges)
        corner_in_ring = t if corner_in_ring is None else corner_in_ring | t
    box_segs = [(corners[i][1], corners[i][0],
                 corners[(i + 1) % 4][1], corners[(i + 1) % 4][0])
                for i in range(4)]
    edge_cross = None
    for seg in box_segs:
        t = F.exists(edges, _cross_with(seg))
        edge_cross = t if edge_cross is None else edge_cross | t
    return (_bbox_overlap(min_lat, max_lat, min_lon, max_lon)
            & (vertex_in_box | corner_in_ring | edge_cross))


def box_within(df: DataFrame, min_lat: float, max_lat: float,
               min_lon: float, max_lon: float) -> Column:
    """WITHIN relation against a query box: a ring lies inside an
    axis-aligned box iff its bounding box does — exact, and entirely
    answered by the four indexed bbox columns (pure pushdown)."""
    del df
    return ((F.col("shape_min_lat") >= min_lat)
            & (F.col("shape_max_lat") <= max_lat)
            & (F.col("shape_min_lon") >= min_lon)
            & (F.col("shape_max_lon") <= max_lon))


def box_disjoint(df: DataFrame, min_lat: float, max_lat: float,
                 min_lon: float, max_lon: float,
                 lats_col: str = "ring_lats",
                 lons_col: str = "ring_lons") -> Column:
    """DISJOINT relation: no point in common (complement of
    INTERSECTS, ``ShapeField.QueryRelation.DISJOINT``)."""
    return ~box_intersects(df, min_lat, max_lat, min_lon, max_lon,
                           lats_col, lons_col)


def box_contains(df: DataFrame, min_lat: float, max_lat: float,
                 min_lon: float, max_lon: float,
                 lats_col: str = "ring_lats",
                 lons_col: str = "ring_lons") -> Column:
    """CONTAINS relation: the document ring fully contains the query
    box — all four box corners interior to the ring and no ring edge
    properly crossing a box edge (sound for simple rings: a boundary
    entering the box must cross one of its edges)."""
    del df
    edges = _edges(lats_col, lons_col)
    corners = [(min_lat, min_lon), (min_lat, max_lon),
               (max_lat, max_lon), (max_lat, min_lon)]
    all_corners_in = None
    for (cy, cx) in corners:
        t = _point_in_ring(F.lit(cy), F.lit(cx), edges)
        all_corners_in = t if all_corners_in is None else all_corners_in & t
    box_segs = [(corners[i][1], corners[i][0],
                 corners[(i + 1) % 4][1], corners[(i + 1) % 4][0])
                for i in range(4)]
    any_cross = None
    for s in box_segs:
        t = F.exists(edges, _cross_with(s))
        any_cross = t if any_cross is None else any_cross | t
    pre = ((F.col("shape_min_lat") <= min_lat)
           & (F.col("shape_max_lat") >= max_lat)
           & (F.col("shape_min_lon") <= min_lon)
           & (F.col("shape_max_lon") >= max_lon))
    return pre & all_corners_in & ~any_cross


def polygon_intersects(df: DataFrame,
                       vertices: list[tuple[float, float]],
                       lats_col: str = "ring_lats",
                       lons_col: str = "ring_lons") -> Column:
    """INTERSECTS relation against a constant query polygon
    (``LatLonShape.newPolygonQuery``): some document vertex interior
    to the query ring, or some query vertex interior to the document
    ring, or a proper edge-edge crossing.  Query-ring bbox runs first
    as the prunable prefilter."""
    del df
    if len(vertices) < 3:
        raise ValueError("query polygon needs >= 3 vertices")
    lats, lons = F.col(lats_col), F.col(lons_col)
    edges = _edges(lats_col, lons_col)
    q_lats = [v[0] for v in vertices]
    q_lons = [v[1] for v in vertices]
    # doc vertex inside the (constant) query ring: constant-folded
    # crossing terms per vertex
    n = len(vertices)

    def const_ring_contains(py: Column, px: Column) -> Column:
        total = None
        for i in range(n):
            y1, x1 = vertices[i]
            y2, x2 = vertices[(i + 1) % n]
            if y1 == y2:
                continue
            straddles = (F.lit(y1) > py) != (F.lit(y2) > py)
            x_at = F.lit(x2 - x1) * (py - F.lit(y1)) / F.lit(y2 - y1) \
                + F.lit(x1)
            t = F.when(straddles & (px < x_at), 1).otherwise(0)
            total = t if total is None else total + t
        return F.lit(False) if total is None else total % 2 == 1

    doc_vertex_in_q = F.exists(
        F.arrays_zip(lats.alias("la"), lons.alias("lo")),
        lambda v: const_ring_contains(v["la"], v["lo"]))
    q_vertex_in_doc = None
    for (qy, qx) in vertices:
        t = _point_in_ring(F.lit(qy), F.lit(qx), edges)
        q_vertex_in_doc = t if q_vertex_in_doc is None \
            else q_vertex_in_doc | t
    edge_cross = None
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        t = F.exists(edges, _cross_with((x1, y1, x2, y2)))
        edge_cross = t if edge_cross is None else edge_cross | t
    pre = _bbox_overlap(min(q_lats), max(q_lats), min(q_lons), max(q_lons))
    return pre & (doc_vertex_in_q | q_vertex_in_doc | edge_cross)
