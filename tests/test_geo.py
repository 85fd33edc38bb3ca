"""Geo-point queries (``document/LatLonPoint.java`` box/distance/
nearest, ``search/LatLonPointDistanceQuery.java`` two-phase) —
brute-force checked with numpy haversine over a deterministic point
cloud, including dateline-crossing boxes and polar-cap circles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark.functions.geo import (EARTH_MEAN_RADIUS_M,
                                          box_predicate, distance_box,
                                          distance_query, haversine_meters,
                                          nearest)


def _hav_np(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = np.radians(lat2 - lat1) / 2
    dlmb = np.radians(lon2 - lon1) / 2
    a = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb) ** 2
    return 2 * EARTH_MEAN_RADIUS_M * np.arcsin(np.sqrt(a))


@pytest.fixture(scope="module")
def points(spark):
    ids = np.arange(2000, dtype=np.int64)
    lat = (ids * 7919 % 18000) / 100.0 - 90.0
    lon = (ids * 104729 % 36000) / 100.0 - 180.0
    import pandas as pd
    pdf = pd.DataFrame({"doc_id": ids, "lat": lat, "lon": lon})
    return spark.createDataFrame(pdf), pdf


def test_haversine_matches_numpy(spark, points):
    df, pdf = points
    got = (df.limit(500)
           .withColumn("d", haversine_meters(F.col("lat"), F.col("lon"),
                                             12.34, 56.78))
           .select("doc_id", "d").collect())
    for r in got:
        row = pdf[pdf.doc_id == r["doc_id"]].iloc[0]
        want = _hav_np(row["lat"], row["lon"], 12.34, 56.78)
        assert math.isclose(r["d"], want, rel_tol=1e-12)


def test_box_query_plain_and_dateline_crossing(points):
    df, pdf = points
    plain = {r["doc_id"] for r in df.filter(
        box_predicate(F.col("lat"), F.col("lon"),
                      -10.0, 25.0, 40.0, 95.0)).collect()}
    want = set(pdf[(pdf.lat >= -10) & (pdf.lat <= 25)
                   & (pdf.lon >= 40) & (pdf.lon <= 95)].doc_id)
    assert plain == want
    # dateline crossing: min_lon > max_lon matches the union
    crossing = {r["doc_id"] for r in df.filter(
        box_predicate(F.col("lat"), F.col("lon"),
                      -10.0, 25.0, 170.0, -160.0)).collect()}
    want_x = set(pdf[(pdf.lat >= -10) & (pdf.lat <= 25)
                     & ((pdf.lon >= 170) | (pdf.lon <= -160))].doc_id)
    assert crossing == want_x and len(crossing) > 0


@pytest.mark.parametrize("center,radius", [
    ((12.34, 56.78), 2_000_000.0),
    ((0.0, 179.5), 1_000_000.0),      # circle crosses the dateline
    ((88.0, 10.0), 1_500_000.0),      # polar cap: every longitude
    ((-45.0, -120.0), 500_000.0),
])
def test_distance_query_two_phase_is_exact(points, center, radius):
    df, pdf = points
    clat, clon = center
    got = {r["doc_id"] for r in distance_query(
        df, center_lat=clat, center_lon=clon, radius_m=radius).collect()}
    d = _hav_np(pdf.lat.values, pdf.lon.values, clat, clon)
    want = set(pdf.doc_id.values[d <= radius])
    assert got == want and len(want) > 0


def test_distance_box_contains_circle():
    for clat, clon, r in [(50.0, 0.0, 3e6), (0.0, 175.0, 2e6),
                          (-80.0, 30.0, 2e6)]:
        mn_lat, mx_lat, mn_lon, mx_lon = distance_box(clat, clon, r)
        # sample the circle rim; every rim point must fall in the box
        for b in np.linspace(0, 2 * math.pi, 73):
            ang = r / EARTH_MEAN_RADIUS_M
            lat = math.degrees(math.asin(
                math.sin(math.radians(clat)) * math.cos(ang)
                + math.cos(math.radians(clat)) * math.sin(ang) * math.cos(b)))
            lon = clon + math.degrees(math.atan2(
                math.sin(b) * math.sin(ang) * math.cos(math.radians(clat)),
                math.cos(ang) - math.sin(math.radians(clat))
                * math.sin(math.radians(lat))))
            lon = (lon + 180.0) % 360.0 - 180.0
            assert mn_lat - 1e-6 <= lat <= mx_lat + 1e-6
            if mn_lon <= mx_lon:
                assert mn_lon - 1e-6 <= lon <= mx_lon + 1e-6
            else:
                assert lon >= mn_lon - 1e-6 or lon <= mx_lon + 1e-6


def test_nearest_matches_numpy_topk(points):
    df, pdf = points
    got = nearest(df, center_lat=12.34, center_lon=56.78, k=15).collect()
    d = _hav_np(pdf.lat.values, pdf.lon.values, 12.34, 56.78)
    order = np.argsort(d, kind="stable")[:15]
    want = list(pdf.doc_id.values[order])
    assert [r["doc_id"] for r in got] == want
    assert all(math.isclose(r["distance_m"], d[order[i]], rel_tol=1e-12)
               for i, r in enumerate(got))


def test_box_prefilter_is_pushed_down(points):
    df, _ = points
    plan = distance_query(df, center_lat=12.34, center_lon=56.78,
                          radius_m=1e6)._jdf.queryExecution() \
        .executedPlan().toString()
    # the box ranges must appear as pushable filters on lat/lon, not
    # only inside the haversine expression
    assert "lat" in plan and "lon" in plan


def _pip_np(lat, lon, verts):
    inside = np.zeros(len(lat), dtype=bool)
    n = len(verts)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        if y1 == y2:
            continue
        straddle = (y1 > lat) != (y2 > lat)
        x_at = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= straddle & (lon < x_at)
    return inside


@pytest.mark.parametrize("verts", [
    [(0.0, 0.0), (40.0, 10.0), (10.0, 50.0)],                  # triangle
    [(-20.0, -30.0), (30.0, -30.0), (30.0, 30.0),
     (0.0, 0.0), (-20.0, 30.0)],                               # concave
    [(50.0, -10.0), (70.0, 0.0), (50.0, 10.0), (60.0, 0.0)],   # arrow
])
def test_polygon_query_matches_numpy_raycast(points, verts):
    from lucene_1_spark.functions.geo import polygon_query
    df, pdf = points
    got = {r["doc_id"] for r in polygon_query(df, vertices=verts).collect()}
    want = set(pdf.doc_id.values[
        _pip_np(pdf.lat.values, pdf.lon.values, verts)])
    assert got == want and len(want) > 0


def test_polygon_guards():
    from lucene_1_spark.functions.geo import polygon_predicate
    with pytest.raises(ValueError):
        polygon_predicate(F.col("a"), F.col("b"), [(0, 0), (1, 1)])
