"""spatial3d analog — geodesic path-buffer queries
(``lucene/spatial3d/src/java/org/apache/lucene/spatial3d/geom/
GeoStandardPath.java`` distance model, validated against a dense
great-circle sampling oracle)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_1_spark.functions.geo import EARTH_MEAN_RADIUS_M
from lucene_1_spark.functions.geo3d import (path_bbox,
                                            path_distance_meters,
                                            path_distance_query,
                                            path_distance_sql)

R = EARTH_MEAN_RADIUS_M


def _xyz(lat, lon):
    la, lo = math.radians(lat), math.radians(lon)
    return np.array([math.cos(la) * math.cos(lo),
                     math.cos(la) * math.sin(lo),
                     math.sin(la)])


def _sample_path_dist(lat, lon, path, n=4000):
    """Brute-force oracle: min arc distance from P to a dense slerp
    sampling of every segment (independent of the plane algebra)."""
    p = _xyz(lat, lon)
    best = math.inf
    for i in range(len(path) - 1):
        a, b = _xyz(*path[i]), _xyz(*path[i + 1])
        omega = math.acos(max(-1.0, min(1.0, float(a @ b))))
        ts = np.linspace(0.0, 1.0, n)
        pts = (np.sin((1 - ts)[:, None] * omega) * a
               + np.sin(ts[:, None] * omega) * b) / math.sin(omega)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        d = np.arccos(np.clip(pts @ p, -1, 1)).min()
        best = min(best, float(d))
    return best * R


PATH = [(10.0, 40.0), (25.0, 55.0), (40.0, 45.0)]


def test_path_distance_matches_sampling_oracle(spark):
    rng = np.random.RandomState(3)
    rows = [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-60, 70, 60), rng.uniform(-30, 120, 60)))]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {r["id"]: r["d"] for r in df.select(
        "id", path_distance_meters(F.col("lat"), F.col("lon"), PATH)
        .alias("d")).collect()}
    for i, la, lo in rows:
        want = _sample_path_dist(la, lo, PATH)
        # sampling discretization bounds the oracle error; the plane
        # algebra itself is exact
        assert got[i] == pytest.approx(want, abs=300.0), (i, la, lo)


def test_on_path_and_endpoint_regimes(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 40.0),    # vertex: 0
         (1, 40.0, 45.0),    # last vertex: 0
         (2, 5.0, 35.0)],    # "behind" the first vertex -> endpoint arc
        "id long, lat double, lon double")
    got = {r["id"]: r["d"] for r in df.select(
        "id", path_distance_meters(F.col("lat"), F.col("lon"), PATH)
        .alias("d")).collect()}
    assert got[0] == pytest.approx(0.0, abs=1e-6)
    assert got[1] == pytest.approx(0.0, abs=1e-6)
    ep = math.acos(max(-1.0, min(1.0,
                                 float(_xyz(5, 35) @ _xyz(10, 40))))) * R
    assert got[2] == pytest.approx(ep, rel=1e-9)


def test_query_two_phase_equals_exact(spark):
    rng = np.random.RandomState(11)
    rows = [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-80, 80, 300), rng.uniform(-170, 170, 300)))]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    radius = 1_500_000.0
    got = {r["id"] for r in
           path_distance_query(df, PATH, radius).collect()}
    want = {i for i, la, lo in rows
            if _sample_path_dist(la, lo, PATH) <= radius - 300}
    wider = {i for i, la, lo in rows
             if _sample_path_dist(la, lo, PATH) <= radius + 300}
    assert want <= got <= wider


def test_bbox_regimes():
    box = path_bbox(PATH, 500_000.0)
    assert box is not None
    min_lat, max_lat, min_lon, max_lon = box
    assert min_lat < 10.0 and max_lat > 40.0
    assert min_lon < 40.0 and max_lon > 55.0
    # polar expansion degrades to no prefilter
    assert path_bbox([(85.0, 0.0), (80.0, 10.0)], 1_000_000.0) is None
    # dateline wrap degrades too
    assert path_bbox([(0.0, 175.0), (5.0, 179.0)], 1_000_000.0) is None


def test_degenerate_segment_raises(spark):
    with pytest.raises(ValueError):
        path_distance_meters(F.lit(0.0), F.lit(0.0),
                             [(10.0, 20.0), (10.0, 20.0)])
    with pytest.raises(ValueError):
        path_distance_meters(F.lit(0.0), F.lit(0.0), [(10.0, 20.0)])


def test_sql_twin_matches_column(spark):
    """The generated ANSI-SQL expression computes the identical value
    (same constants, same trig) — checked via Spark's own SQL parser."""
    rng = np.random.RandomState(5)
    rows = [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-60, 70, 25), rng.uniform(-30, 120, 25)))]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    sql = path_distance_sql("lat", "lon", PATH)
    both = df.select(
        "id",
        path_distance_meters(F.col("lat"), F.col("lon"), PATH).alias("a"),
        F.expr(sql).alias("b")).collect()
    for r in both:
        assert r["a"] == pytest.approx(r["b"], rel=1e-12)
