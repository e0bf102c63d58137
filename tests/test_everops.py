"""ever/always, projected spatial rels, CRS transform, geo-M codec."""

import numpy as np
import pytest

from mobilitydb_spark import everops, geo
from mobilitydb_spark import types as T


def tf(s):
    return T.parse_temporal(s)


SQUARE = geo.from_wkb(geo.polygon_wkb(
    np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)))
EMPTY = geo.Geometry("Polygon", [])


def test_ever_always_scalar():
    v = tf("[1@2000-01-01, 3@2000-01-03]")
    assert everops.ever("eq", v, 2.0)       # attained between knots
    assert not everops.ever("eq", v, 5.0)
    assert everops.ever("gt", v, 2.5)
    assert everops.always("ge", v, 1.0)
    assert not everops.always("gt", v, 1.0)  # equals 1 at the start
    assert everops.always("le", v, 3.0)


def test_ever_eq_stepwise_never_interpolates():
    v = tf("Interp=Stepwise;[1@2000-01-01, 3@2000-01-03]")
    assert not everops.ever("eq", v, 2.0)
    assert everops.ever("eq", v, 3.0)


def test_ever_eq_tpoint_crossing():
    v = tf("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    assert everops.ever("eq", v, np.array([1.0, 1.0]))
    assert not everops.ever("eq", v, np.array([1.0, 0.0]))


def test_projected_rels():
    crossing = tf("[Point(-1 1)@2000-01-01, Point(3 1)@2000-01-05]")
    inside = tf("[Point(0.5 0.5)@2000-01-01, Point(1.5 1.5)@2000-01-03]")
    outside = tf("[Point(5 5)@2000-01-01, Point(6 6)@2000-01-03]")
    assert everops.intersects(crossing, SQUARE) is True
    assert everops.within(crossing, SQUARE) is False
    assert everops.within(inside, SQUARE) is True
    assert everops.disjoint(outside, SQUARE) is True
    assert everops.dwithin(outside, SQUARE, 5.0) is True
    assert everops.dwithin(outside, SQUARE, 1.0) is False
    # empty geometry → NULL (66_tpoint_spatialrels.test.out:25-28)
    assert everops.intersects(crossing, EMPTY) is None
    assert everops.within(crossing, EMPTY) is None
    assert everops.dwithin(crossing, EMPTY, 1.0) is None


def test_mercator_roundtrip():
    lon = np.array([-10.0, 0.0, 8.5, 35.0])
    lat = np.array([32.0, 0.0, 50.1, 71.9])
    x, y = everops.lonlat_to_mercator(lon, lat)
    lon2, lat2 = everops.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known value: lon 180 → πR
    x180, _ = everops.lonlat_to_mercator(np.array([180.0]), np.array([0.0]))
    np.testing.assert_allclose(x180, np.pi * everops.WEB_MERCATOR_R)


def test_transform_temporal():
    v = tf("SRID=4326;[Point(8.5 50.1)@2000-01-01, Point(9 51)@2000-01-03]")
    m = everops.transform(v, 3857)
    assert m.srid == 3857
    back = everops.transform(m, 4326)
    np.testing.assert_allclose(back.values, v.values, atol=1e-9)
    assert back.times.tolist() == v.times.tolist()


def test_geo_m_roundtrip():
    v = tf("SRID=4326;[Point(1 2)@2000-01-01, Point(3 4)@2000-01-02]")
    wkb = everops.tpoint_to_geo_m(v)
    back = everops.geo_m_to_tpoint(wkb)
    np.testing.assert_allclose(back.values, v.values)
    assert back.times.tolist() == v.times.tolist()
