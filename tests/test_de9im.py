"""DE-9IM-style predicates + temporal wrappers + cmp/hash (§2.9/§2.5
remainder)."""

import numpy as np

from mobilitydb_spark import everops as E
from mobilitydb_spark import geo
from mobilitydb_spark import types as T

SQ = geo.from_wkb(geo.polygon_wkb(
    np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)))
EMPTY = geo.Geometry("Polygon", [])
tp = T.parse_temporal

CROSSING = tp("[Point(-1 1)@2000-01-01, Point(3 1)@2000-01-05]")
INSIDE = tp("[Point(0.5 0.5)@2000-01-01, Point(1.5 1.5)@2000-01-03]")
OUTSIDE = tp("[Point(5 5)@2000-01-01, Point(6 6)@2000-01-03]")
TOUCH = tp("[Point(-1 2)@2000-01-01, Point(3 2)@2000-01-03]")  # along y=2


def test_crosses():
    assert E.crosses(CROSSING, SQ) is True
    assert E.crosses(INSIDE, SQ) is False
    assert E.crosses(OUTSIDE, SQ) is False
    assert E.crosses(CROSSING, EMPTY) is None


def test_contains_covers():
    assert E.contains(SQ, INSIDE) is True
    assert E.contains(SQ, CROSSING) is False
    assert E.covers(SQ, INSIDE) is True
    assert E.covers(SQ, TOUCH) is False  # leaves the square in x
    assert E.coveredby(INSIDE, SQ) is True
    assert E.contains(EMPTY, INSIDE) is None


def test_touches():
    assert E.touches(TOUCH, SQ) is True
    assert E.touches(CROSSING, SQ) is False
    assert E.touches(OUTSIDE, SQ) is False
    assert E.touches(TOUCH, EMPTY) is None


def test_overlaps_line_area_false():
    assert E.overlaps_rel(CROSSING, SQ) is False
    assert E.overlaps_rel(CROSSING, EMPTY) is None


def test_tdisjoint_complement_of_tintersects():
    from mobilitydb_spark.spatial import tintersects
    td = E.tdisjoint(CROSSING, SQ)
    ti = tintersects(CROSSING, SQ)
    for frac in (0.1, 0.5, 0.9):
        t = int(CROSSING.start_timestamp()
                + frac * (CROSSING.end_timestamp()
                          - CROSSING.start_timestamp()))
        assert td.value_at(t)[0] == 1.0 - ti.value_at(t)[0]


def test_tequals_point():
    v = tp("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    te = E.tequals(v, np.array([1.0, 1.0]))
    assert te.value_at(int(T.parse_ts("2000-01-02")))[0] == 1.0
    assert te.value_at(int(T.parse_ts("2000-01-01")))[0] == 0.0
    miss = E.tequals(v, np.array([9.0, 9.0]))
    assert float(miss.max_value()[0]) == 0.0


def test_cmp_hash_total_order():
    a = tp("[1@2000-01-01, 2@2000-01-02]")
    b = tp("[1@2000-01-01, 3@2000-01-02]")
    c = tp("[1@2000-01-02, 2@2000-01-03]")
    assert E.temporal_cmp(a, a) == 0
    assert E.temporal_cmp(a, b) == -E.temporal_cmp(b, a) != 0
    assert E.temporal_cmp(a, c) == -1  # earlier period sorts first
    assert E.temporal_hash(a) == E.temporal_hash(a)
    assert E.temporal_hash(a) != E.temporal_hash(b)


def test_ttouches_tcontains_tcovers():
    ts = lambda s: int(T.parse_ts(s))
    v = tp("[Point(-1 1)@2000-01-01, Point(3 1)@2000-01-05]")
    tt = E.ttouches(v, SQ)
    assert tt.value_at(ts("2000-01-02"))[0] == 1.0   # entry on x=0 edge
    assert tt.value_at(ts("2000-01-03"))[0] == 0.0   # interior
    tc = E.tcontains(SQ, v)
    assert tc.value_at(ts("2000-01-03"))[0] == 1.0
    assert tc.value_at(ts("2000-01-02"))[0] == 0.0   # boundary ≠ interior
    edge = tp("[Point(0 2)@2000-01-01, Point(2 2)@2000-01-03]")
    assert E.ttouches(edge, SQ).value_at(ts("2000-01-02"))[0] == 1.0
    assert float(E.tcontains(SQ, edge).max_value()[0]) == 0.0
    assert E.tcovers(SQ, v) is not None
    assert E.ttouches(v, EMPTY) is None
    assert E.tcontains(EMPTY, v) is None
