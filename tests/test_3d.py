"""3D (z) temporal points: parse/print, distance solver, STBOX z,
relate projection — goldens from `point/test/expected/
62_tpoint_distance.test.out:96-130`, `51_tpoint.test.out` (POINT Z
output form) and the 66-suite 3D relate rows."""

import numpy as np
import pytest

from mobilitydb_spark import geo
from mobilitydb_spark.boxops import (STBox, back, contains, front,
                                     overlaps)
from mobilitydb_spark.everops import relate
from mobilitydb_spark.lifting import tdistance
from mobilitydb_spark.spatial import (length, nearest_approach_instant,
                                      speed, twcentroid)
from mobilitydb_spark.types import parse_temporal, parse_ts


def t(day: int) -> int:
    return parse_ts(f"2000-01-{day:02d}")


def test_parse_print_roundtrip_3d():
    tv = parse_temporal("[Point(1 1 1)@2000-01-01, Point(3 3 3)@2000-01-03]")
    assert tv.dim == 3
    assert str(tv) == ("[POINT Z (1 1 1)@2000-01-01 00:00:00+00, "
                       "POINT Z (3 3 3)@2000-01-03 00:00:00+00]")
    assert parse_temporal(str(tv)).dim == 3


def test_distance_point_3d_golden():
    # 62_…out:96 — round(Point(1 1 1) <-> Point(2 2 2)@t, 6) = 1.732051
    tv = parse_temporal("Point(2 2 2)@2000-01-01")
    d = tdistance(tv, np.array([1.0, 1.0, 1.0]))
    assert round(float(d.value_at(t(1))[0]), 6) == 1.732051


def test_distance_seq_3d_golden():
    # 62_…out:108 — {1.732051@01, 0@02, 1.732051@03}
    tv = parse_temporal("[Point(2 2 2)@2000-01-01, Point(1 1 1)@2000-01-02,"
                        " Point(2 2 2)@2000-01-03]")
    d = tdistance(tv, np.array([1.0, 1.0, 1.0]))
    assert round(float(d.value_at(t(1))[0]), 6) == 1.732051
    assert float(d.value_at(t(2))[0]) == 0.0
    assert round(float(d.value_at(t(3))[0]), 6) == 1.732051


def test_distance_tpoint_tpoint_3d_turning_point():
    a = parse_temporal("[Point(0 0 0)@2000-01-01, Point(2 2 2)@2000-01-03]")
    b = parse_temporal("[Point(2 2 2)@2000-01-01, Point(0 0 0)@2000-01-03]")
    d = tdistance(a, b)
    # closest approach at the midpoint where both are at (1,1,1)
    assert float(d.value_at(t(2))[0]) == 0.0
    nai, nad = nearest_approach_instant(a, b)
    assert nai == t(2) and nad == 0.0


def test_distance_mixed_dimensionality_errors():
    a = parse_temporal("[Point(1 1 1)@2000-01-01, Point(3 3 3)@2000-01-03]")
    b = parse_temporal("[Point(1 1)@2000-01-01, Point(3 3)@2000-01-03]")
    with pytest.raises(ValueError, match="dimensionality"):
        tdistance(a, b)


def test_length_speed_centroid_3d():
    tv = parse_temporal("[Point(0 0 0)@2000-01-01, Point(2 2 2)@2000-01-02]")
    assert length(tv) == pytest.approx(np.sqrt(12.0))
    sp = speed(tv)
    assert float(sp.values[0, 0]) == pytest.approx(
        np.sqrt(12.0) / 86400.0)
    assert twcentroid(tv).tolist() == pytest.approx([1.0, 1.0, 1.0])


def test_stbox_z():
    tv = parse_temporal("[Point(1 2 3)@2000-01-01, Point(4 5 6)@2000-01-02]")
    box = STBox.of(tv)
    assert (box.zmin, box.zmax) == (3.0, 6.0)
    assert box.has_z
    grown = box.expand(1.0)
    assert (grown.zmin, grown.zmax) == (2.0, 7.0)
    other = STBox(0, 10, 0, 10, box.tmin, box.tmax, 7.0, 9.0)
    assert not overlaps(box, other)        # z-disjoint
    assert front(box, other) and back(other, box)
    hull = STBox(0, 10, 0, 10, box.tmin, box.tmax, 0.0, 10.0)
    assert contains(hull, box)
    # 2D box ignores z when either side lacks it
    flat = STBox(0, 10, 0, 10, box.tmin, box.tmax)
    assert overlaps(box, flat)


def test_relate_3d_projects_to_2d():
    # 66_…out:6445+ — 3D relate rows equal the 2D matrices
    p111 = geo.Geometry("Point", [np.array([[1.0, 1.0, 1.0]])])
    inst = parse_temporal("Point(1 1 1)@2000-01-01")
    iset = parse_temporal("{Point(1 1 1)@2000-01-01, "
                          "Point(2 2 2)@2000-01-02, "
                          "Point(1 1 1)@2000-01-03}")
    seq = parse_temporal("[Point(1 1 1)@2000-01-01, "
                         "Point(2 2 2)@2000-01-02, "
                         "Point(1 1 1)@2000-01-03]")
    assert relate(p111, inst) == "0FFFFFFF2"
    assert relate(p111, iset) == "0F0FFFFF2"
    assert relate(p111, seq) == "0F1FFFFF2"
    assert relate(seq, seq) == "1FFFFFFF2"
    # mixed 2D geometry × 3D tpoint errors like the reference
    p2d = geo.from_wkb(geo.point_wkb(1.0, 1.0))
    with pytest.raises(ValueError, match="dimensionality"):
        relate(p2d, seq)


def test_restrict_and_ever_3d():
    from mobilitydb_spark.everops import ever
    from mobilitydb_spark.restrict import at_value
    seq = parse_temporal("[Point(0 0 0)@2000-01-01, Point(2 2 2)@2000-01-03]")
    assert ever("eq", seq, np.array([1.0, 1.0, 1.0])) is True
    hit = at_value(seq, np.array([1.0, 1.0, 1.0]))
    assert hit is not None and hit.seqs[0].times[0] == t(2)
