"""relate / relate_pattern / trelate goldens from the reference suites
(`point/test/expected/66_tpoint_spatialrels.test.out:6401-6620`,
`point/test/expected/68_tpoint_tempspatialrels.test.out:1120+`)."""

import numpy as np
import pytest

from mobilitydb_spark import geo
from mobilitydb_spark.de9im import matches_pattern, relate_geoms
from mobilitydb_spark.everops import relate, relate_pattern
from mobilitydb_spark.spatial import trelate
from mobilitydb_spark.types import parse_temporal

P11 = geo.from_wkb(geo.point_wkb(1.0, 1.0))
EMPTY = geo.Geometry("Point", [])

INST = parse_temporal("Point(1 1)@2000-01-01")
ISET = parse_temporal("{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
                      "Point(1 1)@2000-01-03}")
SEQ = parse_temporal("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
                     "Point(1 1)@2000-01-03]")
SEQSET = parse_temporal("{[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
                        "Point(1 1)@2000-01-03],"
                        "[Point(3 3)@2000-01-04, Point(3 3)@2000-01-05]}")


# -- relate(geo, tpoint) == relate(tpoint, geo): 66_…out:6401-6520 ---------
@pytest.mark.parametrize("tv,want", [
    (INST, "0FFFFFFF2"),
    (ISET, "0F0FFFFF2"),
    (SEQ, "0F1FFFFF2"),
])
def test_relate_geo_tpoint_goldens(tv, want):
    assert relate(P11, tv) == want
    assert relate(tv, P11) == want


def test_relate_seqset_mixed_collection_errors():
    with pytest.raises(ValueError, match="LWGEOMCOLLECTION"):
        relate(P11, SEQSET)
    with pytest.raises(ValueError, match="LWGEOMCOLLECTION"):
        relate(SEQSET, SEQSET)


def test_relate_empty_geometry_is_null():
    for tv in (INST, ISET, SEQ, SEQSET):
        assert relate(EMPTY, tv) is None
        assert relate(tv, EMPTY) is None


# -- relate(tpoint, tpoint): sync-then-relate, 66_…out:6526-6620 -----------
@pytest.mark.parametrize("a,b,want", [
    (INST, parse_temporal("Point(1 1)@2000-01-02"), None),  # no overlap
    (INST, INST, "0FFFFFFF2"),
    (ISET, INST, "0FFFFFFF2"),
    (SEQ, INST, "0FFFFFFF2"),
    (SEQSET, INST, "0FFFFFFF2"),
    (ISET, ISET, "0FFFFFFF2"),
    (SEQ, ISET, "0FFFFFFF2"),
    (SEQSET, ISET, "0FFFFFFF2"),
    (SEQ, SEQ, "1FFFFFFF2"),
    (SEQSET, SEQ, "1FFFFFFF2"),
    (INST, SEQSET, "0FFFFFFF2"),
    (ISET, SEQSET, "0FFFFFFF2"),
])
def test_relate_tpoint_tpoint_goldens(a, b, want):
    assert relate(a, b) == want


def test_relate_pattern_equals_intersects_pattern():
    # 'T*F**FFF*' is the OGC equals pattern; 'T*****FF*' = within-ish
    assert relate_pattern(P11, INST, "T*F**FFF*") is True
    assert relate_pattern(P11, SEQ, "T*F**FFF*") is False
    assert relate_pattern(P11, SEQ, "T*****FF*") is True
    assert relate_pattern(EMPTY, SEQ, "T*****FF*") is None


# -- de9im kernel: line/polygon pairs beyond the goldens -------------------
def test_de9im_line_point_open_boundary():
    line = geo.Geometry("LineString",
                        [np.array([[1.0, 1.0], [2.0, 2.0]])])
    assert relate_geoms(line, P11) == "FF10F0FF2"


def test_de9im_point_in_polygon():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                     [0.0, 0.0]])
    poly = geo.Geometry("Polygon", [ring])
    assert relate_geoms(P11, poly) == "0FFFFF212"
    on_bnd = geo.from_wkb(geo.point_wkb(2.0, 0.0))
    assert relate_geoms(on_bnd, poly) == "F0FFFF212"
    out = geo.from_wkb(geo.point_wkb(9.0, 9.0))
    assert relate_geoms(out, poly) == "FF0FFF212"
    # transposed
    assert relate_geoms(poly, P11) == "0F2FF1FF2"


def test_de9im_line_crosses_polygon():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                     [0.0, 0.0]])
    poly = geo.Geometry("Polygon", [ring])
    line = geo.Geometry("LineString",
                        [np.array([[-1.0, 2.0], [5.0, 2.0]])])
    # GEOS: crossing line 1F10F0212
    assert relate_geoms(line, poly) == "101FF0212"
    inside = geo.Geometry("LineString",
                          [np.array([[1.0, 1.0], [3.0, 3.0]])])
    assert relate_geoms(inside, poly) == "1FF0FF212"


def test_de9im_line_line():
    a = geo.Geometry("LineString", [np.array([[0.0, 0.0], [4.0, 4.0]])])
    b = geo.Geometry("LineString", [np.array([[0.0, 4.0], [4.0, 0.0]])])
    assert relate_geoms(a, b) == "0F1FF0102"  # proper crossing
    assert relate_geoms(a, a) == "1FFF0FFF2"  # equal lines
    c = geo.Geometry("LineString", [np.array([[1.0, 1.0], [3.0, 3.0]])])
    assert relate_geoms(c, a) == "1FF0FF102"  # c within a


def test_matches_pattern_wildcards():
    assert matches_pattern("0F1FFFFF2", "T*T******")
    assert not matches_pattern("0F1FFFFF2", "FF*******")
    with pytest.raises(ValueError):
        matches_pattern("0F1FFFFF2", "T*")


# -- trelate goldens: 68_…out:1120+ -----------------------------------------
def test_trelate_geo_instant():
    tt = trelate(P11, INST)
    assert str(tt) == '"0FFFFFFF2"@2000-01-01 00:00:00+00'


def test_trelate_geo_instantset():
    tt = trelate(P11, ISET)
    assert str(tt) == ('{"0FFFFFFF2"@2000-01-01 00:00:00+00, '
                       '"FF0FFF0F2"@2000-01-02 00:00:00+00, '
                       '"0FFFFFFF2"@2000-01-03 00:00:00+00}')


def test_trelate_geo_seq():
    tt = trelate(P11, SEQ)
    assert str(tt) == ('{["0FFFFFFF2"@2000-01-01 00:00:00+00], '
                       '("FF0FFF0F2"@2000-01-01 00:00:00+00, '
                       '"0FFFFFFF2"@2000-01-03 00:00:00+00]}')


def test_trelate_geo_seqset():
    tt = trelate(P11, SEQSET)
    assert str(tt) == ('{["0FFFFFFF2"@2000-01-01 00:00:00+00], '
                       '("FF0FFF0F2"@2000-01-01 00:00:00+00, '
                       '"0FFFFFFF2"@2000-01-03 00:00:00+00], '
                       '["FF0FFF0F2"@2000-01-04 00:00:00+00, '
                       '"FF0FFF0F2"@2000-01-05 00:00:00+00]}')


def test_trelate_empty_is_null():
    assert trelate(EMPTY, SEQ) is None


def test_trelate_pattern_tbool():
    tb = trelate(P11, ISET, "T*****FF*")
    # tbool prints 0/1 in this engine (value codes)
    assert str(tb) == ("{1@2000-01-01 00:00:00+00, "
                       "0@2000-01-02 00:00:00+00, "
                       "1@2000-01-03 00:00:00+00}")


def test_trelate_tpoint_tpoint_crossing():
    # verbatim reference defect (`tpoint_tempspatialrels.c:2200-2216`):
    # geom_relate's text results are lifted with valuetypid BOOLOID, so
    # the 2-arg tpoint×tpoint trelate is a tbool that is constantly
    # TRUE (nonzero pointer), split at the crossing instant and never
    # merged (pointer-inequality normalization); the DE-9IM matrix is
    # never exposed (68_…out:1740+)
    a = parse_temporal("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    b = parse_temporal("[Point(2 0)@2000-01-01, Point(0 2)@2000-01-03]")
    tb = trelate(a, b)
    tb.is_bool = True
    assert str(tb) == ("{[t@2000-01-01 00:00:00+00, "
                       "t@2000-01-02 00:00:00+00], "
                       "(t@2000-01-02 00:00:00+00, "
                       "t@2000-01-03 00:00:00+00]}")


def test_trelate_polygon_classification():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                     [0.0, 0.0]])
    poly = geo.Geometry("Polygon", [ring])
    tv = parse_temporal("[Point(-2 2)@2000-01-01, Point(2 2)@2000-01-05]")
    tt = trelate(tv, poly)

    def at(day):
        t = np.datetime64(f"2000-01-0{day}").astype("datetime64[us]")
        return tt.value_at(int(t.astype(int)))

    assert at(1) == "FF0FFF212"   # outside
    assert at(3) == "F0FFFF212"   # on the boundary (x=0 at day 3)
    assert at(4) == "0FFFFF212"   # inside
    # geometry-first order transposes the matrix
    tt2 = trelate(poly, tv)
    t4 = np.datetime64("2000-01-04").astype("datetime64[us]").astype(int)
    assert tt2.value_at(int(t4)) == "0F2FF1FF2"


def _sq(x0, y0, x1, y1):
    import numpy as np
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)


def test_relate_areal_areal_matrices():
    """Areal × areal DE-9IM (closes the last operand-class gap):
    expected matrices are the standard GEOS results for each
    configuration."""
    from mobilitydb_spark import geo
    from mobilitydb_spark.de9im import relate_geoms

    def P(*rings):
        return geo.Geometry("Polygon", list(rings))

    a = P(_sq(0, 0, 10, 10))
    # disjoint
    assert relate_geoms(a, P(_sq(20, 20, 30, 30))) == "FF2FF1212"
    # corner touch
    assert relate_geoms(a, P(_sq(10, 10, 20, 20))) == "FF2F01212"
    # shared edge
    assert relate_geoms(a, P(_sq(10, 0, 20, 10))) == "FF2F11212"
    # partial overlap
    assert relate_geoms(a, P(_sq(5, 5, 15, 15))) == "212101212"
    # equal
    assert relate_geoms(a, P(_sq(0, 0, 10, 10))) == "2FFF1FFF2"
    # strict containment
    assert relate_geoms(a, P(_sq(2, 2, 8, 8))) == "212FF1FF2"
    # donut vs its hole filler: interiors disjoint, hole ring shared
    donut = P(_sq(0, 0, 10, 10), _sq(4, 4, 6, 6))
    filler = P(_sq(4, 4, 6, 6))
    assert relate_geoms(donut, filler) == "FF2F112F2"
    # A contains B, outer boundary shared, B has a hole inside A
    b_holed = P(_sq(0, 0, 10, 10), _sq(4, 4, 6, 6))
    assert relate_geoms(a, b_holed) == "212F1FFF2"
    # covers/within via pattern matching still work on areal pairs
    from mobilitydb_spark.de9im import matches_pattern
    m = relate_geoms(P(_sq(2, 2, 8, 8)), a)
    assert matches_pattern(m, "T*F**F***")  # within
