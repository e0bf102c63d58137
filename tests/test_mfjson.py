"""MFJSON roundtrip tests (tpoint_in.c:81-380 semantics)."""

import pytest

from mobilitydb_spark import mfjson
from mobilitydb_spark import types as T


@pytest.mark.parametrize("lit", [
    "Point(1 1)@2000-01-01",
    "{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02}",
    "[Point(1 1)@2000-01-01, Point(2 3)@2000-01-02)",
    "Interp=Stepwise;[Point(1 1)@2000-01-01, Point(2 3)@2000-01-02]",
    "{[Point(1 1)@2000-01-01, Point(2 3)@2000-01-02), "
    "[Point(5 5)@2000-01-04, Point(5 5)@2000-01-05]}",
    "SRID=4326;[Point(8.5 50.25)@2000-01-01 08:30:00, "
    "Point(9 51)@2000-01-02 12:00:00]",
    "1.5@2000-01-01",
    "[1@2000-01-01, 2.5@2000-01-03]",
])
def test_roundtrip(lit):
    tv = T.parse_temporal(lit)
    j = mfjson.as_mfjson(tv)
    back = mfjson.from_mfjson(j)
    assert str(back) == str(tv)


def test_mfjson_shape():
    import json
    tv = T.parse_temporal("[Point(1 1)@2000-01-01, Point(2 3)@2000-01-02)")
    obj = json.loads(mfjson.as_mfjson(tv))
    assert obj["type"] == "MovingPoint"
    assert obj["interpolations"] == ["Linear"]
    assert obj["coordinates"] == [[1.0, 1.0], [2.0, 3.0]]
    assert obj["lower_inc"] is True and obj["upper_inc"] is False
    # reference datetime form (53-suite): T separator, short offset
    assert obj["datetimes"][0] == "2000-01-01T00:00:00+00"


def test_52_tpoint_in_roundtrip_goldens():
    """Full 52_tpoint_in suite (`point/test/expected/52_tpoint_in.
    test.out:1-132`): asEWKT(fromMFJSON(asMFJSON(x))) and
    asEWKT(fromEWKB(asEWKB(x))) for every duration, bound combination
    and the SRID=4326 Z variants — expected strings verbatim."""
    from mobilitydb_spark import mfjson as MJ
    from mobilitydb_spark.types import parse_temporal
    cases = [
        ("Point(1 2)@2000-01-01",
         "POINT(1 2)@2000-01-01 00:00:00+00"),
        ("{Point(1 2)@2000-01-01, Point(3 4)@2000-01-02}",
         "{POINT(1 2)@2000-01-01 00:00:00+00, "
         "POINT(3 4)@2000-01-02 00:00:00+00}"),
        ("[Point(1 2)@2000-01-01, Point(3 4)@2000-01-02]",
         "[POINT(1 2)@2000-01-01 00:00:00+00, "
         "POINT(3 4)@2000-01-02 00:00:00+00]"),
        ("[Point(1 2)@2000-01-01, Point(3 4)@2000-01-02)",
         "[POINT(1 2)@2000-01-01 00:00:00+00, "
         "POINT(3 4)@2000-01-02 00:00:00+00)"),
        ("(Point(1 2)@2000-01-01, Point(3 4)@2000-01-02]",
         "(POINT(1 2)@2000-01-01 00:00:00+00, "
         "POINT(3 4)@2000-01-02 00:00:00+00]"),
        ("(Point(1 2)@2000-01-01, Point(3 4)@2000-01-02)",
         "(POINT(1 2)@2000-01-01 00:00:00+00, "
         "POINT(3 4)@2000-01-02 00:00:00+00)"),
        ("{[Point(1 2)@2000-01-01, Point(3 4)@2000-01-02],"
         "[Point(1 2)@2000-01-03, Point(3 4)@2000-01-04]}",
         "{[POINT(1 2)@2000-01-01 00:00:00+00, "
         "POINT(3 4)@2000-01-02 00:00:00+00], "
         "[POINT(1 2)@2000-01-03 00:00:00+00, "
         "POINT(3 4)@2000-01-04 00:00:00+00]}"),
        ("SRID=4326;Point(1 2 3)@2000-01-01",
         "SRID=4326;POINT Z (1 2 3)@2000-01-01 00:00:00+00"),
        ("SRID=4326;{Point(1 2 3)@2000-01-01, Point(4 5 6)@2000-01-02}",
         "SRID=4326;{POINT Z (1 2 3)@2000-01-01 00:00:00+00, "
         "POINT Z (4 5 6)@2000-01-02 00:00:00+00}"),
        ("SRID=4326;[Point(1 2 3)@2000-01-01, Point(4 5 6)@2000-01-02]",
         "SRID=4326;[POINT Z (1 2 3)@2000-01-01 00:00:00+00, "
         "POINT Z (4 5 6)@2000-01-02 00:00:00+00]"),
        ("SRID=4326;{[Point(1 2 3)@2000-01-01, Point(4 5 6)@2000-01-02],"
         "[Point(1 2 3)@2000-01-03, Point(4 5 6)@2000-01-04]}",
         "SRID=4326;{[POINT Z (1 2 3)@2000-01-01 00:00:00+00, "
         "POINT Z (4 5 6)@2000-01-02 00:00:00+00], "
         "[POINT Z (1 2 3)@2000-01-03 00:00:00+00, "
         "POINT Z (4 5 6)@2000-01-04 00:00:00+00]}"),
    ]
    for lit, want in cases:
        tv = parse_temporal(lit, point=True)
        assert str(MJ.from_mfjson(MJ.as_mfjson(tv))) == want, lit
        assert str(MJ.from_ewkb(MJ.as_ewkb(tv))) == want, lit


def test_ewkb_roundtrip_preserves_is_bool():
    """ADVICE r5 (low): the binary codec must carry the tbool typing
    bit — a tbool roundtripped through as_ewkb/from_ewkb keeps
    printing t/f (not 1/0) and keeps is_bool for downstream ops."""
    for lit in ["true@2000-01-01",
                "{true@2000-01-01, false@2000-01-02}",
                "{[true@2000-01-01, false@2000-01-03], "
                "[true@2000-01-04]}"]:
        tv = T.parse_temporal(lit)
        assert tv.is_bool
        rt = mfjson.from_ewkb(mfjson.as_ewkb(tv))
        assert rt.is_bool
        assert str(rt) == str(tv), lit
    # and a plain tint stays non-bool
    ti = T.parse_temporal("1@2000-01-01")
    assert not mfjson.from_ewkb(mfjson.as_ewkb(ti)).is_bool
