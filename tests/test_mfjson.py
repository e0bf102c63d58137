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
    assert obj["datetimes"][0] == "2000-01-01T00:00:00.000000+00:00"
