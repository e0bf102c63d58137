"""Literal-grammar error cases (22_temporal.test.sql /* Errors */
sections): malformed literals must raise, not mis-parse."""

import pytest

from mobilitydb_spark import types as T


@pytest.mark.parametrize("bad", [
    "25",                                    # no @timestamp
    "2@2000-01-01 08:00:00,",                # trailing comma
    "{1@2001-01-01, 2@2001-01-02, 3@2001-01-03",   # unclosed set
    "[true@2001-01-01, true@2001-01-02",     # unclosed sequence
    "ABC@2000-01-01",                        # non-numeric non-bool value
])
def test_bad_literals_raise(bad):
    with pytest.raises((ValueError, IndexError)):
        T.parse_temporal(bad)


def test_duplicate_instant_set_timestamps_rejected():
    with pytest.raises(ValueError):
        T.parse_temporal("{1@2000-01-01, 2@2000-01-01}")


def test_decreasing_sequence_rejected():
    with pytest.raises(ValueError):
        T.parse_temporal("[1@2000-01-02, 2@2000-01-01]")


def test_instantaneous_open_period_rejected():
    with pytest.raises(ValueError):
        T.parse_period("[2000-01-01, 2000-01-01)")


def test_mixed_srid_binary_op_rejected():
    from mobilitydb_spark import lifting
    a = T.parse_temporal("SRID=4326;[Point(0 0)@2000-01-01, "
                         "Point(1 1)@2000-01-02]")
    b = T.parse_temporal("SRID=3857;[Point(0 0)@2000-01-01, "
                         "Point(1 1)@2000-01-02]")
    with pytest.raises(ValueError, match="SRID"):
        lifting.tdistance(a, b)


def test_mixed_dimensionality_rejected():
    from mobilitydb_spark import lifting
    a = T.parse_temporal("[Point(0 0)@2000-01-01, Point(1 1)@2000-01-02]")
    b = T.parse_temporal("[1@2000-01-01, 2@2000-01-02]")
    with pytest.raises(ValueError, match="dimensionality"):
        lifting.tadd(a, b)
