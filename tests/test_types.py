"""Golden-style tests for the temporal value model (types.py).

Cases lifted from the reference regression suites
(`test/queries/22_temporal.test.sql`, `point/test/queries/51_*`)
re-expressed per FIXTURES.md §4.
"""

import numpy as np
import pytest

from mobilitydb_spark import types as T


def test_parse_ts_formats():
    assert T.fmt_ts(T.parse_ts("2012-01-01 08:00:00")) == \
        "2012-01-01 08:00:00+00"
    assert T.parse_ts("2000-01-01") == T.parse_ts("2000-01-01 00:00:00")
    # explicit offsets convert to UTC
    assert T.parse_ts("2000-01-01 01:00:00+01") == T.parse_ts("2000-01-01 00:00:00")


def test_instant_roundtrip():
    v = T.parse_temporal("Point(1 1)@2000-01-01")
    assert v.duration == T.INSTANT
    assert str(v) == "POINT(1 1)@2000-01-01 00:00:00+00"
    f = T.parse_temporal("1.5@2012-01-01 08:00:00")
    assert str(f) == "1.5@2012-01-01 08:00:00+00"
    b = T.parse_temporal("TRUE@2012-01-01 08:00:00")
    assert b.values[0, 0] == 1.0


def test_instant_set_sorted_roundtrip():
    v = T.parse_temporal(
        " { 1@2001-01-01 08:00:00 , 2@2001-01-01 08:05:00 , "
        "3@2001-01-01 08:06:00 } ")
    assert v.duration == T.INSTANTSET
    assert str(v) == ("{1@2001-01-01 08:00:00+00, 2@2001-01-01 08:05:00+00, "
                      "3@2001-01-01 08:06:00+00}")


def test_sequence_roundtrip_and_bounds():
    v = T.parse_temporal(
        "[1@2001-01-01 08:00:00, 2@2001-01-01 08:05:00, "
        "3@2001-01-01 08:06:00]")
    assert v.duration == T.SEQUENCE
    assert v.seqs[0].lower_inc and v.seqs[0].upper_inc
    h = T.parse_temporal("(1@2001-01-01, 2@2001-01-02]")
    assert not h.seqs[0].lower_inc and h.seqs[0].upper_inc


def test_sequence_normalization_linear():
    # middle instant collinear → merged (temporalseq.c:385)
    v = T.parse_temporal(
        "[1@2000-01-01 00:00:00, 2@2000-01-01 00:01:00, "
        "3@2000-01-01 00:02:00]")
    assert v.num_instants() == 2
    assert str(v) == "[1@2000-01-01 00:00:00+00, 3@2000-01-01 00:02:00+00]"


def test_sequence_normalization_stepwise():
    v = T.parse_temporal(
        "Interp=Stepwise;[1@2000-01-01 00:00:00, 1@2000-01-01 00:01:00, "
        "2@2000-01-01 00:02:00]")
    assert v.num_instants() == 2
    assert not v.linear


def test_sequence_set_roundtrip():
    s = ("{[1@2000-01-01 00:00:00+00, 2@2000-01-01 00:01:00+00), "
         "[3@2000-01-01 00:02:00+00, 3@2000-01-01 00:03:00+00]}")
    v = T.parse_temporal(s)
    assert v.duration == T.SEQUENCESET
    assert v.num_sequences() == 2
    assert str(v) == s


def test_sequence_set_overlap_rejected():
    with pytest.raises(ValueError):
        T.parse_temporal(
            "{[1@2000-01-01, 2@2000-01-03], [5@2000-01-02, 6@2000-01-04]}")


def test_srid_prefix():
    v = T.parse_temporal("SRID=4326;Point(1 1)@2000-01-01")
    assert v.srid == 4326
    assert str(v).startswith("SRID=4326;POINT(1 1)@")


def test_value_at_linear_interpolation():
    v = T.parse_temporal(
        "[Point(0 0)@2000-01-01 00:00:00, Point(10 20)@2000-01-01 00:10:00]")
    got = v.value_at(int(T.parse_ts("2000-01-01 00:05:00")))
    np.testing.assert_allclose(got, [5.0, 10.0])
    # outside domain → None
    assert v.value_at(int(T.parse_ts("1999-12-31"))) is None
    # exclusive upper bound
    h = T.parse_temporal("[1@2000-01-01, 3@2000-01-03)")
    assert h.value_at(int(T.parse_ts("2000-01-03"))) is None
    np.testing.assert_allclose(
        h.value_at(int(T.parse_ts("2000-01-02"))), [2.0])


def test_value_at_stepwise():
    v = T.parse_temporal("Interp=Stepwise;[1@2000-01-01, 5@2000-01-03]")
    np.testing.assert_allclose(v.value_at(int(T.parse_ts("2000-01-02"))), [1.0])
    np.testing.assert_allclose(v.value_at(int(T.parse_ts("2000-01-03"))), [5.0])


def test_accessors():
    v = T.parse_temporal(
        "{[1@2000-01-01, 2@2000-01-02), [3@2000-01-03, 4@2000-01-04]}")
    assert v.num_instants() == 4
    assert v.num_sequences() == 2
    assert v.start_value()[0] == 1.0 and v.end_value()[0] == 4.0
    assert v.min_value()[0] == 1.0 and v.max_value()[0] == 4.0
    assert v.timespan() == 3 * 86400_000_000
    assert v.duration_us() == 2 * 86400_000_000
    shifted = v.shift(86400_000_000)
    assert shifted.start_timestamp() == int(T.parse_ts("2000-01-02"))


def test_period_algebra():
    p1 = T.parse_period("[2000-01-01, 2000-01-03)")
    p2 = T.parse_period("[2000-01-03, 2000-01-05]")
    assert not p1.overlaps(p2)  # )[ at the same instant do not overlap
    p3 = T.parse_period("[2000-01-02, 2000-01-04]")
    assert p1.overlaps(p3)
    inter = p1.intersection(p3)
    assert str(inter) == "[2000-01-02 00:00:00+00, 2000-01-03 00:00:00+00)"


def test_normalize_periods_merges_adjacent():
    ps = [T.parse_period("[2000-01-01, 2000-01-02)"),
          T.parse_period("[2000-01-02, 2000-01-03]"),
          T.parse_period("[2000-01-05, 2000-01-06]")]
    out = T.normalize_periods(ps)
    assert len(out) == 2
    assert str(out[0]) == "[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00]"


def test_get_time_merges_touching_sequences():
    v = T.parse_temporal(
        "{[1@2000-01-01, 2@2000-01-02), [3@2000-01-02, 4@2000-01-03]}")
    ps = v.get_time()
    assert len(ps) == 1


def test_astext_goldens_53_tpoint_out():
    """asText outputs verbatim from
    `point/test/expected/53_tpoint_out.test.out:1-35` (our __str__ IS
    asText for temporal values)."""
    cases = [
        ("Point(1 1)@2000-01-01",
         "POINT(1 1)@2000-01-01 00:00:00+00"),
        ("{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03}",
         "{POINT(1 1)@2000-01-01 00:00:00+00, "
         "POINT(2 2)@2000-01-02 00:00:00+00, "
         "POINT(1 1)@2000-01-03 00:00:00+00}"),
        ("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03]",
         "[POINT(1 1)@2000-01-01 00:00:00+00, "
         "POINT(2 2)@2000-01-02 00:00:00+00, "
         "POINT(1 1)@2000-01-03 00:00:00+00]"),
        ("{[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03],[Point(3 3)@2000-01-04, "
         "Point(3 3)@2000-01-05]}",
         "{[POINT(1 1)@2000-01-01 00:00:00+00, "
         "POINT(2 2)@2000-01-02 00:00:00+00, "
         "POINT(1 1)@2000-01-03 00:00:00+00], "
         "[POINT(3 3)@2000-01-04 00:00:00+00, "
         "POINT(3 3)@2000-01-05 00:00:00+00]}"),
        ("Point(1.5 1.5)@2000-01-01",
         "POINT(1.5 1.5)@2000-01-01 00:00:00+00"),
    ]
    for lit, want in cases:
        assert str(T.parse_temporal(lit)) == want, lit


def test_parse_ts_date_only_offset():
    """ADVICE r5 (low): date-only literals carrying a UTC offset
    ('2001-01-01+00', PG-accepted) must parse as offset-from-midnight
    — the junk-rejection regex must not see the offset."""
    assert T.parse_ts("2001-01-01+00") == T.parse_ts("2001-01-01 00:00:00")
    assert T.parse_ts("2001-01-01+02") == T.parse_ts("2000-12-31 22:00:00")
    assert T.parse_ts("2001-01-01-05") == T.parse_ts("2001-01-01 05:00:00")
    # the junk check must still reject genuine garbage
    import pytest
    with pytest.raises(ValueError, match="Error parsing datetime"):
        T.parse_ts("2001-01-01,")
