"""Golden-file tests for the restriction family.

Expected strings lifted verbatim from
`/root/reference/test/expected/22_temporal.test.out` (cited by line),
re-expressed over our value model per FIXTURES.md §4.
"""

import numpy as np
import pytest

from mobilitydb_spark import restrict as R
from mobilitydb_spark import types as T


def tb(s):  # tbool/tint-style stepwise literal (stepwise is their default)
    v = T.parse_temporal(s)
    v.linear = False
    v.step_default = True
    return v


def tf(s):  # tfloat literal (linear unless Interp prefix)
    return T.parse_temporal(s)


def out(tv):
    return "NULL" if tv is None else str(tv)


# --- atValue (22_temporal.test.out:5423-5523) ---------------------------

def test_atvalue_instant():
    assert out(R.at_value(tb("1@2000-01-01"), 1)) == \
        "1@2000-01-01 00:00:00+00"
    assert R.at_value(tb("1@2000-01-01"), 2) is None


def test_atvalue_instantset():
    v = tb("{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}")
    assert out(R.at_value(v, 1)) == \
        "{1@2000-01-01 00:00:00+00, 1@2000-01-03 00:00:00+00}"


def test_atvalue_stepwise_sequence():
    # golden 5471-5475
    v = tb("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    assert out(R.at_value(v, 1)) == \
        ("{[1@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00), "
         "[1@2000-01-03 00:00:00+00]}")


def test_atvalue_stepwise_seqset():
    # golden 5477-5481
    v = tb("{[1@2000-01-01, 2@2000-01-02, 1@2000-01-03],"
           "[3@2000-01-04, 3@2000-01-05]}")
    assert out(R.at_value(v, 1)) == \
        ("{[1@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00), "
         "[1@2000-01-03 00:00:00+00]}")
    # golden 5447-5451: constant trailing sequence stays closed
    b = tb("{[1@2000-01-01, 0@2000-01-02, 1@2000-01-03],"
           "[1@2000-01-04, 1@2000-01-05]}")
    assert out(R.at_value(b, 1)) == \
        ("{[1@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00), "
         "[1@2000-01-03 00:00:00+00], "
         "[1@2000-01-04 00:00:00+00, 1@2000-01-05 00:00:00+00]}")


def test_atvalue_linear_crossings():
    # golden 5501-5505: crossing timestamps at 12:00
    v = tf("[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03]")
    assert out(R.at_value(v, 2)) == \
        "{[2@2000-01-01 12:00:00+00], [2@2000-01-02 12:00:00+00]}"
    # golden 5507: stepwise never attains 2
    sv = tf("Interp=Stepwise;[1.5@2000-01-01, 2.5@2000-01-02, "
            "1.5@2000-01-03]")
    assert R.at_value(sv, 2) is None


def test_minusvalue_stepwise():
    # golden 5603-5607
    v = tb("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    assert out(R.minus_value(v, 1)) == \
        "{[2@2000-01-02 00:00:00+00, 2@2000-01-03 00:00:00+00)}"


# --- atPeriod / minusPeriod (7781-7995) ---------------------------------

def test_atperiod_durations_preserved():
    p = T.parse_period("[2000-01-01,2000-01-02]")
    assert out(R.at_period(tb("t@2000-01-01"), p)) == \
        "1@2000-01-01 00:00:00+00"
    v = tb("{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}")
    assert out(R.at_period(v, p)) == \
        "{1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00}"
    s = tb("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    assert out(R.at_period(s, p)) == \
        "[1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00]"
    ss = tb("{[1@2000-01-01, 2@2000-01-02, 1@2000-01-03],"
            "[1@2000-01-04, 1@2000-01-05]}")
    assert out(R.at_period(ss, p)) == \
        "{[1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00]}"


def test_minusperiod_stepwise_bounds():
    # golden 7991-7995: open lower keeps the jumped-to value
    s = tb("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    p = T.parse_period("[2000-01-01,2000-01-02]")
    assert out(R.minus_period(s, p)) == \
        "{(2@2000-01-02 00:00:00+00, 1@2000-01-03 00:00:00+00]}"


def test_minustimestamp():
    # golden 7289-7293
    s = tb("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    t = int(T.parse_ts("2000-01-01"))
    assert out(R.minus_timestamp(s, t)) == \
        ("{(1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00, "
         "1@2000-01-03 00:00:00+00]}")


def test_attimestamp_linear_interp():
    s = tf("[1@2000-01-01, 2@2000-01-02]")
    t = int(T.parse_ts("2000-01-01 12:00:00"))
    assert out(R.at_timestamp(s, t)) == "1.5@2000-01-01 12:00:00+00"


def test_attimestampset():
    s = tf("[1@2000-01-01, 3@2000-01-03]")
    ts = [int(T.parse_ts("2000-01-02")), int(T.parse_ts("2000-01-05"))]
    assert out(R.at_timestampset(s, ts)) == "2@2000-01-02 00:00:00+00"


# --- atRange (6059-6165) -------------------------------------------------

def test_atrange_linear():
    # golden 6119-6123
    v = tf("[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03]")
    assert out(R.at_range(v, 2, 3)) == \
        ("{[2@2000-01-01 12:00:00+00, 2.5@2000-01-02 00:00:00+00, "
         "2@2000-01-02 12:00:00+00]}")
    # golden 6161-6165
    w = tf("[1@2000-01-01, 2@2000-01-02]")
    assert out(R.at_range(w, 2, 3)) == "{[2@2000-01-02 00:00:00+00]}"


def test_atrange_stepwise():
    # golden 6131-6135
    v = tf("Interp=Stepwise;[1.5@2000-01-01, 2.5@2000-01-02, "
           "1.5@2000-01-03]")
    assert out(R.at_range(v, 2, 3)) == \
        ("Interp=Stepwise;{[2.5@2000-01-02 00:00:00+00, "
         "2.5@2000-01-03 00:00:00+00)}")


def test_atrange_instantset():
    v = tf("{1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03}")
    assert out(R.at_range(v, 2, 3)) == "{2.5@2000-01-02 00:00:00+00}"


# --- atMin/atMax ----------------------------------------------------------

def test_atmin_atmax():
    v = tf("[1@2000-01-01, 3@2000-01-03]")
    assert out(R.at_min(v)) == "{[1@2000-01-01 00:00:00+00]}"
    assert out(R.at_max(v)) == "{[3@2000-01-03 00:00:00+00]}"
    s = tb("{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}")
    assert out(R.at_min(s)) == \
        "{1@2000-01-01 00:00:00+00, 1@2000-01-03 00:00:00+00}"


# --- tpoint restriction ----------------------------------------------------

def test_atvalue_tpoint_crossing():
    v = T.parse_temporal(
        "[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    got = R.at_value(v, np.array([1.0, 1.0]))
    assert out(got) == "{[POINT(1 1)@2000-01-02 00:00:00+00]}"
    # a point off the segment line yields nothing
    assert R.at_value(v, np.array([1.0, 0.5])) is None


def test_atperiod_tpoint_interpolates_bounds():
    v = T.parse_temporal(
        "[Point(0 0)@2000-01-01, Point(4 8)@2000-01-05]")
    p = T.parse_period("[2000-01-02, 2000-01-03]")
    assert out(R.at_period(v, p)) == \
        "[POINT(1 2)@2000-01-02 00:00:00+00, POINT(2 4)@2000-01-03 00:00:00+00]"


def test_complement_periods_roundtrip():
    ps = [T.parse_period("[2000-01-01, 2000-01-02)"),
          T.parse_period("(2000-01-03, 2000-01-05]")]
    comp = R.complement_periods(ps)
    # complement of the complement restores the original (within bounds)
    again = R.complement_periods(comp)
    assert [str(p) for p in again] == [str(p) for p in T.normalize_periods(ps)]


def test_intersects_predicates():
    v = tb("{[1@2000-01-01, 2@2000-01-02), [1@2000-01-04, 1@2000-01-05]}")
    assert R.intersects_timestamp(v, int(T.parse_ts("2000-01-01")))
    assert not R.intersects_timestamp(v, int(T.parse_ts("2000-01-02")))
    assert not R.intersects_timestamp(v, int(T.parse_ts("2000-01-03")))
    p = T.parse_period("[2000-01-02, 2000-01-03]")
    assert not R.intersects_period(v, p)
    p2 = T.parse_period("[2000-01-02, 2000-01-04]")
    assert R.intersects_period(v, p2)


def test_atrange_exclusive_bound_at_segment_endpoint():
    """ADVICE r2: when a segment endpoint value equals an EXCLUSIVE
    range bound, the clip period inherits the exclusive bound
    (reference ANDs lower_incl with lower_inc(intersect),
    tnumberseq_at_range1)."""
    v = tf("[10@2000-01-01, 20@2000-01-02]")
    assert out(R.at_range(v, 10, 20, lo_inc=False)) == \
        "{(10@2000-01-01 00:00:00+00, 20@2000-01-02 00:00:00+00]}"
    assert out(R.at_range(v, 10, 20, hi_inc=False)) == \
        "{[10@2000-01-01 00:00:00+00, 20@2000-01-02 00:00:00+00)}"
    w = tf("[20@2000-01-01, 10@2000-01-02]")
    assert out(R.at_range(w, 10, 20, lo_inc=False)) == \
        "{[20@2000-01-01 00:00:00+00, 10@2000-01-02 00:00:00+00)}"
    assert out(R.at_range(w, 10, 20, hi_inc=False)) == \
        "{(20@2000-01-01 00:00:00+00, 10@2000-01-02 00:00:00+00]}"


def test_atranges_union_of_ranges():
    """atRanges = union of per-range clips, normalized
    (temporal.c:2630)."""
    v = tf("[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03]")
    # two disjoint ranges: the dip below 2 between them stays excluded
    got = R.at_ranges(v, [(1.0, 1.75), (2.25, 3.0)])
    assert out(got) == (
        "{[1.5@2000-01-01 00:00:00+00, 1.75@2000-01-01 06:00:00+00], "
        "[2.25@2000-01-01 18:00:00+00, 2.5@2000-01-02 00:00:00+00, "
        "2.25@2000-01-02 06:00:00+00], "
        "[1.75@2000-01-02 18:00:00+00, 1.5@2000-01-03 00:00:00+00]}")
    # touching ranges merge into the full value
    whole = R.at_ranges(v, [(1.0, 2.0), (2.0, 3.0)])
    assert out(whole) == ("{[1.5@2000-01-01 00:00:00+00, "
                          "2.5@2000-01-02 00:00:00+00, "
                          "1.5@2000-01-03 00:00:00+00]}")
    # minusRanges complements
    assert R.minus_ranges(v, [(0.0, 3.0)]) is None
    m = R.minus_ranges(v, [(2.0, 3.0)])
    assert "2.5" not in out(m)
