"""Casts, duration conversions, TBox, ttext — goldens from
`22_temporal` cast sections + `27_temporal_textfuncs`."""

import numpy as np
import pytest

from mobilitydb_spark import casts
from mobilitydb_spark import types as T
from mobilitydb_spark.ttext import TText


def tf(s):
    return T.parse_temporal(s)


def test_duration_conversions():
    i = tf("1@2000-01-01")
    assert casts.to_instant_set(i).duration == T.INSTANTSET
    assert casts.to_sequence(i).duration == T.SEQUENCE
    assert casts.to_sequence_set(i).duration == T.SEQUENCESET
    ss = tf("{[1@2000-01-01, 2@2000-01-02]}")
    assert casts.to_sequence(ss).duration == T.SEQUENCE
    multi = tf("{[1@2000-01-01, 2@2000-01-02], [3@2000-01-04, 4@2000-01-05]}")
    with pytest.raises(ValueError):
        casts.to_sequence(multi)
    with pytest.raises(ValueError):
        casts.to_instant(multi)


def test_tint_tfloat_casts():
    ti = tf("[1@2000-01-01, 2@2000-01-02]")
    ti.linear = False
    ti.step_default = True
    f = casts.tint_to_tfloat(ti)
    assert not f.linear and not f.step_default
    assert str(f).startswith("Interp=Stepwise;")
    back = casts.tfloat_to_tint(f)
    assert back.step_default
    lin = tf("[1.5@2000-01-01, 2.5@2000-01-02]")
    with pytest.raises(ValueError):
        casts.tfloat_to_tint(lin)


def test_tbox_and_period_casts():
    v = tf("[1@2000-01-01, 5@2000-01-05]")
    b = casts.tnumber_to_tbox(v)
    assert (b.xmin, b.xmax) == (1.0, 5.0)
    p = casts.to_period(v)
    assert str(p) == "[2000-01-01 00:00:00+00, 2000-01-05 00:00:00+00]"
    b2 = casts.TBox(4.0, 9.0, b.tmin, b.tmax)
    assert casts.tbox_overlaps(b, b2)
    assert casts.tbox_contains(b.expand(10.0), b2)


def test_ttext_parse_upper_print():
    # golden 27_temporal_textfuncs.test.out:157-161
    t = TText.parse("[AA@2000-01-01, BB@2000-01-02, AA@2000-01-03]")
    up = t.upper()
    assert str(up) == ('["AA"@2000-01-01 00:00:00+00, '
                       '"BB"@2000-01-02 00:00:00+00, '
                       '"AA"@2000-01-03 00:00:00+00]')
    low = t.lower()
    assert str(low).startswith('["aa"@')


def test_ttext_seqset_and_value_at():
    t = TText.parse("{[AA@2000-01-01, BB@2000-01-02, AA@2000-01-03],"
                    "[CC@2000-01-04, CC@2000-01-05]}")
    assert t.temporal.duration == T.SEQUENCESET
    assert t.value_at(int(T.parse_ts("2000-01-01 12:00:00"))) == "AA"
    assert t.value_at(int(T.parse_ts("2000-01-02"))) == "BB"
    assert t.value_at(int(T.parse_ts("2000-01-04 06:00:00"))) == "CC"


def test_ttext_concat():
    a = TText.parse("[AA@2000-01-01, BB@2000-01-02]")
    b = TText.parse("[xx@2000-01-01, yy@2000-01-02]")
    c = a.concat(b)
    assert c.value_at(int(T.parse_ts("2000-01-01"))) == "AAxx"
    assert c.value_at(int(T.parse_ts("2000-01-02"))) == "BByy"
    # step semantics between knots
    assert c.value_at(int(T.parse_ts("2000-01-01 12:00:00"))) == "AAxx"


def test_ttext_at_value_ever():
    t = TText.parse("{AA@2000-01-01, BB@2000-01-02, AA@2000-01-03}")
    got = t.at_value("AA")
    assert str(got) == ('{"AA"@2000-01-01 00:00:00+00, '
                        '"AA"@2000-01-03 00:00:00+00}')
    assert t.ever_eq("BB")
    assert not t.ever_eq("ZZ")
    assert t.at_value("ZZ") is None
