"""Spatial function tests — goldens from
`point/test/expected/56_tpoint_spatialfuncs.test.out` (cited) plus
property checks for the exact kernels."""

import numpy as np

from mobilitydb_spark import geo, spatial
from mobilitydb_spark import types as T


def tp(s):
    return T.parse_temporal(s)


def out(tv):
    return "NULL" if tv is None else str(tv)


def ts(s):
    return int(T.parse_ts(s))


SQUARE = geo.from_wkb(geo.polygon_wkb(
    np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)))


def test_length_golden():
    # 56_…out:448-467: instants/instant sets → 0; [1 1 → 2 2 → 1 1] → 2.828427
    assert spatial.length(tp("Point(1 1)@2000-01-01")) == 0.0
    assert spatial.length(
        tp("{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02}")) == 0.0
    v = tp("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
           "Point(1 1)@2000-01-03]")
    assert round(spatial.length(v), 6) == 2.828427


def test_speed_golden():
    # 56_…out:748-752: constant speed ≈ 1.6e-05 units/sec, normalized
    v = tp("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
           "Point(1 1)@2000-01-03]")
    sp = spatial.speed(v)
    assert not sp.linear
    assert sp.num_instants() == 2
    np.testing.assert_allclose(sp.values[:, 0],
                               np.sqrt(2) / 86400, rtol=1e-9)


def test_azimuth_golden():
    # 56_…out:964-968: degrees = {[45@d1, 225@d2, 225@d3]}
    v = tp("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
           "Point(1 1)@2000-01-03]")
    az = spatial.azimuth(v)
    assert az.duration == T.SEQUENCESET
    got = np.degrees(az.values[:, 0])
    np.testing.assert_allclose(got, [45.0, 225.0, 225.0])


def test_cumulative_length_endpoints():
    v = tp("[Point(0 0)@2000-01-01, Point(3 4)@2000-01-02, "
           "Point(3 4)@2000-01-03]")
    cl = spatial.cumulative_length(v)
    assert cl.values[0, 0] == 0.0
    assert cl.values[-1, 0] == 5.0


def test_twcentroid_weighted():
    # dwell twice as long near (2 2): centroid pulled toward it
    v = tp("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-02, "
           "Point(2 2)@2000-01-04]")
    c = spatial.twcentroid(v)
    np.testing.assert_allclose(c, [(1 * 1 + 2 * 2) / 3, (1 + 4) / 3])


def test_trajectory_kinds():
    assert spatial.trajectory(tp("Point(1 1)@2000-01-01")).kind == "Point"
    assert spatial.trajectory(
        tp("{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02}")).kind == "MultiPoint"
    assert spatial.trajectory(
        tp("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02]")).kind == "LineString"


def test_at_geometry_exact_entry_exit():
    # enters the 2×2 square at (2,2)·r: segment (3,3)→(0,0) crosses x=2
    # at r=1/3 → timestamp d1 + 16h
    v = tp("[Point(3 3)@2000-01-01, Point(0 0)@2000-01-04]")
    got = spatial.at_geometry(v, SQUARE)
    assert out(got) == ("{[POINT(2 2)@2000-01-02 00:00:00+00, "
                        "POINT(0 0)@2000-01-04 00:00:00+00]}")
    # minus is the complement
    mg = spatial.minus_geometry(v, SQUARE)
    assert out(mg) == ("{[POINT(3 3)@2000-01-01 00:00:00+00, "
                       "POINT(2 2)@2000-01-02 00:00:00+00)}")


def test_at_geometry_pass_through():
    # crosses the square: outside → inside → outside
    v = tp("[Point(-1 1)@2000-01-01, Point(3 1)@2000-01-05]")
    ps = spatial.at_geometry_periods(v, SQUARE)
    assert len(ps) == 1
    assert T.fmt_ts(ps[0].lower) == "2000-01-02 00:00:00+00"
    assert T.fmt_ts(ps[0].upper) == "2000-01-04 00:00:00+00"


def test_at_geometry_empty_is_none():
    v = tp("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02]")
    assert spatial.at_geometry(v, geo.Geometry("Polygon", [])) is None


def test_at_geometry_stepwise():
    v = tp("Interp=Stepwise;[Point(1 1)@2000-01-01, Point(5 5)@2000-01-03, "
           "Point(1 1)@2000-01-05]")
    ps = spatial.at_geometry_periods(v, SQUARE)
    # inside on [d1,d3) and at the final instant d5
    assert len(ps) == 2
    assert not ps[0].upper_inc
    assert ps[1].lower == ps[1].upper == ts("2000-01-05")


def test_tintersects_pieces():
    v = tp("[Point(-1 1)@2000-01-01, Point(3 1)@2000-01-05]")
    tb = spatial.tintersects(v, SQUARE)
    # reference piece form: value change at the included interior knot
    # ({[f@.., t@.., t@..], (f@.., f@..]} convention)
    assert out(tb) == ("{[0@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00"
                       ", 1@2000-01-04 00:00:00+00]"
                       ", (0@2000-01-04 00:00:00+00, 0@2000-01-05 00:00:00+00]}")


def test_tdwithin_quadratic_roots():
    # points approach to distance 0 at d2 then separate; within 1.0
    # exactly while |4 - 4τ| ≤ 1 on each side (τ days from d1)
    a = tp("[Point(0 0)@2000-01-01, Point(4 0)@2000-01-03]")
    b = tp("[Point(4 0)@2000-01-01, Point(0 0)@2000-01-03]")
    tb = spatial.tdwithin(a, b, 1.0)
    # gap 4-4τ (τ in [0,2] days): |gap|≤1 → τ ∈ [0.75, 1.25] days
    assert out(tb) == ("{[0@2000-01-01 00:00:00+00, 1@2000-01-01 18:00:00+00"
                       ", 1@2000-01-02 06:00:00+00]"
                       ", (0@2000-01-02 06:00:00+00, 0@2000-01-03 00:00:00+00]}")


def test_tdwithin_fixed_point():
    a = tp("[Point(0 0)@2000-01-01, Point(4 0)@2000-01-05]")
    tb = spatial.tdwithin(a, np.array([2.0, 0.0]), 1.0)
    # within 1 of (2,0) exactly while x ∈ [1,3] → [d2, d4]
    assert tb.value_at(ts("2000-01-01 12:00:00"))[0] == 0.0
    assert tb.value_at(ts("2000-01-02"))[0] == 1.0
    assert tb.value_at(ts("2000-01-03"))[0] == 1.0
    assert tb.value_at(ts("2000-01-04"))[0] == 1.0
    assert tb.value_at(ts("2000-01-04 12:00:00"))[0] == 0.0


def test_nai_nad_to_geometry():
    v = tp("[Point(5 0)@2000-01-01, Point(5 10)@2000-01-11]")
    # closest approach to the unit square at y in [0,2] → distance 3
    t, d = spatial.nearest_approach_instant(v, SQUARE)
    assert d == 3.0
    assert T.fmt_ts(t) == "2000-01-01 00:00:00+00"  # earliest tie
    assert spatial.nearest_approach_distance(v, SQUARE) == 3.0


def test_nai_between_tpoints():
    a = tp("[Point(0 0)@2000-01-01, Point(4 0)@2000-01-03]")
    b = tp("[Point(4 0)@2000-01-01, Point(0 0)@2000-01-03]")
    t, d = spatial.nearest_approach_instant(a, b)
    assert T.fmt_ts(t) == "2000-01-02 00:00:00+00"
    assert d == 0.0


def test_shortest_line():
    v = tp("[Point(5 1)@2000-01-01, Point(7 1)@2000-01-03]")
    seg = spatial.shortest_line(v, SQUARE)
    np.testing.assert_allclose(seg, [[5.0, 1.0], [2.0, 1.0]])


def test_at_geometry_matches_tintersects_domain():
    rng = np.random.default_rng(7)
    for _ in range(20):
        pts = rng.uniform(-2, 4, size=(4, 2))
        times = [ts("2000-01-01") + i * 86400_000_000 for i in range(4)]
        v = T.Temporal.sequence(np.array(times), pts)
        ps = spatial.at_geometry_periods(v, SQUARE)
        ag = spatial.at_geometry(v, SQUARE)
        if ps:
            assert ag is not None
            # every at-geometry instant is actually inside the square
            for s in ag.seqs:
                inside = geo.points_in_polygon(s.values[:, 0],
                                               s.values[:, 1], SQUARE)
                d = geo.point_polygon_dist(s.values[:, 0], s.values[:, 1],
                                           SQUARE)
                assert (inside | (d < 1e-5)).all()
        else:
            assert ag is None


# --- tdwithin truth tables (golden examples embedded in the reference
# source, point/src/tpoint_tempspatialrels.c:875-1040) ---------------

def _tdw(a_lit, b_lit, d):
    return out(spatial.tdwithin(tp(a_lit), tp(b_lit), d))


def test_tdwithin_parallel_within():
    # "{[t@2000-01-01, t@2000-01-02]}"
    assert _tdw("[Point(0 1)@2000-01-01, Point(1 2)@2000-01-02]",
                "[Point(0 0)@2000-01-01, Point(1 1)@2000-01-02]", 1) == \
        "{[1@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00]}"


def test_tdwithin_parallel_not_within():
    # "{[f@2000-01-01, f@2000-01-02]}"
    assert _tdw("[Point(0 2)@2000-01-01, Point(1 3)@2000-01-02]",
                "[Point(0 0)@2000-01-01, Point(1 1)@2000-01-02]", 1) == \
        "{[0@2000-01-01 00:00:00+00, 0@2000-01-02 00:00:00+00]}"


def test_tdwithin_no_solution():
    # "{[f@2000-01-01, f@2000-01-03]}"
    assert _tdw("[Point(2 3)@2000-01-01, Point(3 4)@2000-01-03]",
                "[Point(4 4)@2000-01-01, Point(6 2)@2000-01-03]", 1) == \
        "{[0@2000-01-01 00:00:00+00, 0@2000-01-03 00:00:00+00]}"


def test_tdwithin_one_solution_within_segment():
    # "{[f@2000-01-01, t@2000-01-02], (f@2000-01-02, f@2000-01-03]}"
    assert _tdw("[Point(2 2)@2000-01-01, Point(1 1)@2000-01-03]",
                "[Point(3 1)@2000-01-01, Point(2 2)@2000-01-03]", 1) == \
        ("{[0@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00], "
         "(0@2000-01-02 00:00:00+00, 0@2000-01-03 00:00:00+00]}")


def test_tdwithin_one_solution_outside_segment():
    # "{[f@2000-01-01, f@2000-01-03]}"
    assert _tdw("[Point(3 3)@2000-01-01, Point(2 2)@2000-01-03]",
                "[Point(4 0)@2000-01-01, Point(3 1)@2000-01-03]", 1) == \
        "{[0@2000-01-01 00:00:00+00, 0@2000-01-03 00:00:00+00]}"


def test_tdwithin_two_solutions_contained():
    # "{[f@2000-01-01, t@2000-01-02, t@2000-01-04], (f@2000-01-04, f@2000-01-05]}"
    assert _tdw("[Point(1 1)@2000-01-01, Point(5 5)@2000-01-05]",
                "[Point(1 3)@2000-01-01, Point(5 3)@2000-01-05]", 1) == \
        ("{[0@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00, "
         "1@2000-01-04 00:00:00+00], "
         "(0@2000-01-04 00:00:00+00, 0@2000-01-05 00:00:00+00]}")


def test_tdwithin_solution_contains_segment():
    # "{[t@2000-01-02 12:00, t@2000-01-03 12:00]}"
    assert _tdw("[Point(2.5 2.5)@2000-01-02 12:00:00, "
                "Point(3.5 3.5)@2000-01-05 12:00:00]",
                "[Point(2.5 3.0)@2000-01-02 12:00:00, "
                "Point(3.5 3.0)@2000-01-03 12:00:00]", 1) == \
        "{[1@2000-01-02 12:00:00+00, 1@2000-01-03 12:00:00+00]}"


def test_tdwithin_overlap_left():
    # reference comment "{[t@d3, f@d4, f@d5]}"
    # (`tpoint_tempspatialrels.c:1110-1140`, lower == t1 && upper != t2
    # branch): the within-run covers [d3, d4) and the exit-root instant
    # belongs to the FALSE tail — the verbatim solver reproduces it
    assert _tdw("[Point(3 3)@2000-01-03, Point(5 5)@2000-01-05]",
                "[Point(3 3)@2000-01-03, Point(5 3)@2000-01-05]", 1) == \
        ("{[1@2000-01-03 00:00:00+00, 0@2000-01-04 00:00:00+00, "
         "0@2000-01-05 00:00:00+00]}")


def test_tdwithin_overlap_right():
    # "{[f@2000-01-01, t@2000-01-02, t@2000-01-03]}"
    assert _tdw("[Point(1 1)@2000-01-01, Point(3 3)@2000-01-03]",
                "[Point(1 3)@2000-01-01, Point(3 3)@2000-01-03]", 1) == \
        ("{[0@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00, "
         "1@2000-01-03 00:00:00+00]}")


def test_tdwithin_touch_at_instant():
    # "{[t@2000-01-04], (f@2000-01-04, f@2000-01-05]}"
    assert _tdw("[Point(4 4)@2000-01-04, Point(5 5)@2000-01-05]",
                "[Point(4 3)@2000-01-04, Point(5 3)@2000-01-05]", 1) == \
        ("{[1@2000-01-04 00:00:00+00], "
         "(0@2000-01-04 00:00:00+00, 0@2000-01-05 00:00:00+00]}")


def test_at_line_collinear_partial_overlap():
    # segment lies ALONG the line but extends past it: the overlap is a
    # run, not an instant (r4 ADVICE; reference tpointseq_at_geometry1
    # computes the true intersection)
    import numpy as np
    from mobilitydb_spark.types import parse_temporal
    tv = parse_temporal("[Point(0 0)@2000-01-01, Point(2 0)@2000-01-03]",
                        point=True)
    g = geo.Geometry("LineString", [np.array([[0., 0.], [1., 0.]])])
    ps = spatial.at_geometry_periods(tv, g)
    assert [str(p) for p in ps] == \
        ["[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00]"]
    # middle overlap: neither endpoint on the line
    tv2 = parse_temporal("[Point(0 0)@2000-01-01, Point(3 0)@2000-01-04]",
                         point=True)
    g2 = geo.Geometry("LineString", [np.array([[1., 0.], [2., 0.]])])
    ps2 = spatial.at_geometry_periods(tv2, g2)
    assert [str(p) for p in ps2] == \
        ["[2000-01-02 00:00:00+00, 2000-01-03 00:00:00+00]"]
    # collinear but disjoint: nothing
    g4 = geo.Geometry("LineString", [np.array([[5., 0.], [6., 0.]])])
    assert spatial.at_geometry_periods(tv2, g4) == []


def test_tdistance_geometry_profile():
    # extension profile: reference errors on line operands (62-suite
    # error block); the profile must agree with the NAD kernel at its
    # minimum and with exact point distances at every knot
    import numpy as np
    from mobilitydb_spark.types import parse_temporal
    tv = parse_temporal("[Point(0 0)@2000-01-01, Point(4 0)@2000-01-05]",
                        point=True)
    g = geo.Geometry("LineString", [np.array([[2., 1.], [2., 3.]])])
    prof = spatial.tdistance_geometry(tv, g)
    nai_t, nad = spatial.nearest_approach_instant(tv, g)
    assert abs(float(prof.min_value()[0]) - nad) < 1e-12
    for s in prof.seqs:
        for t, v in zip(s.times, s.values[:, 0]):
            p = tv.value_at(int(t))
            assert abs(spatial._point_geom_dist(p, g) - v) < 1e-12
    # polygon operand: zero inside, positive outside
    sq = geo.Geometry("Polygon", [np.array(
        [[1., -1.], [3., -1.], [3., 1.], [1., 1.], [1., -1.]])])
    prof2 = spatial.tdistance_geometry(tv, sq)
    assert float(prof2.min_value()[0]) == 0.0
    assert spatial.tdistance_geometry(tv, geo.Geometry("Polygon", [])) is None
