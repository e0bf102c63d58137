"""56_tpoint_spatialfuncs round-5 tranches run verbatim: |=| (NAD
operator), ShortestLine, NearestApproachInstant (+setPrecision),
round(degrees(azimuth(..))), twcentroid and trajectory — 437 golden
cases from `point/test/expected/56_tpoint_spatialfuncs.test.out` via
scripts/port_56_more_goldens.py.

Geography measures follow the PostGIS model reverse-engineered to
1e-6 m: closest point on the great-circle edge (unit sphere), metric
distance by Vincenty on WGS84 (geog.point_edge_distance_spheroid);
azimuth is the Vincenty forward bearing."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_distance62_suite import to_operand  # noqa: E402
from test_spatialfuncs56_suite import rnd_numeric  # noqa: E402
from test_temporal22_suite import Skip  # noqa: E402

from mobilitydb_spark import geo, geog, spatial  # noqa: E402
from mobilitydb_spark.types import INSTANT, INSTANTSET, Seq, Temporal  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "spatialfuncs_56_more.json")


def fmt_num(x: float) -> str:
    if x == int(x):
        return str(int(x))
    return f"{x:.15g}"


def wkt_coords(c: np.ndarray) -> str:
    return " ".join(fmt_num(v) for v in c)


def wkt(g: geo.Geometry, dim: int) -> str:
    zed = " Z " if dim == 3 else ""
    paren = lambda pts: ",".join(wkt_coords(p) for p in pts)  # noqa: E731
    if g.kind == "Point":
        return f"POINT{zed or ''}({paren(g.parts[0])})" if dim == 2 \
            else f"POINT Z ({paren(g.parts[0])})"
    if g.kind == "MultiPoint":
        body = ",".join(wkt_coords(p[0]) for p in g.parts)
        return f"MULTIPOINT{' Z (' if dim == 3 else '('}{body})"
    if g.kind == "LineString":
        return f"LINESTRING{' Z (' if dim == 3 else '('}{paren(g.parts[0])})"
    if g.kind == "MultiLineString":
        lens = [len(c) for c in g.parts]
        if all(n == 1 for n in lens):
            # stationary pieces only: collapse to POINT/MULTIPOINT
            # (first-appearance unique, the reference convention)
            seen, pts = set(), []
            for c in g.parts:
                key = tuple(c[0])
                if key not in seen:
                    seen.add(key)
                    pts.append(c[0])
            if len(pts) == 1:
                return wkt(geo.Geometry("Point", [np.array(pts)]), dim)
            body = ",".join(wkt_coords(p) for p in pts)
            return f"MULTIPOINT{' Z (' if dim == 3 else '('}{body})"
        if any(n == 1 for n in lens):
            # mixed stationary + moving pieces: GEOMETRYCOLLECTION
            inner = ",".join(
                wkt(geo.Geometry("Point" if len(c) == 1 else "LineString",
                                 [c]), dim)
                for c in g.parts)
            return ("GEOMETRYCOLLECTION Z (" if dim == 3
                    else "GEOMETRYCOLLECTION(") + inner + ")"
        body = ",".join("(" + paren(c) + ")" for c in g.parts)
        return f"MULTILINESTRING{' Z (' if dim == 3 else '('}{body})"
    raise Skip(f"wkt kind {g.kind}")


def pg_round_vals(v: np.ndarray, d: int) -> np.ndarray:
    scale = 10.0 ** d
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale


def is_geog(tok: str) -> bool:
    return "tgeogpoint" in tok or "geography" in tok


# --- reference-shaped NAI (tpoint_spatialfuncs.c:2131-2265) -----------------

def _nai_seq_geo(tv: Temporal, g: geo.Geometry,
                 distf) -> tuple[np.ndarray, int]:
    """(value, t) per the reference loop: per-segment witness fraction
    (closest point on the segment), strict-< minimum across segments;
    t truncates toward zero.  ``distf(point2d) -> float`` measures a
    witness against the geometry."""
    best = (np.inf, None, None)
    discrete = tv.duration in (INSTANT, INSTANTSET) or not tv.linear
    for s in tv.seqs:
        n = len(s.times)
        if discrete or n == 1:
            for i in range(n):
                d = distf(s.values[i])
                if d < best[0]:
                    best = (d, s.values[i], int(s.times[i]))
            continue
        for i in range(n - 1):
            p0, p1 = s.values[i], s.values[i + 1]
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            if np.array_equal(p0, p1):
                val, t = p0, t0
            else:
                _, r = spatial._seg_geom_min(p0, p1, g)
                # collinear run ON the geometry: lw_dist2d's witness
                # for an overlapping segment is its END vertex
                # (observed in the reference goldens: [1,2,1] on the
                # line yields POINT(2 2)@d2)
                if distf(p0) == 0.0 and distf(p1) == 0.0 \
                        and distf((p0 + p1) / 2.0) == 0.0:
                    r = 1.0
                if r == 0.0:
                    val, t = p0, t0
                elif r == 1.0:
                    val, t = p1, t1
                else:
                    val = p0 + (p1 - p0) * r
                    t = t0 + int((t1 - t0) * r)
            d = distf(val)
            if d < best[0]:
                best = (d, val, t)
    return best[1], best[2]


def planar_distf(g: geo.Geometry):
    return lambda p: spatial._point_geom_dist(np.asarray(p), g)


geog_value_at = geog.geog_value_at


def _nai_seq_geo_geog(tv: Temporal, g: geo.Geometry):
    """Geography NAI against a geometry operand
    (NAI_tpointseq_geo1, tpoint_spatialfuncs.c:2152-2215): per linear
    segment the witness fraction comes from the planar closest point
    in the _ST_BestSRID UTM plane; t truncates; the witness value
    re-interpolates through the projected chord; the arg-min distance
    is the spheroid distance.  Discrete/stepwise durations take the
    min-distance vertex."""
    distf = geog_distf(g)
    discrete = tv.duration in (INSTANT, INSTANTSET) or not tv.linear
    best = (np.inf, None, None)
    g2 = None
    for s in tv.seqs:
        n = len(s.times)
        if discrete or n == 1:
            for i in range(n):
                d = distf(s.values[i])
                if d < best[0]:
                    best = (d, s.values[i], int(s.times[i]))
            continue
        for i in range(n - 1):
            p0, p1 = s.values[i], s.values[i + 1]
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            if np.array_equal(p0, p1):
                val, t = p0, t0
            else:
                lons = np.concatenate(
                    [[p0[0], p1[0]]] + [np.atleast_2d(p)[:, 0]
                                        for p in g.parts])
                lon0 = geog.best_utm_lon0(lons)
                seg2 = geog.utm_forward_np(
                    np.stack([p0[:2], p1[:2]]), lon0)
                g2 = geo.Geometry(
                    g.kind, [np.hstack([
                        geog.utm_forward_np(np.atleast_2d(p)[:, :2],
                                            lon0),
                        np.atleast_2d(p)[:, 2:]])
                        for p in g.parts], g.srid)
                _, r = spatial._seg_geom_min(seg2[0], seg2[1], g2)
                r = float(r)
                if r == 0.0:
                    val, t = p0, t0
                elif r == 1.0:
                    val, t = p1, t1
                else:
                    t = t0 + int((t1 - t0) * r)
                    ratio = (t - t0) / (t1 - t0)
                    val = geog.geog_interpolate_point(p0, p1, ratio)
            d = distf(val)
            if d < best[0]:
                best = (d, val, t)
    return best[1], best[2]


def geog_distf(g: geo.Geometry):
    def f(p):
        p = np.asarray(p)
        if g.kind == "Point":
            return float(geo.vincenty_m(p[0], p[1],
                                        g.parts[0][0][0], g.parts[0][0][1])[0])
        return geog.point_line_distance_spheroid(p[0], p[1], g.parts[0])
    return f


def closest_on_geom(p: np.ndarray, g: geo.Geometry) -> np.ndarray:
    if g.kind in ("Point", "MultiPoint"):
        pts = np.vstack(g.parts)
        return pts[np.argmin(((pts - p) ** 2).sum(axis=1))]
    best = (np.inf, None)
    for a, b in spatial._line_segments(g):
        d, r = geo.point_segment_dist(p[0:1], p[1:2], a[0], a[1], b[0], b[1])
        if d[0] < best[0]:
            best = (float(d[0]), a + (b - a) * float(r[0] if np.ndim(r) else r))
    return best[1]


def fmt_inst(val: np.ndarray, t: int, digits=None) -> str:
    from mobilitydb_spark.types import fmt_ts
    v = pg_round_vals(np.asarray(val, dtype=np.float64), digits) \
        if digits is not None else np.asarray(val, dtype=np.float64)
    if len(v) == 3:
        body = f"POINT Z ({wkt_coords(v)})"
    else:
        body = f"POINT({wkt_coords(v)})"
    return f"{body}@{fmt_ts(t)}"


def run_case(fam, a_tok, b_tok, digits):
    gflag = is_geog(a_tok) or (b_tok is not None and is_geog(b_tok))
    a = to_operand(a_tok)
    b = to_operand(b_tok) if b_tok is not None else None

    if fam == "trajectory":
        assert isinstance(a, Temporal)
        g = spatial.trajectory(a)
        return wkt(g, a.dim)

    if fam == "twcentroid":
        c = spatial.twcentroid(a)
        if len(c) == 3:
            return f"POINT Z ({wkt_coords(c)})"
        return f"POINT({wkt_coords(c)})"

    if fam == "azimuth":
        res = geog.geog_azimuth(a) if gflag else spatial.azimuth(a)
        if res is None:
            return ""
        seqs = [Seq(s.times.copy(),
                    pg_round_vals(np.degrees(s.values), digits),
                    s.lower_inc, s.upper_inc) for s in res.seqs]
        return str(Temporal(res.duration, seqs, res.linear, 0,
                            res.step_default))

    # two-operand families: normalize to (tpoint, other)
    if not isinstance(a, Temporal):
        a, b = b, a
    assert isinstance(a, Temporal)
    other = b

    if isinstance(other, geo.Geometry) and other.is_empty:
        return ""

    if fam == "nadop":
        if gflag:
            if isinstance(other, Temporal):
                prof = geog.geog_distance_spheroid(a, other)
                if prof is None:
                    return ""
                d = float(prof.min_value()[0])
            else:
                df = geog_distf(other)
                val, _t = _nai_seq_geo(a, other, df)
                d = df(val)
        else:
            if isinstance(other, Temporal):
                _t, d = spatial.nearest_approach_instant(a, other)
            else:
                df = planar_distf(other)
                val, _t = _nai_seq_geo(a, other, df)
                d = df(val)
        return rnd_numeric(d, digits)

    if fam in ("nai", "nai_prec"):
        if isinstance(other, Temporal):
            if gflag:
                prof = geog.geog_distance_spheroid(a, other)
            else:
                from mobilitydb_spark.lifting import tdistance
                prof = tdistance(a, other)
            if prof is None:
                return ""
            best_t, best_d = None, np.inf
            for s in prof.seqs:
                i = int(np.argmin(s.values[:, 0]))
                if s.values[i, 0] < best_d:
                    best_d = float(s.values[i, 0])
                    best_t = int(s.times[i])
            val = (geog_value_at(a, best_t) if gflag
                   else a.value_at(best_t))
            return fmt_inst(val, best_t, digits)
        if gflag:
            val, t = _nai_seq_geo_geog(a, other)
            return fmt_inst(val, t, digits)
        val, t = _nai_seq_geo(a, other, planar_distf(other))
        return fmt_inst(val, t, digits)

    if fam == "shortestline":
        if gflag and isinstance(other, Temporal) and \
                (a.duration == INSTANT) == (other.duration == INSTANT):
            # geography shortestLine(tpoint, tpoint): the reference
            # syncs the spheroid distance with NO turning function
            # (shortestline_tpointseq_tpointseq passes turnfn=NULL,
            # tpoint_spatialfuncs.c:2610-2635), so the minimum is over
            # sync knots only, earliest first; values re-read through
            # the geography at-timestamp path
            from mobilitydb_spark.lifting import synchronize
            best_t, best_d = None, np.inf
            for ts, va, vb, _lo, _hi in synchronize(a, other):
                for i in range(len(ts)):
                    d = float(geo.vincenty_m(va[i][0], va[i][1],
                                             vb[i][0], vb[i][1])[0])
                    if d < best_d:
                        best_d, best_t = d, int(ts[i])
            if best_t is None:
                return ""
            seg = np.vstack([geog_value_at(a, best_t),
                             geog_value_at(other, best_t)])
            return wkt(geo.Geometry("LineString", [seg]), seg.shape[1])
        # geography shortestLine(tpoint, geo) dispatches to the SAME
        # planar LWGEOM_shortestline2d over raw lon/lat coordinates
        # (tpoint_spatialfuncs.c:2539-2565 — no BestSRID here), so the
        # planar path below covers geography operands verbatim
        if isinstance(other, Temporal):
            if (a.duration == INSTANT) != (other.duration == INSTANT):
                # reference quirk: synchronize() for instant x
                # non-instant hands the NON-instant side's value to
                # BOTH outputs, so ShortestLine degenerates to that
                # value twice (goldens: {1,2,1} x 2@d1 -> (1 1,1 1))
                inst, noninst = (a, other) if a.duration == INSTANT \
                    else (other, a)
                t = int(inst.seqs[0].times[0])
                v = noninst.value_at(t)
                if v is None:
                    return ""
                seg = np.vstack([v, v])
            else:
                seg = spatial.shortest_line(a, other)
        else:
            df = planar_distf(other)
            val, _t = _nai_seq_geo(a, other, df)
            val = np.asarray(val, dtype=np.float64)
            w = other.parts[0].shape[1] if other.parts else len(val)
            q = closest_on_geom(val[:w], other)
            seg = np.vstack([val[:w], q])
        dim = seg.shape[1]
        return wkt(geo.Geometry("LineString", [seg]), dim)

    raise Skip(fam)


def _wit_points(s: str) -> list[np.ndarray]:
    return [np.array([float(x) for x in m.split()])
            for m in re.findall(r"\(([-\d. ]+?)[,)]|,([-\d. ]+?)\)", "")] \
        or [np.array([float(v) for v in grp.split()])
            for grp in re.findall(r"[-\d.]+(?: [-\d.]+)+", s)]


def _tie_ok(fam, a_tok, b_tok, want, got) -> bool:
    """NAI/ShortestLine are argmin SELECTORS: when a minimum is
    attained on a whole sub-segment (collinear overlap, distance 0
    throughout), any witness is correct and lw_dist2d's pick is
    implementation-defined.  Accept `got` iff both witnesses realize
    the same distance against the other operand."""
    if fam not in ("nai", "nai_prec", "shortestline"):
        return False
    try:
        a = to_operand(a_tok)
        b = to_operand(b_tok) if b_tok else None
        if not isinstance(a, Temporal):
            a, b = b, a
        if isinstance(b, Temporal) and is_geog(a_tok):
            # geography tpoint×tpoint argmin tie: the knots-only
            # spheroid profile has bit-equal minima at several knots
            # and the pick follows the geodesic solver's last-ulp
            # argument-order bias — accept any witness pair realizing
            # the same spheroid distance (crossing-diagonal cases)
            wp, gp = _wit_points(want), _wit_points(got)
            if len(wp) < 2 or len(gp) < 2:
                return False
            dw = float(geo.vincenty_m(wp[0][0], wp[0][1],
                                      wp[1][0], wp[1][1])[0])
            dg = float(geo.vincenty_m(gp[0][0], gp[0][1],
                                      gp[1][0], gp[1][1])[0])
            return abs(dw - dg) <= 1e-6
        if not isinstance(b, geo.Geometry):
            return False
        df = planar_distf(b)
        wp, gp = _wit_points(want), _wit_points(got)
        if not wp or not gp:
            return False
        dw = df(wp[0][:2])
        dg = df(gp[0][:2])
        return abs(dw - dg) <= 1e-9
    except Exception:
        return False


def test_56_more_suite():
    cases = json.load(open(GOLD))
    assert len(cases) > 420
    fails, skipped, ran, ties = [], 0, 0, 0
    for i, (fam, a_tok, b_tok, digits, want) in enumerate(cases):
        try:
            got = run_case(fam, a_tok, b_tok, digits)
        except Skip:
            skipped += 1
            continue
        ran += 1
        if got != want:
            if _tie_ok(fam, a_tok, b_tok, want, got):
                ties += 1
                continue
            fails.append((i, fam, a_tok[:40], (b_tok or "")[:30],
                          want[:60], (got or "")[:60]))
    assert not fails, (len(fails), fails[:10])
    # r5: the geography NAI/ShortestLine skips are gone — every case
    # runs (BestSRID UTM pipeline in geog.py)
    assert skipped == 0 and ran == len(cases), (ran, skipped)
    assert ties <= 20, ties
