"""DE-9IM `relate` / `relate_pattern` for the geometry kinds temporal
trajectories produce — SURVEY §2.9.

Reference: `point/src/tpoint_spatialrels.c:1276-1423` delegates to
PostGIS/GEOS ``relate_full`` / ``relate_pattern`` on the trajectory
geometry (`:130-138`); the generic dispatcher `:252-283` passes the
trajectory FIRST for both argument orders, so
``relate(geom, tpoint) == relate(tpoint, geom) == relate(traj, geom)``
(verified against `66_tpoint_spatialrels.test.out:6401-6520`).

Supported kind pairs: {Point, MultiPoint, LineString, MultiLineString}
× {Point, MultiPoint, LineString, MultiLineString, Polygon,
MultiPolygon} plus transposes — everything a tpoint trajectory can be
against the geometry operands the reference's suites use.  Mixed
point+line trajectory collections raise, matching PostGIS
("Relate Operation called with a LWGEOMCOLLECTION").

Matrix order: [II, IB, IE, BI, BB, BE, EI, EB, EE] with dims F/0/1/2.
"""

from __future__ import annotations

import numpy as np

from . import geo

_POINTY = ("Point", "MultiPoint")
_LINEY = ("LineString", "MultiLineString")
_AREAL = ("Polygon", "MultiPolygon")


def _pts_of(g: geo.Geometry) -> np.ndarray:
    return np.unique(np.vstack(g.parts), axis=0)


def _lines_of(g: geo.Geometry) -> list[np.ndarray]:
    return [p for p in g.parts]


def _boundary_points(lines: list[np.ndarray]) -> np.ndarray:
    """Mod-2 boundary of a line collection: endpoints with odd
    incidence (a closed ring has an empty boundary)."""
    ends = []
    for ln in lines:
        if len(ln) < 2:
            continue
        ends.append(tuple(ln[0]))
        ends.append(tuple(ln[-1]))
    if not ends:
        return np.empty((0, 2))
    uniq: dict[tuple, int] = {}
    for e in ends:
        uniq[e] = uniq.get(e, 0) + 1
    odd = [e for e, c in uniq.items() if c % 2 == 1]
    return np.array(odd) if odd else np.empty((0, 2))


def _on_lines(q: np.ndarray, lines: list[np.ndarray]) -> bool:
    for ln in lines:
        for i in range(len(ln) - 1):
            if geo._on_segment(q[0], q[1], ln[i, 0], ln[i, 1],
                               ln[i + 1, 0], ln[i + 1, 1]):
                return True
        if len(ln) == 1 and np.all(ln[0] == q):
            return True
    return False


def _in_ptset(q: np.ndarray, pts: np.ndarray) -> bool:
    return bool((pts == q).all(axis=1).any()) if len(pts) else False


def _transpose(m: str) -> str:
    idx = [0, 3, 6, 1, 4, 7, 2, 5, 8]
    return "".join(m[i] for i in idx)


# ---------------------------------------------------------------------------
# kind-pair kernels (A rows, B columns)
# ---------------------------------------------------------------------------

def _pp(pa: np.ndarray, pb: np.ndarray) -> str:
    shared = any(_in_ptset(q, pb) for q in pa)
    a_only = any(not _in_ptset(q, pb) for q in pa)
    b_only = any(not _in_ptset(q, pa) for q in pb)
    return ("0" if shared else "F") + "F" + ("0" if a_only else "F") \
        + "FFF" + ("0" if b_only else "F") + "F2"


def _lp(lines: list[np.ndarray], pb: np.ndarray) -> str:
    """A = line collection, B = point set."""
    bnd = _boundary_points(lines)
    on_int = on_bnd = out = False
    for q in pb:
        if _in_ptset(q, bnd):
            on_bnd = True
        elif _on_lines(q, lines):
            on_int = True
        else:
            out = True
    be = "F"
    if len(bnd) and any(not _in_ptset(e, pb) for e in bnd):
        be = "0"
    return ("0" if on_int else "F") + "F1" \
        + ("0" if on_bnd else "F") + "F" + be \
        + ("0" if out else "F") + "F2"


def _pa(pa: np.ndarray, g: geo.Geometry) -> str:
    """A = point set, B = polygon."""
    inside = on_bnd = out = False
    for q in pa:
        on_ring = False
        for ring, _ in g.rings():
            for i in range(len(ring) - 1):
                if geo._on_segment(q[0], q[1], ring[i, 0], ring[i, 1],
                                   ring[i + 1, 0], ring[i + 1, 1]):
                    on_ring = True
                    break
            if on_ring:
                break
        if on_ring:
            on_bnd = True
        elif geo.points_in_polygon(q[0:1], q[1:2], g)[0]:
            inside = True
        else:
            out = True
    return ("0" if inside else "F") + ("0" if on_bnd else "F") \
        + ("0" if out else "F") + "FFF" + "212"


def _seg_pair(p0, p1, q0, q1):
    """Classify one segment pair: ('overlap', length) for a positive
    collinear overlap, ('point', pt) for a single intersection, None."""
    d = p1 - p0
    e = q1 - q0
    denom = d[0] * e[1] - d[1] * e[0]
    w = q0 - p0
    if denom == 0.0:
        # parallel: collinear?
        if abs(w[0] * d[1] - w[1] * d[0]) > 1e-9 * (1 + abs(d).max()):
            return None
        L2 = float(np.dot(d, d))
        if L2 == 0.0:
            return None
        r0 = float(np.dot(q0 - p0, d) / L2)
        r1 = float(np.dot(q1 - p0, d) / L2)
        lo, hi = max(0.0, min(r0, r1)), min(1.0, max(r0, r1))
        if hi - lo > 1e-12:
            a = p0 + d * lo
            b = p0 + d * hi
            return ("overlap", (a, b))
        if hi == lo and 0.0 <= lo <= 1.0:
            return ("point", p0 + d * lo)
        return None
    r = (w[0] * e[1] - w[1] * e[0]) / denom
    s = (w[0] * d[1] - w[1] * d[0]) / denom
    if -1e-12 <= r <= 1 + 1e-12 and -1e-12 <= s <= 1 + 1e-12:
        return ("point", p0 + d * r)
    return None


def _cover_len(lines_a: list[np.ndarray], lines_b: list[np.ndarray]) -> float:
    """Total length of A covered by collinear overlap with B."""
    total = 0.0
    for la in lines_a:
        for i in range(len(la) - 1):
            for lb in lines_b:
                for j in range(len(lb) - 1):
                    got = _seg_pair(la[i], la[i + 1], lb[j], lb[j + 1])
                    if got and got[0] == "overlap":
                        a, b = got[1]
                        total += float(np.sqrt(((b - a) ** 2).sum()))
    return total


def _total_len(lines: list[np.ndarray]) -> float:
    return float(sum(np.sqrt((np.diff(ln, axis=0) ** 2).sum(axis=1)).sum()
                     for ln in lines if len(ln) > 1))


def _ll(la: list[np.ndarray], lb: list[np.ndarray]) -> str:
    bnd_a, bnd_b = _boundary_points(la), _boundary_points(lb)

    def interior(q, lines, bnd):
        return _on_lines(q, lines) and not _in_ptset(q, bnd)

    overlap = False
    pt_int = False
    for sa in la:
        for i in range(len(sa) - 1):
            for sb in lb:
                for j in range(len(sb) - 1):
                    got = _seg_pair(sa[i], sa[i + 1], sb[j], sb[j + 1])
                    if got is None:
                        continue
                    if got[0] == "overlap":
                        overlap = True
                    else:
                        q = got[1]
                        if interior(q, la, bnd_a) and interior(q, lb, bnd_b):
                            pt_int = True
    ii = "1" if overlap else ("0" if pt_int else "F")
    ib = "0" if any(interior(q, la, bnd_a) for q in bnd_b) else "F"
    cov_a = _cover_len(la, lb) >= _total_len(la) - 1e-9
    ie = "F" if cov_a else "1"
    bi = "0" if any(interior(q, lb, bnd_b) for q in bnd_a) else "F"
    bb = "0" if any(_in_ptset(q, bnd_b) for q in bnd_a) else "F"
    be = "0" if any(not _on_lines(q, lb) for q in bnd_a) else "F"
    cov_b = _cover_len(lb, la) >= _total_len(lb) - 1e-9
    ei = "F" if cov_b else "1"
    eb = "0" if any(not _on_lines(q, la) for q in bnd_b) else "F"
    return ii + ib + ie + bi + bb + be + ei + eb + "2"


def _la(lines: list[np.ndarray], g: geo.Geometry) -> str:
    """A = line collection, B = polygon."""
    from .types import Period  # noqa: F401 (doc parity)
    bnd = _boundary_points(lines)
    ring_lines = [r for r, _ in g.rings()]
    # classify sampled sub-pieces of A between ring crossings
    ii = ie = False
    ib_dim = "F"
    if _cover_len(lines, ring_lines) > 1e-12:
        ib_dim = "1"
    touch_pt = False
    for ln in lines:
        for i in range(len(ln) - 1):
            p0, p1 = ln[i], ln[i + 1]
            rs = [0.0, 1.0]
            for rl in ring_lines:
                for j in range(len(rl) - 1):
                    got = _seg_pair(p0, p1, rl[j], rl[j + 1])
                    if got and got[0] == "point":
                        d = p1 - p0
                        L2 = float(np.dot(d, d))
                        if L2 > 0:
                            r = float(np.dot(got[1] - p0, d) / L2)
                            if 0.0 <= r <= 1.0:
                                rs.append(r)
                                touch_pt = True
            rs = sorted(set(rs))
            for a, b in zip(rs[:-1], rs[1:]):
                if b - a <= 1e-12:
                    continue
                mid = p0 + (p1 - p0) * ((a + b) / 2.0)
                on_ring = any(
                    geo._on_segment(mid[0], mid[1], rl[j, 0], rl[j, 1],
                                    rl[j + 1, 0], rl[j + 1, 1])
                    for rl in ring_lines for j in range(len(rl) - 1))
                if on_ring:
                    continue  # counted by ib_dim
                if geo.points_in_polygon(mid[0:1], mid[1:2], g)[0]:
                    ii = True
                else:
                    ie = True
    if ib_dim == "F" and touch_pt:
        ib_dim = "0"
    bi = bb = be = "F"
    for q in bnd:
        on_ring = any(
            geo._on_segment(q[0], q[1], rl[j, 0], rl[j, 1],
                            rl[j + 1, 0], rl[j + 1, 1])
            for rl in ring_lines for j in range(len(rl) - 1))
        if on_ring:
            bb = "0"
        elif geo.points_in_polygon(q[0:1], q[1:2], g)[0]:
            bi = "0"
        else:
            be = "0"
    return ("1" if ii else "F") + ib_dim + ("1" if ie else "F") \
        + bi + bb + be + "21" + "2"


def _rep_point(g: geo.Geometry):
    """A representative INTERIOR point (point-on-surface light): a
    horizontal scanline midway between two distinct vertex ys, paired
    even-odd crossings give interior intervals (holes respected)."""
    ys = np.unique(np.concatenate([r[:, 1] for r, _ in g.rings()]))
    for k in range(len(ys) - 1):
        y = (ys[k] + ys[k + 1]) / 2.0
        xs = []
        for ring, _ in g.rings():
            for i in range(len(ring) - 1):
                y0, y1 = ring[i, 1], ring[i + 1, 1]
                if (y0 > y) != (y1 > y):
                    xs.append(ring[i, 0] + (y - y0) / (y1 - y0)
                              * (ring[i + 1, 0] - ring[i, 0]))
        xs = sorted(xs)
        for a, b in zip(xs[0::2], xs[1::2]):
            if b - a > 1e-12:
                return np.array([(a + b) / 2.0, y])
    return None


def _strictly_inside(q, g: geo.Geometry, rings) -> bool:
    return (bool(geo.points_in_polygon(q[0:1], q[1:2], g)[0])
            and not _on_lines(q, rings))


def _aa(ga: geo.Geometry, gb: geo.Geometry) -> str:
    """A = polygon, B = polygon (areal × areal).

    Each boundary edge is split at every intersection with the other
    boundary; between consecutive split points an edge stays on one
    side, so classifying the sub-segment MIDPOINT (strictly inside /
    strictly outside / collinear-on-boundary) is exact.  A boundary
    sub-segment strictly inside the other polygon witnesses interior
    overlap on one side and exterior leakage on the other (the
    boundary separates locally); representative interior points
    resolve the residual faces where the boundaries coincide (equal
    polygons, hole-filling)."""
    rings_a = [r for r, _ in ga.rings()]
    rings_b = [r for r, _ in gb.rings()]

    def classify(rings_x, g_other, rings_other):
        inside = outside = touch = False
        for ln in rings_x:
            for i in range(len(ln) - 1):
                p0, p1 = ln[i], ln[i + 1]
                rs = [0.0, 1.0]
                for rl in rings_other:
                    for j in range(len(rl) - 1):
                        got = _seg_pair(p0, p1, rl[j], rl[j + 1])
                        if got and got[0] == "point":
                            d = p1 - p0
                            L2 = float(np.dot(d, d))
                            if L2 > 0:
                                r = float(np.dot(got[1] - p0, d) / L2)
                                if 0.0 <= r <= 1.0:
                                    rs.append(r)
                                    touch = True
                for a, b in zip(*(lambda v: (v[:-1], v[1:]))(
                        sorted(set(rs)))):
                    if b - a <= 1e-12:
                        continue
                    mid = p0 + (p1 - p0) * ((a + b) / 2.0)
                    if _on_lines(mid, rings_other):
                        continue  # collinear: boundary∩boundary dim 1
                    if geo.points_in_polygon(mid[0:1], mid[1:2],
                                             g_other)[0]:
                        inside = True
                    else:
                        outside = True
        return inside, outside, touch

    a_in, a_out, touch_a = classify(rings_a, gb, rings_b)
    b_in, b_out, touch_b = classify(rings_b, ga, rings_a)
    col = _cover_len(rings_a, rings_b) > 1e-12
    rep_a, rep_b = _rep_point(ga), _rep_point(gb)
    a_rep_in_b = rep_a is not None and _strictly_inside(rep_a, gb, rings_b)
    a_rep_out_b = rep_a is not None and not (
        bool(geo.points_in_polygon(rep_a[0:1], rep_a[1:2], gb)[0])
        or _on_lines(rep_a, rings_b))
    b_rep_in_a = rep_b is not None and _strictly_inside(rep_b, ga, rings_a)
    b_rep_out_a = rep_b is not None and not (
        bool(geo.points_in_polygon(rep_b[0:1], rep_b[1:2], ga)[0])
        or _on_lines(rep_b, rings_a))

    ii = "2" if (a_in or b_in or a_rep_in_b or b_rep_in_a) else "F"
    ib = "1" if b_in else "F"
    ie = "2" if (a_out or b_in or a_rep_out_b) else "F"
    bi = "1" if a_in else "F"
    bb = "1" if col else ("0" if (touch_a or touch_b) else "F")
    be = "1" if a_out else "F"
    ei = "2" if (b_out or a_in or b_rep_out_a) else "F"
    eb = "1" if b_out else "F"
    return ii + ib + ie + bi + bb + be + ei + eb + "2"


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _force2d(g: geo.Geometry) -> geo.Geometry:
    """GEOS relate is 2D: project any z away (the reference's 3D
    relate goldens show xy-only matrices)."""
    if g.is_empty or g.parts[0].shape[1] == 2:
        return g
    return geo.Geometry(g.kind, [p[:, :2] for p in g.parts], g.srid)


def relate_geoms(a: geo.Geometry, b: geo.Geometry) -> str | None:
    """DE-9IM matrix string of two geometries; None if either is empty
    (the reference's NULL convention)."""
    if a.is_empty or b.is_empty:
        return None
    a, b = _force2d(a), _force2d(b)
    ka = "P" if a.kind in _POINTY else "L" if a.kind in _LINEY else "A"
    kb = "P" if b.kind in _POINTY else "L" if b.kind in _LINEY else "A"
    if ka == "P" and kb == "P":
        return _pp(_pts_of(a), _pts_of(b))
    if ka == "L" and kb == "P":
        return _lp(_lines_of(a), _pts_of(b))
    if ka == "P" and kb == "L":
        return _transpose(_lp(_lines_of(b), _pts_of(a)))
    if ka == "L" and kb == "L":
        return _ll(_lines_of(a), _lines_of(b))
    if ka == "P" and kb == "A":
        return _pa(_pts_of(a), b)
    if ka == "A" and kb == "P":
        return _transpose(_pa(_pts_of(b), a))
    if ka == "L" and kb == "A":
        return _la(_lines_of(a), b)
    if ka == "A" and kb == "L":
        return _transpose(_la(_lines_of(b), a))
    if ka == "A" and kb == "A":
        return _aa(a, b)
    raise NotImplementedError(f"relate between {ka} and {kb} operands")


def matches_pattern(matrix: str, pattern: str) -> bool:
    """OGC DE-9IM pattern match: T = non-F, F = F, 0/1/2 exact, * any."""
    if len(pattern) != 9:
        raise ValueError("relate_pattern requires a 9-character pattern")
    for m, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p in "tT":
            if m == "F":
                return False
        elif p in "fF":
            if m != "F":
                return False
        elif m != p:
            return False
    return True
