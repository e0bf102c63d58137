"""Spatial functions on temporal points — SURVEY §2.8/§2.9.

Re-implements `point/src/tpoint_spatialfuncs.c` semantics on the
numpy value model:

- ``trajectory`` (`:513-885`), ``length``/``cumulative_length``
  (`:887-1070`), ``speed`` (`:1073-1181`, stepwise dist/second),
  ``azimuth`` (`:1520-1595`, stepwise atan2(dx, dy) radians),
  ``twcentroid`` (`:1184-1445`, time-weighted trapezoid integral)
- ``at_geometry``/``minus_geometry`` (`:1597-2100`): exact
  entry/exit timestamps of a linear tpoint against a polygon —
  segment×edge crossing parameters + midpoint PIP classification
- ``nearest_approach_instant``/``distance``/``shortest_line``
  (`:2107-2760`): per-edge closed-form minimizers
- ``tintersects``/``tdwithin`` (`point/src/tpoint_tempspatialrels.c`,
  quadratic solver at `:952-1098`) → stepwise tbool

Everything is float64 numpy, deterministic, no GEOS.
"""

from __future__ import annotations

import numpy as np

from . import geo
from .lifting import synchronize, tdistance, turn_distance
from .restrict import at_periodset, complement_periods
from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, EPSILON,
                    Period, Seq, Temporal, normalize_periods)


# ---------------------------------------------------------------------------
# trajectory + measures
# ---------------------------------------------------------------------------

def trajectory(tv: Temporal) -> geo.Geometry:
    """Union of positions: Point / MultiPoint / LineString pieces
    (`tpoint_spatialfuncs.c:513-885`).  Returns a Geometry whose kind
    is Point (single), LineString (one linear seq) or MultiPoint
    (discrete / stepwise)."""
    if tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
        # first-appearance dedup — the reference keeps encounter order
        # (tpointi_trajectory), not sorted order
        _, idx = np.unique(tv.values, axis=0, return_index=True)
        pts = tv.values[np.sort(idx)]
        if len(pts) == 1:
            return geo.Geometry("Point", [pts])
        return geo.Geometry("MultiPoint", [pts[i:i + 1] for i in range(len(pts))])
    lines = []
    for s in tv.seqs:
        coords = s.values
        keep = np.ones(len(coords), dtype=bool)
        keep[1:] = (np.abs(np.diff(coords, axis=0)) > 0).any(axis=1)
        coords = coords[keep]
        lines.append(coords)
    if len(lines) == 1:
        if len(lines[0]) == 1:
            return geo.Geometry("Point", [lines[0]])
        return geo.Geometry("LineString", [lines[0]])
    return geo.Geometry("MultiLineString", lines)


def length(tv: Temporal) -> float:
    """Planar length traversed; 0 for discrete/stepwise
    (`tpoint_spatialfuncs.c:887-937`)."""
    if tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
        return 0.0
    total = 0.0
    for s in tv.seqs:
        d = np.diff(s.values, axis=0)
        total += float(np.sqrt((d * d).sum(axis=1)).sum())
    return total


def cumulative_length(tv: Temporal) -> Temporal:
    """tfloat of running length (`:942-1070`); inherits the input's
    interpolation — stepwise motion never accumulates length, so a
    step tpoint yields a step-constant profile with normalized knots
    (56-suite goldens)."""
    from .types import normalize_instants
    seqs = []
    run = 0.0
    for s in tv.seqs:
        if len(s.times) == 1 or not tv.linear:
            cum = np.full(len(s.times), run)
        else:
            d = np.sqrt((np.diff(s.values, axis=0) ** 2).sum(axis=1))
            cum = run + np.concatenate([[0.0], np.cumsum(d)])
            run = float(cum[-1])
        if tv.linear:
            # keep every knot: the profile's interior knots mark the
            # input's vertices even when collinear in time
            ts2, v2 = s.times.copy(), cum[:, None]
        else:
            ts2, v2 = normalize_instants(s.times.copy(), cum[:, None],
                                         False)
        seqs.append(Seq(ts2, v2, s.lower_inc, s.upper_inc))
    return Temporal(tv.duration, seqs, tv.linear, tv.srid)


def speed(tv: Temporal) -> Temporal | None:
    """Stepwise tfloat of per-segment speed in units/second
    (`:1073-1181`); undefined for discrete durations."""
    if tv.duration in (INSTANT, INSTANTSET):
        return None
    seqs = []
    for s in tv.seqs:
        if len(s.times) == 1:
            seqs.append(Seq(s.times.copy(), np.zeros((1, 1)),
                            s.lower_inc, s.upper_inc))
            continue
        if not tv.linear:
            # stepwise motion has no continuous displacement: the
            # speed is 0 everywhere (`tpoint_spatialfuncs.c:1073`,
            # 56-suite goldens)
            d = np.zeros(len(s.times) - 1)
        else:
            d = np.sqrt((np.diff(s.values, axis=0) ** 2).sum(axis=1))
        dt = np.diff(s.times) / 1e6
        sp = d / dt
        vals = np.concatenate([sp, sp[-1:]])[:, None]
        from .types import normalize_instants
        ts2, v2 = normalize_instants(s.times, vals, linear=False)
        # keep the final instant value equal to the last segment speed
        seqs.append(Seq(ts2, v2, s.lower_inc, s.upper_inc))
    return Temporal(tv.duration if len(seqs) > 1 else tv.duration,
                    seqs, False, tv.srid)


def azimuth(tv: Temporal) -> Temporal | None:
    """Stepwise tfloat of segment bearings, radians clockwise from
    north = atan2(dx, dy) (`:1520-1595`); zero-length segments are
    undefined → result splits into a SequenceSet.  NULL for discrete
    AND stepwise inputs (56-suite: Interp=Stepwise azimuth is empty —
    stepwise motion has no direction)."""
    if tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
        return None
    out = []
    for s in tv.seqs:
        n = len(s.times)
        if n == 1:
            continue
        d = np.diff(s.values, axis=0)
        az = np.arctan2(d[:, 0], d[:, 1])
        az = np.where(az < 0, az + 2 * np.pi, az)
        moving = (np.abs(d) > 0).any(axis=1)
        # contiguous runs of moving segments become one step sequence
        i = 0
        while i < n - 1:
            if not moving[i]:
                i += 1
                continue
            j = i
            while j < n - 1 and moving[j]:
                j += 1
            ts = s.times[i:j + 1]
            vals = np.concatenate([az[i:j], az[j - 1:j]])[:, None]
            lo_inc = s.lower_inc if i == 0 else True
            # a run that stops BEFORE the final knot closes at the
            # instant motion ends (56-suite: '[45@d1, 45@d2]' with a
            # stationary tail) — only the sequence end inherits the
            # input's bound
            hi_inc = s.upper_inc if j == n - 1 else True
            out.append(Seq(ts, vals, lo_inc, hi_inc))
            i = j
    if not out:
        return None
    return Temporal(SEQUENCESET, out, False, tv.srid)


def twcentroid(tv: Temporal) -> np.ndarray:
    """Time-weighted centroid point (`:1184-1445`): trapezoid integral
    of each coordinate / total duration; plain average for discrete."""
    if tv.duration in (INSTANT, INSTANTSET) or tv.duration_us() == 0:
        return tv.values.mean(axis=0)
    num = np.zeros(tv.dim)
    den = 0.0
    for s in tv.seqs:
        if len(s.times) == 1:
            continue
        dt = (np.diff(s.times) / 1e6).astype(np.float64)
        if tv.linear:
            mid = (s.values[:-1] + s.values[1:]) / 2.0
        else:
            mid = s.values[:-1]
        num += (mid * dt[:, None]).sum(axis=0)
        den += float(dt.sum())
    return num / den


def twavg(tv: Temporal) -> float:
    """Time-weighted average of a tnumber (`src/temporal.c:3236-3256`)."""
    assert tv.dim == 1
    return float(twcentroid(tv)[0])


# ---------------------------------------------------------------------------
# at/minus geometry (the PIP refine kernel)
# ---------------------------------------------------------------------------

def _segment_polygon_entries(p0: np.ndarray, p1: np.ndarray,
                             g: geo.Geometry) -> list[float]:
    """Crossing parameters r ∈ (0,1) where segment p0→p1 crosses any
    polygon boundary edge (parametric line-line intersection)."""
    rs: list[float] = []
    d = p1 - p0
    for ring, _ in g.rings():
        if len(ring) < 2:
            continue
        e0 = ring[:-1]
        e1 = ring[1:]
        ed = e1 - e0
        denom = d[0] * ed[:, 1] - d[1] * ed[:, 0]
        ok = denom != 0.0
        w = e0 - p0
        r = np.where(ok, (w[:, 0] * ed[:, 1] - w[:, 1] * ed[:, 0])
                     / np.where(ok, denom, 1.0), -1.0)
        srel = np.where(ok, (w[:, 0] * d[1] - w[:, 1] * d[0])
                        / np.where(ok, denom, 1.0), -1.0)
        hit = ok & (r > 0.0) & (r < 1.0) & (srel >= 0.0) & (srel <= 1.0)
        rs.extend(r[hit].tolist())
    return sorted(set(rs))


def _line_segments(g: geo.Geometry):
    parts = g.parts if g.kind == "MultiLineString" else [g.parts[0]]
    for coords in parts:
        for i in range(len(coords) - 1):
            yield coords[i], coords[i + 1]


def _on_line(pts: np.ndarray, g: geo.Geometry) -> np.ndarray:
    best = np.full(len(pts), np.inf)
    for a, b in _line_segments(g):
        d, _ = geo.point_segment_dist(pts[:, 0], pts[:, 1],
                                      a[0], a[1], b[0], b[1])
        best = np.minimum(best, d)
    return best <= geo.BOUNDARY_EPS


def _line_geometry_periods(tv: Temporal, g: geo.Geometry) -> list[Period]:
    """at_geometry against LINE geometries: the position is "inside"
    exactly while ON the line — knot instants on the line, collinear
    along-line runs (midpoint test), and interior crossing instants
    (`tpoint_spatialfuncs.c:1627-1740` line branch)."""
    out: list[Period] = []
    for s in tv.seqs:
        n = len(s.times)
        on = _on_line(s.values, g)
        if n == 1 or tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
            for i in range(n):
                if on[i]:
                    t = int(s.times[i])
                    out.append(Period(t, t))
            if not tv.linear and n > 1:
                for i in range(n - 1):
                    if on[i]:
                        out.append(Period(int(s.times[i]),
                                          int(s.times[i + 1]), True, False))
            continue
        for i in range(n - 1):
            p0, p1 = s.values[i], s.values[i + 1]
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            mid = (p0 + p1) / 2.0
            if on[i] and on[i + 1] and bool(_on_line(mid[None, :], g)[0]):
                out.append(Period(t0, t1))
                continue
            if on[i]:
                out.append(Period(t0, t0))
            if on[i + 1]:
                out.append(Period(t1, t1))
            # collinear PARTIAL overlap: the movement segment lies
            # along a line segment but extends past it (or contains
            # it), so the endpoint/midpoint test above sees at most
            # one endpoint on the line.  Clip the line segment onto
            # the movement parameter and emit the overlap run
            # (reference tpointseq_at_geometry1 computes the true
            # intersection, `tpoint_spatialfuncs.c:1627-1740`).
            d = p1 - p0
            dlen = float(np.hypot(d[0], d[1]))
            if dlen > 0.0:
                for a, b in _line_segments(g):
                    da = abs(d[0] * (a[1] - p0[1])
                             - d[1] * (a[0] - p0[0])) / dlen
                    db = abs(d[0] * (b[1] - p0[1])
                             - d[1] * (b[0] - p0[0])) / dlen
                    if da > geo.BOUNDARY_EPS or db > geo.BOUNDARY_EPS:
                        continue
                    dd = float(d[0] * d[0] + d[1] * d[1])
                    ra = float((a[0] - p0[0]) * d[0]
                               + (a[1] - p0[1]) * d[1]) / dd
                    rb = float((b[0] - p0[0]) * d[0]
                               + (b[1] - p0[1]) * d[1]) / dd
                    rlo = max(min(ra, rb), 0.0)
                    rhi = min(max(ra, rb), 1.0)
                    if rlo > rhi:
                        continue
                    ta = int(round(t0 + (t1 - t0) * rlo))
                    tb = int(round(t0 + (t1 - t0) * rhi))
                    out.append(Period(ta, tb))
            for a, b in _line_segments(g):
                hit = geo.segments_cross(p0[0], p0[1], p1[0], p1[1],
                                         a[0], a[1], b[0], b[1])
                if np.any(hit):
                    d0 = (b[0] - a[0]) * (p0[1] - a[1]) \
                        - (b[1] - a[1]) * (p0[0] - a[0])
                    d1 = (b[0] - a[0]) * (p1[1] - a[1]) \
                        - (b[1] - a[1]) * (p1[0] - a[0])
                    if d0 != d1:
                        r = d0 / (d0 - d1)
                        tc = int(round(t0 + (t1 - t0) * r))
                        if t0 < tc < t1:
                            out.append(Period(tc, tc))
    return normalize_periods(out)


def at_geometry_periods(tv: Temporal, g: geo.Geometry) -> list[Period]:
    """Time periods during which the tpoint is inside/on the geometry
    (core of ``tpointseq_at_geometry1``,
    `tpoint_spatialfuncs.c:1627-1740`)."""
    if g.is_empty:
        return []
    if g.kind in ("LineString", "MultiLineString"):
        return _line_geometry_periods(tv, g)
    periods: list[Period] = []
    discrete = tv.duration in (INSTANT, INSTANTSET) or not tv.linear
    for s in tv.seqs:
        n = len(s.times)
        if discrete or n == 1:
            inside = geo.points_in_polygon(s.values[:, 0], s.values[:, 1], g)
            if not tv.linear and n > 1:
                # stepwise: constant position on [t_i, t_{i+1})
                for i in range(n - 1):
                    if inside[i]:
                        periods.append(Period(int(s.times[i]),
                                              int(s.times[i + 1]), True, False))
                if inside[-1] and s.upper_inc:
                    t = int(s.times[-1])
                    periods.append(Period(t, t))
            else:
                for i in np.nonzero(inside)[0]:
                    t = int(s.times[i])
                    periods.append(Period(t, t))
            continue
        # vectorized across ALL segments of the sequence: same float
        # operations as the per-segment loop (line-line crossing
        # formula, midpoint test, banker's-rounded µs bounds), but one
        # numpy pass + a single points_in_polygon call per sequence —
        # ~15× faster on many-segment trajectories
        v0, v1 = s.values[:-1, :2], s.values[1:, :2]
        d = v1 - v0
        nseg = n - 1
        seg_hits: list[np.ndarray] = []
        r_hits: list[np.ndarray] = []
        for ring, _ in g.rings():
            if len(ring) < 2:
                continue
            e0, e1 = ring[:-1], ring[1:]
            ed = e1 - e0
            denom = (d[:, 0, None] * ed[None, :, 1]
                     - d[:, 1, None] * ed[None, :, 0])
            ok = denom != 0.0
            safe = np.where(ok, denom, 1.0)
            w0 = e0[None, :, 0] - v0[:, 0, None]
            w1 = e0[None, :, 1] - v0[:, 1, None]
            r = np.where(ok, (w0 * ed[None, :, 1]
                              - w1 * ed[None, :, 0]) / safe, -1.0)
            srel = np.where(ok, (w0 * d[:, 1, None]
                                 - w1 * d[:, 0, None]) / safe, -1.0)
            hit = ok & (r > 0.0) & (r < 1.0) & (srel >= 0.0) & (srel <= 1.0)
            ii, jj = np.nonzero(hit)
            seg_hits.append(ii)
            r_hits.append(r[ii, jj])
        if seg_hits:
            si = np.concatenate(seg_hits)
            rv = np.concatenate(r_hits)
        else:
            si = np.empty(0, dtype=np.int64)
            rv = np.empty(0)
        # exact-dedupe (segment, r) and sort within each segment
        order = np.lexsort((rv, si))
        si, rv = si[order], rv[order]
        if len(si):
            keep = np.ones(len(si), dtype=bool)
            keep[1:] = (si[1:] != si[:-1]) | (rv[1:] != rv[:-1])
            si, rv = si[keep], rv[keep]
        counts = np.bincount(si, minlength=nseg)
        total = counts + 1  # pieces per segment
        offsets = np.concatenate([[0], np.cumsum(total)])
        npieces = int(offsets[-1])
        A = np.zeros(npieces)
        B = np.ones(npieces)
        if len(si):
            pos = np.arange(len(si)) - np.concatenate(
                [[0], np.cumsum(counts)])[si]
            A[offsets[si] + pos + 1] = rv
            B[offsets[si] + pos] = rv
        seg_of = np.repeat(np.arange(nseg), total)
        mids = v0[seg_of] + d[seg_of] * ((A + B) / 2.0)[:, None]
        inside = geo.points_in_polygon(mids[:, 0], mids[:, 1], g)
        t0s = s.times[:-1].astype(np.float64)[seg_of]
        dts = (s.times[1:] - s.times[:-1]).astype(np.float64)[seg_of]
        ta = np.rint(t0s + dts * A).astype(np.int64)
        tb = np.rint(t0s + dts * B).astype(np.int64)
        for k in np.nonzero(inside)[0]:
            periods.append(Period(int(ta[k]), int(tb[k])))
    return normalize_periods(periods)


def at_geometry(tv: Temporal, g: geo.Geometry) -> Temporal | None:
    ps = at_geometry_periods(tv, g)
    if not ps:
        return None
    return at_periodset(tv, ps, force_set=True)


def minus_geometry(tv: Temporal, g: geo.Geometry) -> Temporal | None:
    ps = at_geometry_periods(tv, g)
    if not ps:
        return tv
    return at_periodset(tv, complement_periods(ps), force_set=True)


def tintersects(tv: Temporal, g: geo.Geometry) -> Temporal | None:
    """tintersects(tpoint, geometry) → stepwise tbool
    (`tpoint_tempspatialrels.c:1456+`): true on at_geometry periods,
    false elsewhere in the domain."""
    if g.is_empty:
        return None
    true_ps = at_geometry_periods(tv, g)
    return _tbool_from_periods(tv, true_ps)


def _tbool_from_periods(tv: Temporal, true_ps: list[Period]) -> Temporal:
    from .lifting import assemble_step_atoms
    dom = tv.get_time()
    pieces: list[tuple[Period, float]] = []
    for p in true_ps:
        for d in dom:
            inter = p.intersection(d)
            if inter is not None:
                pieces.append((inter, 1.0))
    # false = domain minus true periods
    comp = complement_periods(true_ps) if true_ps else \
        [Period(-2**62, 2**62)]
    for c in comp:
        for d in dom:
            inter = c.intersection(d)
            if inter is not None:
                pieces.append((inter, 0.0))
    # decompose pieces into step atoms (knots at closed bounds + open
    # interiors) and reuse the shared _cross assembly so output forms
    # match the reference (isolated instants absorb into run ends)
    atoms: list[tuple] = []
    for p, v in pieces:
        if p.lower == p.upper:
            atoms.append((p.lower, p.lower, True, True, v))
            continue
        if p.lower_inc:
            atoms.append((p.lower, p.lower, True, True, v))
        atoms.append((p.lower, p.upper, False, False, v))
        if p.upper_inc:
            atoms.append((p.upper, p.upper, True, True, v))
    atoms.sort(key=lambda at: (at[0], at[1]))
    seqs = assemble_step_atoms(atoms)
    dur = SEQUENCESET if tv.duration in (SEQUENCE, SEQUENCESET) \
        else (INSTANT if tv.duration == INSTANT else INSTANTSET)
    return Temporal(dur, seqs, False, tv.srid, True)


def trelate(a, b, pattern: str | None = None):
    """Temporal DE-9IM — trelate(geo, tpoint) / trelate(tpoint, geo) /
    trelate(tpoint, tpoint) → ttext, or tbool with a pattern
    (`tpoint_tempspatialrels.c:1456-2290`, goldens
    `68_tpoint_tempspatialrels.test.out:1120+`).

    The instantaneous matrix of a moving point against a fixed
    geometry takes finitely many values (coincident / boundary /
    inside / apart), so the result is the stepwise map of the point's
    classification over time — built on the same period machinery as
    tintersects, with the value crossings of at_values/at_geometry."""
    from . import de9im
    from .restrict import at_values
    from .ttext import TText

    if isinstance(a, Temporal) and isinstance(b, Temporal):
        if pattern is None:
            # reference defect replicated verbatim: trelate_tpoint_tpoint
            # (`tpoint_tempspatialrels.c:2200-2216`) lifts geom_relate —
            # which returns a text datum — through
            # sync_tfunc2_temporal_temporal_cross with valuetypid BOOLOID,
            # so every palloc'd matrix pointer reads as boolean TRUE and
            # the DE-9IM matrix is never exposed
            return _trelate_cross_boolref(a, b)
        # per-instant relate of two points: coincident ⇔ teq
        from .everops import _sync_pair
        from .lifting import lift_comparison
        got = _sync_pair(a, b)
        if got is None:
            return None
        eq = lift_comparison("eq", got[0], got[1])
        if eq is None:
            return None
        vocab = ["FF0FFF0F2", "0FFFFFFF2"]  # apart, coincident
        tt = TText(eq, vocab)
        return _trelate_finish(tt, pattern)

    tv, g = (a, b) if isinstance(a, Temporal) else (b, a)
    geom_first = not isinstance(a, Temporal)
    if g.is_empty:
        return None
    if pattern is not None:
        return _trelate3_geo(tv, g, pattern, geom_first)
    point_g = g.kind in ("Point", "MultiPoint")
    if point_g:
        pts = np.unique(np.vstack(g.parts), axis=0)
        hit = at_values(tv, pts)
        true_ps = hit.get_time() if hit is not None else []
        # matrix when the moving point (A) coincides with one geometry
        # point: extra geometry points lie in A's exterior (EI)
        extra = len(pts) > 1
        coincide = "0FFFFF" + ("0" if extra else "F") + "F2"
        apart = "FF0FFF0F2"
        if geom_first:
            coincide = de9im._transpose(coincide)
            apart = de9im._transpose(apart)
        tb = _tbool_from_periods(tv, normalize_periods(true_ps))
        return _trelate_finish(TText(tb, [apart, coincide]), pattern)
    # polygon geometry: inside / boundary / outside (boundary at the
    # entry/exit instants; edge-sliding pieces are classified inside,
    # like the at_geometry kernel)
    inside_m, bnd_m, out_m = "0FFFFF212", "F0FFFF212", "FF0FFF212"
    if geom_first:
        inside_m = de9im._transpose(inside_m)
        bnd_m = de9im._transpose(bnd_m)
        out_m = de9im._transpose(out_m)
    vocab = [out_m, inside_m, bnd_m]
    ps = at_geometry_periods(tv, g)
    ring_lines = [r for r, _ in g.rings()]

    def on_ring(t: int) -> bool:
        p = tv.value_at(t)
        if p is None:
            return False
        return any(geo._on_segment(p[0], p[1], rl[j, 0], rl[j, 1],
                                   rl[j + 1, 0], rl[j + 1, 1])
                   for rl in ring_lines for j in range(len(rl) - 1))

    # split inside periods at boundary-contact bound instants
    code_ps: list[tuple[Period, float]] = []
    for p in ps:
        lo_b = on_ring(p.lower)
        hi_b = on_ring(p.upper)
        if p.lower == p.upper:
            code_ps.append((p, 2.0 if lo_b else 1.0))
            continue
        if lo_b:
            code_ps.append((Period(p.lower, p.lower), 2.0))
        inner = Period(p.lower, p.upper, not lo_b and p.lower_inc,
                       not hi_b and p.upper_inc)
        code_ps.append((inner if (lo_b or hi_b) else p, 1.0))
        if hi_b:
            code_ps.append((Period(p.upper, p.upper), 2.0))
    tb = _tcode_from_periods(tv, code_ps)
    return _trelate_finish(TText(tb, vocab), pattern)


def _tcode_from_periods(tv: Temporal,
                        coded: list[tuple[Period, float]]) -> Temporal:
    """Stepwise temporal over the domain of ``tv``: coded periods get
    their code, the remaining domain gets 0 (generalizes
    _tbool_from_periods to n-valued codes)."""
    from .lifting import assemble_step_atoms
    from .restrict import complement_periods
    dom = tv.get_time()
    pieces: list[tuple[Period, float]] = list(coded)
    comp = complement_periods([p for p, _ in coded]) if coded else \
        [Period(-2**62, 2**62)]
    for c in comp:
        for d in dom:
            inter = c.intersection(d)
            if inter is not None:
                pieces.append((inter, 0.0))
    atoms: list[tuple] = []
    for p, v in pieces:
        if p.lower == p.upper:
            atoms.append((p.lower, p.lower, True, True, v))
            continue
        if p.lower_inc:
            atoms.append((p.lower, p.lower, True, True, v))
        atoms.append((p.lower, p.upper, False, False, v))
        if p.upper_inc:
            atoms.append((p.upper, p.upper, True, True, v))
    atoms.sort(key=lambda at: (at[0], at[1]))
    seqs = assemble_step_atoms(atoms)
    dur = SEQUENCESET if tv.duration in (SEQUENCE, SEQUENCESET) \
        else (INSTANT if tv.duration == INSTANT else INSTANTSET)
    return Temporal(dur, seqs, False, tv.srid, True)


def _trelate_finish(tt, pattern: str | None):
    """Either the ttext itself, or the pattern-matched tbool."""
    if pattern is None:
        return tt
    from . import de9im
    from .lifting import lift_unary
    match = [1.0 if de9im.matches_pattern(w, pattern) else 0.0
             for w in tt.vocab]

    def remap(v: np.ndarray) -> np.ndarray:
        codes = np.rint(v[:, 0]).astype(int)
        return np.array([match[c] for c in codes])

    return lift_unary(remap, tt.temporal, result_linear=False,
                      result_step_default=True)


# ---------------------------------------------------------------------------
# verbatim ports of the reference trelate execution paths
# ---------------------------------------------------------------------------

def _pieces_to_tbool(pieces, duration=SEQUENCESET) -> Temporal:
    """Build a stepwise tbool from ``(times, values, lower_inc,
    upper_inc)`` pieces (values 0/1 floats, printed as 0/1 — the
    68-suite runner flips is_bool for the t/f form)."""
    seqs = [Seq(np.asarray(ts, dtype=np.int64),
                np.asarray(vs, dtype=np.float64).reshape(-1, 1), li, ui)
            for ts, vs, li, ui in pieces]
    return Temporal(duration, seqs, False, 0, True)


def _normalize_step_pieces(pieces):
    """Port of ``temporalseqarr_normalize`` (`src/temporalseq.c:470-563`)
    for STEPWISE sequences over ``(times, values, lower_inc,
    upper_inc)`` pieces.  ``values`` entries are comparable datums —
    floats for real booleans, or unique tokens to replicate the
    pointer-inequality of the BOOLOID-defect path (where only the
    value-blind exclusive-upper rule `:532-539` can ever fire)."""
    out = []
    t1, v1, li1, ui1 = pieces[0]
    for (t2, v2, li2, ui2) in pieces[1:]:
        adjacent = t1[-1] == t2[0] and (ui1 or li2)
        join = None
        if adjacent and len(t1) > 1 and len(t2) > 1 and \
                v1[-2] == v1[-1] == v2[0]:
            join = (True, True)       # stepwise constant-tail rule :499-507
        elif adjacent and not ui1:
            join = (True, False)      # value-blind exclusive-upper :532-539
        elif adjacent and v1[-1] == v2[0]:
            join = (False, True)      # equal last/first value :541-557
        if join is None:
            out.append((t1, v1, li1, ui1))
            t1, v1, li1, ui1 = t2, v2, li2, ui2
            continue
        drop_last, drop_first = join
        t1 = (t1[:-1] if drop_last else t1) + (t2[1:] if drop_first else t2)
        v1 = (v1[:-1] if drop_last else v1) + (v2[1:] if drop_first else v2)
        ui1 = ui2
    out.append((t1, v1, li1, ui1))
    return out


def _tpointseg_cross_time(t1: int, t2: int, p1, e1, p2, e2):
    """Port of tpointseq_intersect_at_timestamp
    (`src/temporalseq.c:1170-1270`): per-axis linear solve with the
    EPSILON interior clip, fraction truncated onto microseconds."""
    fracs, denums = [], []
    for ax in range(len(p1)):
        den = (e1[ax] - p1[ax]) - (e2[ax] - p2[ax])
        denums.append(den)
        if den != 0.0:
            f = (p2[ax] - p1[ax]) / den
            if f <= EPSILON or f >= 1.0 - EPSILON:
                return None
            fracs.append(f)
    if not fracs:
        return None  # parallel
    if any(abs(fracs[0] - f) > EPSILON for f in fracs[1:]):
        return None  # axes cross at different times
    return t1 + int(float(t2 - t1) * fracs[0])


def _trelate_cross_boolref(a: Temporal, b: Temporal):
    """trelate(tpoint, tpoint) without a pattern — verbatim port of the
    reference's defective execution (`tpoint_tempspatialrels.c:2200`):
    geom_relate's text results lifted as BOOLOID through
    sync_tfunc2_temporal_temporal_cross (`src/lifting.c:2434-2713`).
    Every piece value prints ``t`` (nonzero pointer) and compares
    UNEQUAL to every other (distinct pallocs), so normalization keeps
    the raw cross pieces except for the value-blind join."""
    from .everops import _sync_pair
    got = _sync_pair(a, b)
    if got is None:
        return None
    sa, sb = got
    if sa.duration in (INSTANT, INSTANTSET):
        seqs = [Seq(s.times.copy(), np.ones((len(s.times), 1)),
                    s.lower_inc, s.upper_inc) for s in sa.seqs]
        return Temporal(sa.duration, seqs, False, 0, True)

    pieces = []   # (times, lower_inc, upper_inc) — all values print t
    for s1, s2 in zip(sa.seqs, sb.seqs):
        ts, va, vb = s1.times, s1.values, s2.values
        if len(ts) == 1:
            pieces.append(([int(ts[0])], True, True))
            continue
        for k in range(len(ts) - 1):
            li = s1.lower_inc if k == 0 else True
            ui = s1.upper_inc if k == len(ts) - 2 else False
            t1, t2 = int(ts[k]), int(ts[k + 1])
            v1s, v1e, v2s, v2e = va[k], va[k + 1], vb[k], vb[k + 1]
            if np.array_equal(v1s, v1e) and np.array_equal(v2s, v2e):
                # both segments constant: one [t1, t2] piece :2449-2461
                pieces.append(([t1, t2], li, ui))
                continue
            if np.array_equal(v1s, v2s) or np.array_equal(v1e, v2e):
                # equal start (or end) values: start singleton, open
                # middle, end singleton :2463-2509
                if li:
                    pieces.append(([t1], True, True))
                pieces.append(([t1, t2], False, False))
                if ui:
                    pieces.append(([t2], True, True))
                continue
            ct = _tpointseg_cross_time(t1, t2, v1s, v1e, v2s, v2e)
            if ct is None:
                # no crossing :2524-2547
                pieces.append(([t1, t2], li, False))
                if ui:
                    pieces.append(([t2], True, True))
                continue
            # crossing at ct :2549-2576
            pieces.append(([t1, ct], li, False))
            pieces.append(([ct], True, True))
            pieces.append(([ct, t2], False, ui))
    if not pieces:
        return None
    # pointer inequality: only the value-blind rule can join
    tagged = [(ts, list(range(i * 64, i * 64 + len(ts))), li, ui)
              for i, (ts, li, ui) in enumerate(pieces)]
    merged = _normalize_step_pieces(tagged)
    return _pieces_to_tbool([(ts, [1.0] * len(ts), li, ui)
                             for ts, _tok, li, ui in merged])


def _seg_geo_inter_components(p1, p2, g: geo.Geometry):
    """2D components of st_intersection(segment p1→p2, g) for Point /
    MultiPoint / LineString / MultiLineString operands, as PostGIS
    enumerates them (`tpoint_tempspatialrels.c:40-69`): a list of
    ``('pt', xy)`` and ``('ln', xy1, xy2)`` entries, point components
    deduplicated the way GEOS noding does."""
    ax, ay = float(p1[0]), float(p1[1])
    bx, by = float(p2[0]), float(p2[1])
    dx, dy = bx - ax, by - ay
    comps = []
    if g.kind in ("Point", "MultiPoint"):
        for part in g.parts:
            for q in np.atleast_2d(part):
                if geo._on_segment(float(q[0]), float(q[1]),
                                   ax, ay, bx, by):
                    comps.append(("pt", (float(q[0]), float(q[1]))))
    elif g.kind in ("LineString", "MultiLineString"):
        for part in g.parts:
            pts = np.atleast_2d(part)
            for j in range(len(pts) - 1):
                qx, qy = float(pts[j, 0]), float(pts[j, 1])
                rx, ry = float(pts[j + 1, 0]), float(pts[j + 1, 1])
                ex, ey = rx - qx, ry - qy
                denom = dx * ey - dy * ex
                wx, wy = qx - ax, qy - ay
                if denom == 0.0:
                    if wx * dy - wy * dx != 0.0:
                        continue  # parallel, not collinear
                    ll = dx * dx + dy * dy
                    if ll == 0.0:
                        continue
                    s1 = (wx * dx + wy * dy) / ll
                    s2 = ((rx - ax) * dx + (ry - ay) * dy) / ll
                    lo, hi = min(s1, s2), max(s1, s2)
                    lo, hi = max(lo, 0.0), min(hi, 1.0)
                    if hi < lo:
                        continue
                    pa = (ax + lo * dx, ay + lo * dy)
                    pb = (ax + hi * dx, ay + hi * dy)
                    comps.append(("pt", pa) if hi == lo
                                 else ("ln", pa, pb))
                    continue
                t = (wx * ey - wy * ex) / denom
                u = (wx * dy - wy * dx) / denom
                if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                    comps.append(("pt", (ax + t * dx, ay + t * dy)))
    else:
        raise NotImplementedError(
            f"trelate pattern over {g.kind} geometry")
    # GEOS-style dedup: identical points and points covered by an
    # overlap component collapse
    out, seen = [], set()
    for c in comps:
        if c[0] == "ln":
            out.append(c)
    for c in comps:
        if c[0] != "pt":
            continue
        if c[1] in seen:
            continue
        covered = any(geo._on_segment(c[1][0], c[1][1], ln[1][0], ln[1][1],
                                      ln[2][0], ln[2][1])
                      for ln in out if ln[0] == "ln")
        if not covered:
            seen.add(c[1])
            out.append(c)
    return out


def _line_locate_frac(pt, p1, p2) -> float:
    """PostGIS line_locate_point on the segment p1→p2."""
    dx, dy = float(p2[0]) - float(p1[0]), float(p2[1]) - float(p1[1])
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return 0.0
    f = ((pt[0] - float(p1[0])) * dx + (pt[1] - float(p1[1])) * dy) / ll
    return min(max(f, 0.0), 1.0)


def _trelate3_geo(tv: Temporal, g: geo.Geometry, pattern: str,
                  geom_first: bool):
    """trelate_pattern over (tpoint, geometry) — verbatim port of
    tspatialrel3_tpoint_geo (`tpoint_tempspatialrels.c:400-657,
    1432-1450`) with geom_relate_pattern, including its two defects:
    constant segments collapse to a single instant at the segment
    start (`:407-418`), and the constant/no-intersection branches
    evaluate the relate matrix with the OPPOSITE operand orientation
    from the intersection branches (`:410 vs :455`)."""
    from . import de9im
    invert = geom_first

    def val(pt, swapped: bool) -> float:
        point_first = invert if swapped else not invert
        pg = geo.Geometry("Point", [np.array([[float(pt[0]),
                                               float(pt[1])]])], g.srid)
        m = de9im.relate_geoms(pg, g)
        if not point_first:
            m = de9im._transpose(m)
        return 1.0 if de9im.matches_pattern(m, pattern) else 0.0

    if tv.duration in (INSTANT, INSTANTSET):
        seqs = [Seq(s.times.copy(),
                    np.array([[val(v, False)] for v in s.values]),
                    s.lower_inc, s.upper_inc) for s in tv.seqs]
        return Temporal(tv.duration, seqs, False, 0, True)

    pieces = []   # (times, values, lower_inc, upper_inc)
    for s in tv.seqs:
        ts, vs = s.times, s.values
        if len(ts) == 1:
            pieces.append(([int(ts[0])], [val(vs[0], False)], True, True))
            continue
        for k in range(len(ts) - 1):
            li = s.lower_inc if k == 0 else True
            ui = s.upper_inc if k == len(ts) - 2 else False
            t1, t2 = int(ts[k]), int(ts[k + 1])
            p1, p2 = vs[k], vs[k + 1]
            if np.array_equal(p1, p2) or not tv.linear:
                # constant segment: single instant at the start :407-418
                pieces.append(([t1], [val(p1, True)], True, True))
                continue
            comps = _seg_geo_inter_components(p1, p2, g)
            if not comps:
                # empty intersection, swapped orientation :424-438
                v = val(p1, True)
                pieces.append(([t1, t2], [v, v], li, ui))
                continue
            # instants of intersection (`:76-150`): fraction → truncated
            # microsecond timestamp, exclusive bounds skipped
            dur = float(t2 - t1)
            inst = []
            for c in comps:
                cand = [c[1]] if c[0] == "pt" else [c[1], c[2]]
                prev_t = None
                for pt in cand:
                    tt = t1 + int(dur * _line_locate_frac(pt, p1, p2))
                    if (li or tt != t1) and (ui or tt != t2) \
                            and tt != prev_t:
                        inst.append((tt, pt))
                    prev_t = tt
            inst.sort(key=lambda ip: ip[0])
            inst = [ip for n, ip in enumerate(inst)
                    if n == 0 or ip[0] != inst[n - 1][0]]
            if not inst:
                # intersection only at an exclusive bound: value at the
                # middle instant :449-470
                mid = t1 + (t2 - t1) // 2
                f = (mid - t1) / dur
                v = val(p1 + (p2 - p1) * f, False)
                pieces.append(([t1, t2], [v, v], li, ui))
                continue
            before = t1 != inst[0][0]
            after = t2 != inst[-1][0]
            if before:
                v = val(p1, False)
                pieces.append(([t1, inst[0][0]], [v, v], li, False))
            for n, (ti, pt) in enumerate(inst):
                pieces.append(([ti], [val(pt, False)], True, True))
                if n < len(inst) - 1:
                    mid = ti + (inst[n + 1][0] - ti) // 2
                    f = (mid - t1) / dur
                    v = val(p1 + (p2 - p1) * f, False)
                    pieces.append(([ti, inst[n + 1][0]], [v, v],
                                   False, False))
            if after:
                v = val(p2, False)
                pieces.append(([inst[-1][0], t2], [v, v], False, ui))
    if not pieces:
        return None
    return _pieces_to_tbool(_normalize_step_pieces(pieces))


def _tdw_solve(sv1, ev1, sv2, ev2, lower: int, upper: int, d: float):
    """The reference tdwithin quadratic solver, operation for
    operation (`tpoint_tempspatialrels.c:952-1098`): coefficients
    summed per-axis in double, discriminant and the quadratic/Viète
    root mixture in 80-bit long double (sqrtl), crossing timestamps
    ``lower + (long)(t * duration)`` — the product TRUNCATES before
    the integer add (golden 68 tdwithin ``.94821`` vs the float-sum
    form's ``.948211``), and near-equal roots collapse to a single
    instant under EPSILON.  Returns (n_solutions, t1, t2)."""
    da = (ev1 - sv1) - (ev2 - sv2)
    dc = sv1 - sv2
    qa = float((da * da).sum())
    qb = float((2.0 * da * dc).sum())
    qc = float((dc * dc).sum()) - d * d
    if qa == 0.0:
        # parallel, same velocity: constant distance
        if float(np.sqrt((dc * dc).sum())) > d:
            return 0, 0, 0
        return 2, lower, upper
    la, lb, lc = np.longdouble(qa), np.longdouble(qb), np.longdouble(qc)
    ldur = np.longdouble(np.float64(upper - lower))
    disc = lb * lb - 4 * la * lc
    if disc == 0:
        t5 = (-lb) / (2 * la)
        if t5 < 0.0 or t5 > 1.0:
            return 0, 0, 0
        return 1, lower + int(t5 * ldur), 0
    if disc < 0:
        return 0, 0, 0
    sq = np.sqrt(disc)
    if qb >= 0:
        t5 = (-lb - sq) / (2 * la)
        t6 = (2 * lc) / (-lb - sq)
    else:
        t5 = (2 * lc) / (-lb + sq)
        t6 = (-lb + sq) / (2 * la)
    if t6 < 0.0 or t5 > 1.0:
        return 0, 0, 0
    t7 = max(np.longdouble(0.0), t5)
    t8 = min(np.longdouble(1.0), t6)
    if abs(t7 - t8) < EPSILON:
        return 1, lower + int(t7 * ldur), 0
    return 2, lower + int(t7 * ldur), lower + int(t8 * ldur)


def _seq_atoms(lo: int, hi: int, li: bool, ui: bool, v1: float,
               v2: float | None = None) -> list[tuple]:
    """Step atoms of a reference mini bool sequence
    ``[v1@lo, v2@hi]`` with bounds (li, ui) — or a single instant
    when lo == hi."""
    if lo == hi:
        return [(lo, lo, True, True, v1)]
    out = []
    if li:
        out.append((lo, lo, True, True, v1))
    out.append((lo, hi, False, False, v1))
    if ui:
        out.append((hi, hi, True, True, v1 if v2 is None else v2))
    return out


def _tdwithin_segment(atoms: list, sv1, ev1, sv2, ev2, lower: int,
                      upper: int, lin1: bool, lin2: bool, li: bool,
                      ui: bool, d: float) -> None:
    """One synchronized segment of the tdwithin machinery, mirroring
    `tpoint_tempspatialrels.c:1101-1290`
    (tdwithin_tpointseq_tpointseq2) branch for branch: both-constant
    and both-stepwise short-circuits, stepwise operands frozen at
    their start value for the solve, ``upper_inc1`` only when both
    operands are linear, and the exact inclusive/exclusive bound
    pattern of each solution-count branch."""
    def within(p, q):
        return 1.0 if float(np.sqrt(((p - q) ** 2).sum())) <= d else 0.0

    t_, f_ = 1.0, 0.0
    if np.array_equal(sv1, ev1) and np.array_equal(sv2, ev2):
        atoms += _seq_atoms(lower, upper, li, ui, within(sv1, sv2))
        return
    if not lin1 and not lin2:
        atoms += _seq_atoms(lower, upper, li, False, within(sv1, sv2))
        if ui:
            atoms += _seq_atoms(upper, upper, True, True, within(ev1, ev2))
        return
    sev1 = ev1 if lin1 else sv1
    sev2 = ev2 if lin2 else sv2
    nsol, t1, t2 = _tdw_solve(sv1, sev1, sv2, sev2, lower, upper, d)
    ui1 = lin1 and lin2 and ui
    if nsol == 0:
        atoms += _seq_atoms(lower, upper, li, ui1, f_)
    elif nsol == 1:
        if (t1 == lower and not li) or (t1 == upper and not ui):
            atoms += _seq_atoms(lower, upper, li, ui1, f_)
        elif t1 == lower:
            atoms += _seq_atoms(lower, lower, True, True, t_)
            atoms += _seq_atoms(lower, upper, False, ui1, f_)
        elif t1 == upper:
            atoms += _seq_atoms(lower, upper, li, ui1, f_,
                                t_ if ui1 else f_)
        else:
            atoms += _seq_atoms(lower, t1, li, False, f_)
            atoms += _seq_atoms(t1, t1, True, True, t_)
            atoms += _seq_atoms(t1, upper, False, ui1, f_)
    else:
        if lower == t1 and upper == t2:
            atoms += _seq_atoms(lower, upper, li, ui1, t_)
        elif lower != t1 and upper == t2:
            atoms += _seq_atoms(lower, t1, li, False, f_)
            atoms += _seq_atoms(t1, upper, True, ui1, t_)
        elif lower == t1 and upper != t2:
            atoms += _seq_atoms(lower, t2, li, False, t_)
            atoms += _seq_atoms(t2, upper, True, ui1, f_)
        else:
            atoms += _seq_atoms(lower, t1, li, False, f_)
            atoms += _seq_atoms(t1, t2, True, True, t_)
            atoms += _seq_atoms(t2, upper, False, ui1, f_)
    # extra final instant when exactly one operand is stepwise
    if ui and (not lin1 or not lin2):
        atoms += _seq_atoms(upper, upper, True, True, within(ev1, ev2))


def tdwithin(a: Temporal, b: Temporal | np.ndarray, dist: float) -> Temporal | None:
    """tdwithin(tpoint, tpoint|point, d) → stepwise tbool.

    tpoint×tpoint runs the reference per-segment machinery verbatim
    (`tpoint_tempspatialrels.c:952-1290`): quadratic crossing solve
    with long-double Viète roots, product-truncated timestamps,
    EPSILON root collapse, stepwise operands held at segment start,
    and the branch-exact bound pattern.  A static point operand keeps
    the period/complement route (the reference routes it through
    at_geometry over the buffered geometry,
    `tpoint_tempspatialrels.c:657-760`, whose clipped crossing
    timestamps the truncated product reproduces on the goldens)."""
    from .lifting import assemble_step_atoms, const_temporal
    b_temporal = isinstance(b, Temporal)
    if not b_temporal:
        b = const_temporal(np.asarray(b, dtype=np.float64), a)
    pieces = synchronize(a, b)
    if not pieces:
        return None
    discrete = a.duration in (INSTANT, INSTANTSET) \
        or b.duration in (INSTANT, INSTANTSET)
    if b_temporal and not discrete:
        # tpoint × tpoint sequences: reference per-segment assembly
        atoms: list[tuple] = []
        for ts, va, vb, lo_inc, hi_inc in pieces:
            if len(ts) == 1:
                within = float(np.sqrt(((va[0] - vb[0]) ** 2).sum())) <= dist
                atoms += _seq_atoms(int(ts[0]), int(ts[0]), True, True,
                                    1.0 if within else 0.0)
                continue
            for i in range(len(ts) - 1):
                _tdwithin_segment(
                    atoms, va[i], va[i + 1], vb[i], vb[i + 1],
                    int(ts[i]), int(ts[i + 1]), a.linear, b.linear,
                    lo_inc if i == 0 else True,
                    hi_inc if i == len(ts) - 2 else False, dist)
        atoms.sort(key=lambda at: (at[0], at[1]))
        seqs = assemble_step_atoms(atoms)
        return Temporal(SEQUENCESET, seqs, False, 0, True)
    if discrete:
        dur = INSTANT if (a.duration == INSTANT
                          or (b_temporal and b.duration == INSTANT)) \
            else INSTANTSET
        seqs = []
        for ts, va, vb, _li, _hi in pieces:
            within = float(np.sqrt(((va[0] - vb[0]) ** 2).sum())) \
                <= dist + EPSILON
            seqs.append(Seq(np.array([int(ts[0])], dtype=np.int64),
                            np.array([[1.0 if within else 0.0]])))
        seqs.sort(key=lambda s: int(s.times[0]))
        return Temporal(dur, seqs, False, 0, True)
    # tpoint × static point: quadratic per segment, period assembly
    true_ps: list[Period] = []
    for ts, va, vb, lo_inc, hi_inc in pieces:
        for i in range(len(ts) - 1):
            t0, t1 = int(ts[i]), int(ts[i + 1])
            d0 = vb[i] - va[i]
            d1 = vb[i + 1] - va[i + 1]
            dd = d1 - d0
            # |d0 + r·dd|² ≤ dist²  →  a r² + b r + c ≤ 0
            qa = float(np.dot(dd, dd))
            qb = 2.0 * float(np.dot(d0, dd))
            qc = float(np.dot(d0, d0)) - dist * dist
            if qa == 0.0:
                within = [(0.0, 1.0)] if qc <= 0.0 else []
            else:
                disc = qb * qb - 4 * qa * qc
                if disc < 0:
                    within = []
                else:
                    r1 = (-qb - np.sqrt(disc)) / (2 * qa)
                    r2 = (-qb + np.sqrt(disc)) / (2 * qa)
                    lo, hi = max(0.0, min(r1, r2)), min(1.0, max(r1, r2))
                    within = [(lo, hi)] if lo <= hi else []
            for lo, hi in within:
                # C TimestampTz cast truncates the PRODUCT before the
                # integer add (`tpoint_tempspatialrels.c:1040-1060`;
                # golden 68 tdwithin .94821 vs float-sum .948211)
                ta = t0 + int(np.longdouble(lo) * np.longdouble(t1 - t0))
                tb = t0 + int(np.longdouble(hi) * np.longdouble(t1 - t0))
                true_ps.append(Period(ta, tb))
    shape = Temporal(a.duration, [Seq(ts, va, li, hi) for ts, va, _, li, hi
                                  in pieces], a.linear, a.srid)
    return _tbool_from_periods(shape, normalize_periods(true_ps))


# ---------------------------------------------------------------------------
# nearest approach
# ---------------------------------------------------------------------------

def _seg_geom_min(p0, p1, g: geo.Geometry) -> tuple[float, float]:
    """(min distance, r*) of moving point p(r)=p0+r·(p1-p0) to geometry."""
    best_d, best_r = np.inf, 0.0
    if g.kind in ("Point", "MultiPoint"):
        pts = np.vstack(g.parts) if g.parts else np.empty((0, 2))
        for q in pts:
            d, r = _seg_point_min(p0, p1, q)
            if d < best_d:
                best_d, best_r = d, r
        return best_d, best_r
    # polygon/linestring: per-edge closed form + inside test
    for ring, _ in g.rings() or [(r, False) for r in g.parts]:
        if len(ring) < 2:
            continue
        for k in range(len(ring) - 1):
            d, r = _seg_seg_min(p0, p1, ring[k], ring[k + 1])
            if d < best_d:
                best_d, best_r = d, r
    if g.kind in ("Polygon", "MultiPolygon"):
        for r in (0.0, 0.5, 1.0) + tuple(_segment_polygon_entries(p0, p1, g)):
            pt = p0 + (p1 - p0) * r
            if geo.points_in_polygon(pt[0:1], pt[1:2], g)[0]:
                return 0.0, float(r)
    return best_d, best_r


def _seg_point_min(p0, p1, q) -> tuple[float, float]:
    d = p1 - p0
    L2 = float(np.dot(d, d))
    r = 0.0 if L2 == 0 else float(np.clip(np.dot(q - p0, d) / L2, 0.0, 1.0))
    pt = p0 + d * r
    return float(np.sqrt(((pt - q) ** 2).sum())), r


def _seg_seg_min(p0, p1, q0, q1) -> tuple[float, float]:
    """Min distance between segments; returns (dist, r on p)."""
    # candidates: endpoints projected on the other segment
    cands = []
    d, r = _seg_point_min(p0, p1, q0)
    cands.append((d, r))
    d, r = _seg_point_min(p0, p1, q1)
    cands.append((d, r))
    # project p endpoints onto q
    dq = q1 - q0
    L2 = float(np.dot(dq, dq))
    for pp, rp in ((p0, 0.0), (p1, 1.0)):
        s = 0.0 if L2 == 0 else float(np.clip(np.dot(pp - q0, dq) / L2, 0.0, 1.0))
        qq = q0 + dq * s
        cands.append((float(np.sqrt(((pp - qq) ** 2).sum())), rp))
    # crossing → 0
    if geo.segments_cross(np.array([p0[0]]), np.array([p0[1]]),
                          np.array([p1[0]]), np.array([p1[1]]),
                          np.array([q0[0]]), np.array([q0[1]]),
                          np.array([q1[0]]), np.array([q1[1]]))[0]:
        # crossing parameter on p
        dp = p1 - p0
        denom = dp[0] * dq[1] - dp[1] * dq[0]
        if denom != 0.0:
            w = q0 - p0
            r = (w[0] * dq[1] - w[1] * dq[0]) / denom
            return 0.0, float(np.clip(r, 0.0, 1.0))
    return min(cands, key=lambda c: c[0])


def nearest_approach_instant(tv: Temporal, other) -> tuple[int, float]:
    """(timestamp, distance) of closest approach — NAI + NAD
    (`tpoint_spatialfuncs.c:2107-2506`).  ``other`` is a Geometry or a
    Temporal point.  Ties resolve to the earliest instant."""
    if isinstance(other, Temporal):
        d = tdistance(tv, other)
        if d is None:
            raise ValueError("temporal values do not overlap in time")
        best_t, best_d = None, np.inf
        for s in d.seqs:
            i = int(np.argmin(s.values[:, 0]))
            if s.values[i, 0] < best_d - 0.0:
                best_d = float(s.values[i, 0])
                best_t = int(s.times[i])
        return best_t, best_d
    g = other
    best_t, best_d = None, np.inf
    for s in tv.seqs:
        n = len(s.times)
        if n == 1 or not tv.linear or tv.duration in (INSTANT, INSTANTSET):
            for i in range(n):
                dd = _point_geom_dist(s.values[i], g)
                if dd < best_d:
                    best_d, best_t = dd, int(s.times[i])
            continue
        for i in range(n - 1):
            dd, r = _seg_geom_min(s.values[i], s.values[i + 1], g)
            if dd < best_d:
                best_d = dd
                best_t = int(round(int(s.times[i])
                                   + (int(s.times[i + 1]) - int(s.times[i])) * r))
    return best_t, best_d


def _point_geom_dist(p, g: geo.Geometry) -> float:
    if g.kind in ("Point", "MultiPoint"):
        pts = np.vstack(g.parts) if g.parts else np.empty((0, 2))
        return float(np.sqrt(((pts - p) ** 2).sum(axis=1)).min())
    if g.kind in ("LineString", "MultiLineString"):
        best = np.inf
        for a, b in _line_segments(g):
            d, _ = geo.point_segment_dist(p[0:1], p[1:2],
                                          a[0], a[1], b[0], b[1])
            best = min(best, float(d[0]))
        return best
    return float(geo.point_polygon_dist(p[0:1], p[1:2], g)[0])


def nearest_approach_distance(tv: Temporal, other) -> float:
    return nearest_approach_instant(tv, other)[1]


def shortest_line(tv: Temporal, other) -> np.ndarray:
    """Segment realizing NAD (`:2515-2760`): (2,2) coords array."""
    t, _d = nearest_approach_instant(tv, other)
    p = tv.value_at(t)
    if isinstance(other, Temporal):
        q = other.value_at(t)
    else:
        g = other
        if g.kind in ("Point", "MultiPoint"):
            pts = np.vstack(g.parts)
            q = pts[np.argmin(((pts - p) ** 2).sum(axis=1))]
        else:
            best = (np.inf, None)
            for ring, _ in g.rings():
                d, r = geo.point_segment_dist(p[0], p[1],
                                              ring[:-1, 0], ring[:-1, 1],
                                              ring[1:, 0], ring[1:, 1])
                k = int(np.argmin(d))
                if d[k] < best[0]:
                    qq = ring[k] + (ring[k + 1] - ring[k]) * r[k]
                    best = (float(d[k]), qq)
            q = best[1]
    return np.vstack([p, q])


def tdistance_geometry(tv: Temporal, g: geo.Geometry) -> Temporal | None:
    """EXTENSION: temporal distance profile (tfloat) from a tpoint to
    an arbitrary geometry (Point/MultiPoint/LineString/
    MultiLineString/Polygon/MultiPolygon).

    The reference ERRORS on non-point distance operands
    (`ensure_point_type`, `point/src/tpoint_distance.c:250,297` —
    asserted verbatim in tests/test_distance62_suite.py); point
    parity lives in lifting.tdistance_checked.  This profile follows
    the same tfloat model the reference uses for point operands:
    exact distances at knots plus closest-approach candidate instants
    (per-pair convex minimizers from the NAD kernels, polygon
    entry/exit crossings), linear interpolation between — the
    distance-to-road profile for the table ops."""
    if g.is_empty:
        return None
    out_seqs: list[Seq] = []
    discrete = tv.duration in (INSTANT, INSTANTSET) or not tv.linear

    def dist_at(vals: np.ndarray) -> np.ndarray:
        return np.array([_point_geom_dist(v, g) for v in vals])[:, None]

    for s in tv.seqs:
        n = len(s.times)
        if discrete or n == 1:
            out_seqs.append(Seq(s.times.copy(), dist_at(s.values),
                                s.lower_inc, s.upper_inc))
            continue
        times: list[int] = []
        for i in range(n - 1):
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            p0, p1 = s.values[i], s.values[i + 1]
            times.append(t0)
            cands: list[float] = []
            if g.kind in ("Point", "MultiPoint"):
                for q in np.vstack(g.parts):
                    cands.append(_seg_point_min(p0, p1, q)[1])
            else:
                rings = g.rings() or [(r, False) for r in g.parts]
                for ring, _ in rings:
                    for k in range(len(ring) - 1):
                        cands.append(
                            _seg_seg_min(p0, p1, ring[k], ring[k + 1])[1])
                if g.kind in ("Polygon", "MultiPolygon"):
                    cands.extend(_segment_polygon_entries(p0, p1, g))
            for r in cands:
                tc = int(round(t0 + (t1 - t0) * r))
                if t0 < tc < t1:
                    times.append(tc)
        times.append(int(s.times[-1]))
        ts = np.array(sorted(set(times)), dtype=np.int64)
        vals = np.vstack([tv.value_at(int(t)) for t in ts])
        out_seqs.append(Seq(ts, dist_at(vals), s.lower_inc, s.upper_inc))
    return Temporal(tv.duration, out_seqs, tv.linear, tv.srid,
                    tv.step_default)
