"""Lifting engine: synchronize two temporal values and lift scalar
functions over them — the single code path behind compops, boolops,
mathfuncs and temporal distance (SURVEY §2.7).

Reference: `src/lifting.c` (3659 LoC; design note at `:17-66`) and the
synchronize kernel `synchronize_temporal_temporal`
(`src/temporalseq.c:996-1140`).  Semantics preserved:

- binary ops are defined only where BOTH operands are defined: the
  result's time domain is the intersection, with instants at the
  union of both operands' instants inside it
- ``turnfn`` inserts *turning points* (extrema of non-linear
  combinations: product, division, distance) so the piecewise-linear
  result is exact at the extremum (`tnumber_mathfuncs.c:127`
  ``tnumberseq_mult_maxmin_at_timestamp``,
  `tpoint_distance.c:172-243`)
- comparison lifting inserts *crossings* (where a(t) = b(t)) and
  splits the stepwise tbool result into pieces around the isolated
  equality instant (lifting.c ``_cross`` variants)
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, EPSILON,
                    Period, Seq, Temporal)

TurnFn = Callable[[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int],
                  list[int]]


def ensure_compatible(a: Temporal, b: Temporal) -> None:
    """Mixed SRID / mixed dimensionality is an error, matching
    ``ensure_same_srid_tpoint`` / ``ensure_same_dimensionality``
    (`point/src/tpoint_spatialfuncs.c:36-74`; exercised by the
    62_tpoint_distance error cases)."""
    if a.srid and b.srid and a.srid != b.srid:
        raise ValueError(
            f"operation on mixed SRID is not allowed ({a.srid} vs {b.srid})")
    if a.dim != b.dim:
        raise ValueError(
            f"operation on mixed dimensionality is not allowed "
            f"({a.dim}D vs {b.dim}D)")


def _result_dur(a: Temporal, b: Temporal, n_seqs: int) -> int:
    if a.duration == INSTANT or b.duration == INSTANT:
        return INSTANT
    if a.duration == INSTANTSET or b.duration == INSTANTSET:
        return INSTANTSET
    if a.duration == SEQUENCE and b.duration == SEQUENCE and n_seqs <= 1:
        return SEQUENCE
    return SEQUENCESET


def _sample(seq: Seq, t: np.ndarray, linear: bool) -> np.ndarray:
    """Vectorized interpolation of one sequence at times t (all inside)."""
    idx = np.searchsorted(seq.times, t, side="right") - 1
    idx = np.clip(idx, 0, len(seq.times) - 1)
    exact = seq.times[idx] == t
    if not linear or len(seq.times) == 1:
        return seq.values[idx]
    nxt = np.clip(idx + 1, 0, len(seq.times) - 1)
    t0 = seq.times[idx].astype(np.float64)
    t1 = seq.times[nxt].astype(np.float64)
    dt = np.where(t1 > t0, t1 - t0, 1.0)
    r = (t.astype(np.float64) - t0) / dt
    out = seq.values[idx] + (seq.values[nxt] - seq.values[idx]) * r[:, None]
    out[exact] = seq.values[idx[exact]]
    return out


def synchronize(a: Temporal, b: Temporal, turnfn: TurnFn | None = None
                ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray, bool, bool]]:
    """Align two temporal values on their common time domain.

    Returns a list of synchronized pieces
    ``(times, a_values, b_values, lower_inc, upper_inc)`` — one per
    overlapping sequence pair (instantaneous pieces for discrete
    durations).  cf. `temporalseq.c:996` ``synchronize_temporalseq_…``.
    """
    out = []
    a_discrete = a.duration in (INSTANT, INSTANTSET)
    b_discrete = b.duration in (INSTANT, INSTANTSET)
    for sa in a.seqs:
        for sb in b.seqs:
            inter = sa.period.intersection(sb.period)
            if inter is None:
                continue
            if a_discrete or b_discrete:
                # discrete synchronization: sample at shared defined instants
                if a_discrete and b_discrete:
                    ts = np.intersect1d(sa.times, sb.times)
                else:
                    ts = sa.times if a_discrete else sb.times
                ts = ts[[inter.contains_ts(int(t)) for t in ts]] \
                    if len(ts) else ts
                for t in ts:
                    tt = np.array([t], dtype=np.int64)
                    out.append((tt, _sample(sa, tt, a.linear),
                                _sample(sb, tt, b.linear), True, True))
                continue
            lo, hi = inter.lower, inter.upper
            ts = np.unique(np.concatenate([
                sa.times[(sa.times >= lo) & (sa.times <= hi)],
                sb.times[(sb.times >= lo) & (sb.times <= hi)],
                np.array([lo, hi], dtype=np.int64)]))
            if turnfn is not None and len(ts) > 1:
                extra: list[int] = []
                va = _sample(sa, ts, a.linear)
                vb = _sample(sb, ts, b.linear)
                for i in range(len(ts) - 1):
                    extra.extend(turnfn(va[i], va[i + 1], vb[i], vb[i + 1],
                                        int(ts[i]), int(ts[i + 1])))
                if extra:
                    ts = np.unique(np.concatenate(
                        [ts, np.array(extra, dtype=np.int64)]))
            out.append((ts, _sample(sa, ts, a.linear),
                        _sample(sb, ts, b.linear),
                        inter.lower_inc, inter.upper_inc))
    return out


def lift_binary(f: Callable[[np.ndarray, np.ndarray], np.ndarray],
                a: Temporal, b: Temporal,
                turnfn: TurnFn | None = None,
                result_linear: bool | None = None,
                result_step_default: bool = False) -> Temporal | None:
    """Lift a vectorized binary kernel f(A, B) -> V over two temporal
    values (sync_tfunc2 family, `lifting.c:500+`)."""
    ensure_compatible(a, b)
    pieces = synchronize(a, b, turnfn)
    if not pieces:
        return None
    linear = a.linear and b.linear if result_linear is None else result_linear
    continuous = a.duration in (SEQUENCE, SEQUENCESET) \
        and b.duration in (SEQUENCE, SEQUENCESET)
    seqs = []
    for ts, va, vb, lo_inc, hi_inc in pieces:
        v = np.atleast_2d(np.asarray(f(va, vb), dtype=np.float64))
        if v.shape[0] != len(ts):
            v = v.T
        if continuous:
            from .types import normalize_instants
            ts, v = normalize_instants(ts, v, linear)
        seqs.append(Seq(ts, v, lo_inc, hi_inc))
    dur = _result_dur(a, b, len(seqs))
    if dur == SEQUENCESET:
        seqs = sorted(seqs, key=lambda s: int(s.times[0]))
    return Temporal(dur, seqs, linear, a.srid or b.srid,
                    result_step_default)


def lift_unary(f: Callable[[np.ndarray], np.ndarray], a: Temporal,
               result_linear: bool | None = None,
               result_step_default: bool = False) -> Temporal:
    """Lift a vectorized unary kernel over every instant (tfunc1,
    `lifting.c:80`)."""
    seqs = []
    for s in a.seqs:
        v = np.atleast_2d(np.asarray(f(s.values), dtype=np.float64))
        if v.shape[0] != len(s.times):
            v = v.T
        seqs.append(Seq(s.times.copy(), v, s.lower_inc, s.upper_inc))
    return Temporal(a.duration, seqs,
                    a.linear if result_linear is None else result_linear,
                    a.srid, result_step_default or a.step_default)


def const_temporal(value, like: Temporal) -> Temporal:
    """A temporal value constantly equal to ``value`` over ``like``'s
    shape — lets base⊕temporal reuse the binary path."""
    value = np.atleast_1d(np.asarray(value, dtype=np.float64))
    seqs = [Seq(s.times.copy(),
                np.repeat(value[None, :], len(s.times), axis=0),
                s.lower_inc, s.upper_inc) for s in like.seqs]
    return Temporal(like.duration, seqs, like.linear, 0, like.step_default)


# ---------------------------------------------------------------------------
# turning points (exactness inserts)
# ---------------------------------------------------------------------------

def turn_product(a0, a1, b0, b1, t0: int, t1: int) -> list[int]:
    """Extremum of a(t)·b(t) (quadratic vertex) strictly inside (t0,t1)
    — `tnumber_mathfuncs.c:127-160`."""
    da = float(a1[0] - a0[0])
    db = float(b1[0] - b0[0])
    denom = 2.0 * da * db
    if denom == 0.0:
        return []
    r = (-(float(a0[0]) * db + float(b0[0]) * da)) / denom
    if r <= 0.0 or r >= 1.0:
        return []
    t = int(round(t0 + (t1 - t0) * r))
    return [t] if t0 < t < t1 else []


def turn_distance(a0, a1, b0, b1, t0: int, t1: int) -> list[int]:
    """Instant of minimum distance between two linearly-moving points
    (closed-form d/dt‖Δp(t)‖² = 0) — `tpoint_distance.c:172-243`."""
    d0 = np.asarray(b0 - a0, dtype=np.float64)
    dv = np.asarray((b1 - a1) - (b0 - a0), dtype=np.float64)
    denom = float(np.dot(dv, dv))
    if denom == 0.0:
        return []
    r = -float(np.dot(d0, dv)) / denom
    if r <= 0.0 or r >= 1.0:
        return []
    t = int(round(t0 + (t1 - t0) * r))
    return [t] if t0 < t < t1 else []


# ---------------------------------------------------------------------------
# comparison lifting with crossings → stepwise tbool
# ---------------------------------------------------------------------------

def assemble_step_atoms(atoms: list[tuple]) -> list[Seq]:
    """Assemble (lo, hi, lo_inc, hi_inc, value) step atoms into the
    reference's sequence form: touching equal-valued atoms merge; a
    different-valued instant touching the open end of the preceding
    interval is absorbed as its inclusive final instant
    (`{[f@.., t@cross], (f@cross, …` — the _cross output convention).
    Shared by comparison lifting and the tbool-from-periods builder."""
    merged: list[list] = []
    for at in atoms:
        if merged:
            m = merged[-1]
            if m[4] == at[4] and m[1] == at[0] and (m[3] or at[2]):
                m[1], m[3] = at[1], at[3]
                continue
        merged.append(list(at))
    # chain pieces into maximal step sequences: a following piece whose
    # inclusive start meets the previous piece's EXCLUSIVE end is a
    # representable value change at an interior knot
    # (`[f@d1, t@d2, t@d4]` — the new value belongs to the knot)
    seqs: list[Seq] = []
    cur: dict | None = None

    def flush():
        nonlocal cur
        if cur is None:
            return
        t, v = cur["t"], cur["v"]
        if cur["hi"] > t[-1]:
            t = t + [cur["hi"]]
            v = v + [v[-1]]
        seqs.append(Seq(np.array(t, dtype=np.int64),
                        np.array(v, dtype=np.float64)[:, None],
                        cur["lo_inc"], cur["hi_inc"]))
        cur = None

    for lo, hi, li, hi_i, v in merged:
        if (cur is not None and cur["hi"] == lo
                and not cur["hi_inc"] and li):
            cur["t"].append(lo)
            cur["v"].append(v)
            cur["hi"], cur["hi_inc"] = hi, hi_i or (lo == hi)
        else:
            flush()
            cur = {"t": [lo], "v": [v], "lo_inc": li or (lo == hi),
                   "hi": hi, "hi_inc": hi_i or (lo == hi)}
    flush()
    return seqs


def _crossing_ratio(a0, a1, b0, b1) -> float | None:
    """r in (0,1) where the linear segments a(t), b(t) coincide in
    EVERY dimension (for points: where the two paths meet, cf.
    sync_tfunc4_…_cross inserting the crossing instant,
    `src/temporal_compops.c:96`)."""
    d0 = np.asarray(a0 - b0, dtype=np.float64)
    d1 = np.asarray(a1 - b1, dtype=np.float64)
    dd = d1 - d0
    moving = dd != 0.0
    if not moving.any():
        return None
    rs = -d0[moving] / dd[moving]
    r = float(rs[0])
    # all moving dims must cross at the same instant; static dims must
    # already coincide
    if np.any(np.abs(rs - r) > 1e-9) or \
            np.any(np.abs(d0[~moving]) > EPSILON):
        return None
    return r if 0.0 < r < 1.0 else None


def lift_comparison(op: str, a: Temporal, b: Temporal) -> Temporal | None:
    """Temporal comparison (#=, #<>, #<, … `src/temporal_compops.c`):
    stepwise tbool with exact crossing splits on linear inputs."""
    ops = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
           "le": np.less_equal, "gt": np.greater, "ge": np.greater_equal}
    cmp = ops[op]

    def fcmp(va, vb):
        if va.shape[1] > 1:  # points compare by full equality
            eq = np.all(np.abs(va - vb) <= EPSILON, axis=1)
            return (eq if op == "eq" else ~eq).astype(np.float64)
        return cmp(va[:, 0], vb[:, 0]).astype(np.float64)

    pieces = synchronize(a, b)
    if not pieces:
        return None
    seqs: list[Seq] = []
    for ts, va, vb, lo_inc, hi_inc in pieces:
        if len(ts) == 1:
            v = fcmp(va, vb)
            seqs.append(Seq(ts, v[:, None], lo_inc, hi_inc))
            continue
        # build (lower, upper, lower_inc, upper_inc, value) atoms per
        # segment — knot instants, open interiors, crossing instants —
        # then merge equal-valued touching atoms into step sequences.
        # Within a segment's open interior, a stepwise operand holds its
        # LEFT value (the knot value at the right end belongs to the
        # next piece), so each side gets an effective right endpoint.
        atoms: list[tuple[int, int, bool, bool, float]] = []
        n = len(ts)
        for i in range(n - 1):
            t0, t1 = int(ts[i]), int(ts[i + 1])
            a0, a1 = va[i], (va[i + 1] if a.linear else va[i])
            b0, b1 = vb[i], (vb[i + 1] if b.linear else vb[i])
            v_at_t0 = float(fcmp(va[i:i + 1], vb[i:i + 1])[0])
            if i > 0 or lo_inc:
                atoms.append((t0, t0, True, True, v_at_t0))
            r = _crossing_ratio(a0, a1, b0, b1)
            tc = None
            if r is not None:
                tc = int(round(t0 + (t1 - t0) * r))
                if not (t0 < tc < t1):
                    tc = None
            if tc is None:
                v_mid = float(fcmp(((a0 + a1) / 2)[None, :],
                                   ((b0 + b1) / 2)[None, :])[0])
                atoms.append((t0, t1, False, False, v_mid))
            else:
                rr = (tc - t0) / (t1 - t0)
                vca = a0 + (a1 - a0) * rr
                vcb = b0 + (b1 - b0) * rr
                v_before = float(fcmp(((a0 + vca) / 2)[None, :],
                                      ((b0 + vcb) / 2)[None, :])[0])
                v_cross = float(fcmp(vca[None, :], vcb[None, :])[0])
                v_after = float(fcmp(((vca + a1) / 2)[None, :],
                                     ((vcb + b1) / 2)[None, :])[0])
                atoms.append((t0, tc, False, False, v_before))
                atoms.append((tc, tc, True, True, v_cross))
                atoms.append((tc, t1, False, False, v_after))
        if hi_inc:
            atoms.append((int(ts[n - 1]), int(ts[n - 1]), True, True,
                          float(fcmp(va[n - 1:n], vb[n - 1:n])[0])))
        seqs.extend(assemble_step_atoms(atoms))
    if not seqs:
        return None
    dur = _result_dur(a, b, len(seqs))
    if dur == SEQUENCE:
        # crossing-lifted ops always return a SequenceSet on continuous
        # inputs (golden: `{[t@..]}` even for a single piece)
        dur = SEQUENCESET
    seqs.sort(key=lambda s: int(s.times[0]))
    out = Temporal(dur, seqs, False, 0, True)
    out.is_bool = True  # a comparison IS a tbool (prints t/f)
    return out


# ---------------------------------------------------------------------------
# lifted operator surface (mathfuncs / boolops / compops)
# ---------------------------------------------------------------------------

def tadd(a, b):
    return lift_binary(lambda x, y: x + y, a, b)


def tsub(a, b):
    return lift_binary(lambda x, y: x - y, a, b)


def tmult(a, b):
    return lift_binary(lambda x, y: x * y, a, b, turnfn=turn_product)


def tdiv(a, b):
    """Lifted division with the reference's zero-divisor guard
    (`src/arithops.c` div: errors when the divisor is — or, linear,
    crosses — zero anywhere on the domain)."""
    if isinstance(b, Temporal):
        # the reference synchronizes FIRST: a zero in the divisor
        # outside the common domain is fine (24-suite ok rows)
        from .everops import ever
        bb = b
        if isinstance(a, Temporal):
            pieces = synchronize(a, b)
            if pieces:
                seqs = [Seq(t, bv, lo, hi)
                        for t, _, bv, lo, hi in pieces]
                bb = Temporal(SEQUENCESET if len(seqs) > 1
                              else b.duration if len(b.seqs) == 1
                              else SEQUENCESET,
                              seqs, b.linear, b.srid, b.step_default)
        if ever("eq", bb, 0.0):
            raise ValueError("Division by zero")
    elif float(np.asarray(b).reshape(-1)[0]) == 0.0:
        raise ValueError("Division by zero")
    return lift_binary(lambda x, y: x / y, a, b, turnfn=turn_product)


def tround(a: Temporal, digits: int = 0) -> Temporal:
    """Lifted round (`src/mathfuncs.c` tnumber round → PG numeric
    round, half away from zero)."""
    scale = 10.0 ** digits
    return lift_unary(
        lambda v: np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale,
        a)


def tdegrees(a: Temporal) -> Temporal:
    """Lifted degrees (`src/mathfuncs.c` tnumber degrees)."""
    return lift_unary(np.degrees, a)


def _mark_bool(out, *ops):
    if out is not None and any(getattr(o, "is_bool", False) for o in ops):
        out.is_bool = True
    return out


def tand(a, b):
    return _mark_bool(
        lift_binary(lambda x, y: np.minimum(x, y), a, b,
                    result_linear=False, result_step_default=True), a, b)


def tor(a, b):
    return _mark_bool(
        lift_binary(lambda x, y: np.maximum(x, y), a, b,
                    result_linear=False, result_step_default=True), a, b)


def tnot(a):
    return _mark_bool(
        lift_unary(lambda v: 1.0 - v, a, result_linear=False,
                   result_step_default=True), a)


def tdistance(a: Temporal, b: Temporal) -> Temporal | None:
    """Temporal distance tpoint<->tpoint / tpoint<->point
    (`point/src/tpoint_distance.c:245-398`): tfloat with turning
    points at closest approach."""
    if isinstance(b, Temporal):
        return lift_binary(
            lambda x, y: np.sqrt(((x - y) ** 2).sum(axis=1)),
            a, b, turnfn=turn_distance)
    point = np.atleast_1d(np.asarray(b, dtype=np.float64))
    return tdistance(a, const_temporal(point, a))


def tdistance_checked(a: Temporal, b, geodetic: bool = False):
    """Temporal distance with the reference's operand validation and
    geometry/geography dispatch (`point/src/tpoint_distance.c:245-398`
    distance_geo_tpoint / distance_tpoint_geo / distance_tpoint_tpoint,
    parameter tests `tpoint_spatialfuncs.c:35-90`): non-point
    geometries, mixed SRIDs and mixed dimensionality raise the
    reference's exact errors; an empty geometry operand returns NULL.
    ``geodetic`` selects WGS84 spheroid meters with planar turning
    instants (geog.geog_distance_spheroid)."""
    from . import geo as _geo

    if isinstance(b, Temporal):
        if a.srid != b.srid:
            raise ValueError("The temporal points must be in the same SRID")
        if a.dim != b.dim:
            raise ValueError(
                "The temporal points must be of the same dimensionality")
        point = None
    elif isinstance(b, _geo.Geometry):
        if b.kind != "Point":
            raise ValueError("Only point geometries accepted")
        if b.srid != a.srid:
            raise ValueError(
                "The temporal point and the geometry must be in the same SRID")
        if b.is_empty:
            return None
        point = np.asarray(b.parts[0][0], dtype=np.float64)
        if len(point) != a.dim:
            raise ValueError("The temporal point and the geometry "
                             "must be of the same dimensionality")
    else:
        point = np.atleast_1d(np.asarray(b, dtype=np.float64))
    if geodetic:
        from .geog import geog_distance_spheroid
        return geog_distance_spheroid(a, b if point is None else point)
    return tdistance(a, b if point is None else point)
