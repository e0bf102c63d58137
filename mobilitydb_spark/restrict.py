"""Restriction family: at/minus {timestamp, set, period, periodset,
value(s), range} — SURVEY §2.2.

Semantics follow the reference (`src/temporal.c:2436-3208`):
- restriction to a time domain splits sequences and fixes bound
  inclusivity (`temporal.c:2936-3108` at/minus Period/PeriodSet)
- restriction to values computes exact crossing timestamps on linear
  segments (`temporal.c:2436` atValue; `point/src/tpoint.c:801`)
- ``minus`` = restriction to the complement of the domain
- exclusive bounds store their bound instant (value = limit value),
  matching the reference's sequence representation

All kernels are pure numpy over the ``types.Temporal`` model; Spark
integration wraps them batch-wise (see spark_temporal.py).
"""

from __future__ import annotations

import numpy as np

from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, EPSILON,
                    Period, Seq, Temporal, normalize_periods)

TS_MIN = np.iinfo(np.int64).min + 1
TS_MAX = np.iinfo(np.int64).max - 1


def complement_periods(periods: list[Period]) -> list[Period]:
    """Complement of a normalized period list within (TS_MIN, TS_MAX)."""
    out = []
    cur_lo, cur_inc = TS_MIN, True
    for p in normalize_periods(periods):
        if (p.lower, not p.lower_inc) > (cur_lo, not cur_inc):
            out.append(Period(cur_lo, p.lower, cur_inc, not p.lower_inc))
        cur_lo, cur_inc = p.upper, not p.upper_inc
    if cur_lo < TS_MAX:
        out.append(Period(cur_lo, TS_MAX, cur_inc, True))
    return out


def _result_duration(orig: Temporal, seqs: list[Seq],
                     force_set: bool = False) -> Temporal | None:
    """Wrap restricted sequences with a reference-faithful duration tag:
    time restriction preserves the input's duration class (atPeriod of
    a Sequence is a Sequence, of a SequenceSet a SequenceSet —
    `temporal.c:2936+`); value restriction of continuous durations
    always yields a SequenceSet (``force_set``, cf. atValue/atRange
    golden outputs)."""
    if not seqs:
        return None
    if orig.duration == INSTANT:
        dur = INSTANT
    elif orig.duration == INSTANTSET:
        dur = INSTANTSET
    elif orig.duration == SEQUENCE:
        dur = SEQUENCESET if (force_set or len(seqs) > 1) else SEQUENCE
    else:
        dur = SEQUENCESET
    return Temporal(dur, seqs, orig.linear, orig.srid,
                    orig.step_default)


def _clip_seq(seq: Seq, p: Period, linear: bool) -> Seq | None:
    """Clip one sequence to one period (core of atPeriod,
    `temporal.c:2936`): interpolate new bound instants, intersect
    inclusivity."""
    inter = seq.period.intersection(p)
    if inter is None:
        return None
    a, b = inter.lower, inter.upper
    if a == b:
        v = _value_at_seq(seq, a, linear)
        if v is None:
            return None
        return Seq(np.array([a]), v[None, :], True, True)
    mask = (seq.times > a) & (seq.times < b)
    times = [np.array([a], dtype=np.int64), seq.times[mask],
             np.array([b], dtype=np.int64)]
    va = _value_at_seq(seq, a, linear)
    vb = _value_at_seq(seq, b, linear)
    if not linear and not inter.upper_inc:
        # excluded upper endpoint stores the LEFT limit: for stepwise,
        # the previous segment's value, not the instant's own value
        # (cf. minusValue golden: `{[2@.., 2@..)}` not `{[2@.., 1@..)}`)
        j = int(np.searchsorted(seq.times, b, side="left"))
        if j < len(seq.times) and seq.times[j] == b and j > 0:
            vb = seq.values[j - 1].copy()
    values = [va[None, :], seq.values[mask], vb[None, :]]
    return Seq(np.concatenate(times), np.vstack(values),
               inter.lower_inc, inter.upper_inc)


def _value_at_seq(seq: Seq, t: int, linear: bool) -> np.ndarray | None:
    if t < seq.times[0] or t > seq.times[-1]:
        return None
    i = int(np.searchsorted(seq.times, t, side="right")) - 1
    if seq.times[i] == t:
        return seq.values[i].copy()
    if not linear:
        return seq.values[i].copy()
    t0, t1 = seq.times[i], seq.times[i + 1]
    ratio = (t - t0) / (t1 - t0)
    return seq.values[i] + (seq.values[i + 1] - seq.values[i]) * ratio


# ---------------------------------------------------------------------------
# time-domain restriction
# ---------------------------------------------------------------------------

def at_periodset(tv: Temporal, periods: list[Period],
                 force_set: bool = False) -> Temporal | None:
    """Restrict to a normalized period list (atPeriodSet,
    `temporal.c:3033`)."""
    periods = normalize_periods(periods)
    out: list[Seq] = []
    discrete = tv.duration in (INSTANT, INSTANTSET)
    for s in tv.seqs:
        if discrete:
            t = int(s.times[0])
            if any(p.contains_ts(t) for p in periods):
                out.append(Seq(s.times.copy(), s.values.copy()))
        else:
            for p in periods:
                c = _clip_seq(s, p, tv.linear)
                if c is not None:
                    out.append(c)
    return _result_duration(tv, out, force_set=force_set)


def minus_periodset(tv: Temporal, periods: list[Period]) -> Temporal | None:
    # minus on a Sequence always yields a SequenceSet (golden:
    # minusPeriod/minusTimestamp print `{…}` even for one piece)
    return at_periodset(tv, complement_periods(periods), force_set=True)


def at_period(tv: Temporal, p: Period) -> Temporal | None:
    return at_periodset(tv, [p])


def minus_period(tv: Temporal, p: Period) -> Temporal | None:
    return minus_periodset(tv, [p])


def at_timestamp(tv: Temporal, t: int) -> Temporal | None:
    """atTimestamp → Instant (temporal.c:2869)."""
    v = tv.value_at(t)
    if v is None:
        return None
    out = Temporal.instant(t, v, tv.srid, tv.linear)
    out.step_default = tv.step_default
    return out


def minus_timestamp(tv: Temporal, t: int) -> Temporal | None:
    return minus_periodset(tv, [Period(t, t, True, True)])


def at_timestampset(tv: Temporal, ts: list[int]) -> Temporal | None:
    """atTimestampSet → InstantSet of the defined samples
    (temporal.c:2971)."""
    seqs = []
    for t in sorted(ts):
        v = tv.value_at(int(t))
        if v is not None:
            seqs.append(Seq(np.array([t], dtype=np.int64), v[None, :]))
    if not seqs:
        return None
    dur = INSTANT if len(seqs) == 1 else INSTANTSET
    return Temporal(dur, seqs, tv.linear, tv.srid, tv.step_default)


def minus_timestampset(tv: Temporal, ts: list[int]) -> Temporal | None:
    return minus_periodset(tv, [Period(int(t), int(t)) for t in ts])


def intersects_period(tv: Temporal, p: Period) -> bool:
    return any(s.period.overlaps(p) for s in tv.seqs)


def intersects_timestamp(tv: Temporal, t: int) -> bool:
    return any(s.period.contains_ts(t) for s in tv.seqs)


# ---------------------------------------------------------------------------
# value-domain restriction
# ---------------------------------------------------------------------------

def _segment_value_crossings(v0: np.ndarray, v1: np.ndarray, t0: int, t1: int,
                             target: np.ndarray) -> list[int]:
    """Timestamps strictly inside (t0, t1) where the linear segment
    passes through ``target`` (all dims).  Closed form, cf.
    ``tlinearseq_intersection_value`` (`src/temporalseq.c:1925`)."""
    dv = v1 - v0
    if np.all(np.abs(dv) <= 0):
        return []
    # parametric solve per dim; all dims must agree
    ratios = []
    for d in range(len(v0)):
        if dv[d] == 0.0:
            if abs(v0[d] - target[d]) > EPSILON:
                return []
            continue
        ratios.append((target[d] - v0[d]) / dv[d])
    if not ratios:
        return []
    r = ratios[0]
    if any(abs(r2 - r) > EPSILON for r2 in ratios[1:]):
        return []
    if r <= 0.0 or r >= 1.0:
        return []
    t = int(round(t0 + (t1 - t0) * r))
    return [t] if t0 < t < t1 else []


def at_values(tv: Temporal, targets: np.ndarray) -> Temporal | None:
    """atValues (temporal.c:2498): keep instants + exact crossing
    instants where the value equals any target; constant segments at a
    target value are kept whole."""
    targets = np.atleast_2d(np.asarray(targets, dtype=np.float64))
    if targets.size == 0:
        # empty target array restricts to nothing (an empty np.all
        # would vacuously match EVERY value instead)
        return None
    out: list[Seq] = []
    discrete_in = tv.duration in (INSTANT, INSTANTSET)
    for s in tv.seqs:
        n = len(s.times)
        if discrete_in or n == 1:
            v = s.values[0]
            if any(np.all(np.abs(v - tg) <= EPSILON) for tg in targets):
                out.append(Seq(s.times.copy(), s.values.copy()))
            continue
        if not tv.linear:
            # stepwise: value v_i holds on [t_i, t_{i+1}); emit constant pieces
            for i in range(n - 1):
                v = s.values[i]
                if any(np.all(np.abs(v - tg) <= EPSILON) for tg in targets):
                    lo_inc = s.lower_inc if i == 0 else True
                    out.append(Seq(s.times[i:i + 2], np.vstack([v, v]),
                                   lo_inc, False))
            v = s.values[-1]
            if s.upper_inc and any(np.all(np.abs(v - tg) <= EPSILON)
                                   for tg in targets):
                out.append(Seq(s.times[-1:], s.values[-1:]))
            continue
        # linear: instants at targets + interior crossings + constant segs
        for i in range(n - 1):
            v0, v1 = s.values[i], s.values[i + 1]
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            const = np.all(np.abs(v1 - v0) <= 0)
            for tg in targets:
                if const and np.all(np.abs(v0 - tg) <= EPSILON):
                    lo_inc = s.lower_inc if i == 0 else True
                    hi_inc = s.upper_inc if i == n - 2 else False
                    out.append(Seq(s.times[i:i + 2], np.vstack([v0, v0]),
                                   lo_inc, hi_inc))
                    continue
                if np.all(np.abs(v0 - tg) <= EPSILON):
                    if i > 0 or s.lower_inc:
                        out.append(Seq(s.times[i:i + 1], v0[None, :]))
                if i == n - 2 and np.all(np.abs(v1 - tg) <= EPSILON) \
                        and s.upper_inc:
                    out.append(Seq(s.times[i + 1:i + 2], v1[None, :]))
                for t in _segment_value_crossings(v0, v1, t0, t1, tg):
                    out.append(Seq(np.array([t], dtype=np.int64),
                                   (v0 + (v1 - v0)
                                    * ((t - t0) / (t1 - t0)))[None, :]))
    if not out:
        return None
    # sort; dedupe repeated instants; close open bounds when an instant
    # coincides (value-equal) with the preceding segment's end — matches
    # the reference's normalization of atValue results
    out.sort(key=lambda s: (int(s.times[0]), int(s.times[-1])))
    dedup: list[Seq] = []
    for s in out:
        if dedup and len(s.times) == 1:
            prev = dedup[-1]
            if prev.times[-1] == s.times[0]:
                if np.all(np.abs(prev.values[-1] - s.values[0]) <= EPSILON):
                    if len(prev.times) > 1 and not prev.upper_inc:
                        dedup[-1] = Seq(prev.times, prev.values,
                                        prev.lower_inc, True)
                    continue
        dedup.append(s)
    return _result_duration(tv, dedup, force_set=True)


def at_value(tv: Temporal, value) -> Temporal | None:
    return at_values(tv, np.atleast_2d(np.asarray(value, dtype=np.float64)))


def minus_value(tv: Temporal, value) -> Temporal | None:
    """minusValue = at complement of the value's time support."""
    hit = at_value(tv, value)
    if hit is None:
        return tv
    return minus_periodset(tv, hit.get_time())


def minus_values(tv: Temporal, targets: np.ndarray) -> Temporal | None:
    """minusValues (temporal.c:2540): complement of atValues."""
    hit = at_values(tv, targets)
    if hit is None:
        return tv
    return minus_periodset(tv, hit.get_time())


def at_range(tv: Temporal, lo: float, hi: float,
             lo_inc: bool = True, hi_inc: bool = True,
             step_seq_quirk: bool = False) -> Temporal | None:
    """atRange for tnumber (temporal.c:2583): clip the value dimension.

    Linear segments are solved for the sub-interval of t where the
    value lies in [lo, hi]; the clip instants get interpolated values.

    `step_seq_quirk=True` replicates the reference's step-sequence
    behavior verbatim: tnumberseq_at_range2 (temporalseq.c:2771-2800)
    loops over segments testing only each segment's START value, so
    the final instant's own value is never examined even when
    upper_inc — a documented reference quirk (see the _is_quirk note
    in tests/test_temporal22_suite.py).  The default keeps the final
    instantaneous value, consistent with valueAtTimestamp/atValue.
    """
    assert tv.dim == 1, "atRange applies to tnumber"
    periods: list[Period] = []
    for s in tv.seqs:
        n = len(s.times)
        if n == 1 or tv.duration in (INSTANT, INSTANTSET):
            v = float(s.values[0, 0])
            if (lo < v < hi) or (lo_inc and v == lo) or (hi_inc and v == hi):
                t = int(s.times[0])
                periods.append(Period(t, t))
            continue
        if not tv.linear:
            for i in range(n - 1):
                v = float(s.values[i, 0])
                if (lo < v < hi) or (lo_inc and v == lo) or (hi_inc and v == hi):
                    periods.append(Period(int(s.times[i]), int(s.times[i + 1]),
                                          True, False))
            v = float(s.values[-1, 0])
            if not step_seq_quirk and s.upper_inc and (
                    (lo < v < hi) or (lo_inc and v == lo)
                    or (hi_inc and v == hi)):
                t = int(s.times[-1])
                periods.append(Period(t, t))
            continue
        for i in range(n - 1):
            v0, v1 = float(s.values[i, 0]), float(s.values[i + 1, 0])
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            if v0 == v1:
                if (lo < v0 < hi) or (lo_inc and v0 == lo) or (hi_inc and v0 == hi):
                    periods.append(Period(t0, t1))
                continue
            # t where value == c: t0 + (c - v0)/(v1 - v0) * (t1 - t0)
            def t_of(c):
                return t0 + (c - v0) / (v1 - v0) * (t1 - t0)
            # A clip bound produced by a RANGE-BOUND crossing inherits
            # the range bound's inclusivity (exclusive range bound →
            # exclusive period bound); a segment endpoint whose value
            # sits strictly inside the range stays closed, but one that
            # equals a range bound ALSO inherits that bound's
            # inclusivity (the reference ANDs lower_incl with
            # lower_inc(intersect), tnumberseq_at_range1).
            if v0 < v1:
                a, a_inc = ((max(t0, int(np.ceil(t_of(lo)))), True)
                            if lo_inc else (int(round(t_of(lo))), False)) \
                    if v0 < lo else (t0, lo_inc if v0 == lo else True)
                b, b_inc = ((min(t1, int(np.floor(t_of(hi)))), True)
                            if hi_inc else (int(round(t_of(hi))), False)) \
                    if v1 > hi else (t1, hi_inc if v1 == hi else True)
            else:
                a, a_inc = ((max(t0, int(np.ceil(t_of(hi)))), True)
                            if hi_inc else (int(round(t_of(hi))), False)) \
                    if v0 > hi else (t0, hi_inc if v0 == hi else True)
                b, b_inc = ((min(t1, int(np.floor(t_of(lo)))), True)
                            if lo_inc else (int(round(t_of(lo))), False)) \
                    if v1 < lo else (t1, lo_inc if v1 == lo else True)
            if a < b or (a == b and a_inc and b_inc):
                periods.append(Period(a, b, a_inc, b_inc))
    if not periods:
        return None
    return at_periodset(tv, periods, force_set=True)


def at_min(tv: Temporal) -> Temporal | None:
    """atMin (temporal.c:2765)."""
    return at_value(tv, tv.min_value())


def at_max(tv: Temporal) -> Temporal | None:
    return at_value(tv, tv.max_value())


def minus_min(tv: Temporal) -> Temporal | None:
    return minus_value(tv, tv.min_value())


def minus_max(tv: Temporal) -> Temporal | None:
    return minus_value(tv, tv.max_value())


def at_ranges(tv: Temporal, ranges,
              step_seq_quirk: bool = False) -> Temporal | None:
    """atRanges (temporal.c:2630): restrict to the UNION of numeric
    ranges — each range's clip periods, normalized together.  A range
    is (lo, hi[, lo_inc[, hi_inc]])."""
    assert tv.dim == 1, "atRanges applies to tnumber"
    periods: list[Period] = []
    for r in ranges:
        lo, hi = float(r[0]), float(r[1])
        lo_inc = bool(r[2]) if len(r) > 2 else True
        hi_inc = bool(r[3]) if len(r) > 3 else True
        got = at_range(tv, lo, hi, lo_inc, hi_inc,
                       step_seq_quirk=step_seq_quirk)
        if got is not None:
            periods.extend(got.get_time())
    if not periods:
        return None
    return at_periodset(tv, periods, force_set=True)


def minus_range(tv: Temporal, lo: float, hi: float,
                lo_inc: bool = True, hi_inc: bool = True,
                step_seq_quirk: bool = False) -> Temporal | None:
    """minusRange (temporal.c:2660): complement of atRange."""
    return minus_ranges(tv, [(lo, hi, lo_inc, hi_inc)],
                        step_seq_quirk=step_seq_quirk)


def minus_ranges(tv: Temporal, ranges,
                 step_seq_quirk: bool = False) -> Temporal | None:
    """minusRanges (temporal.c:2694): complement of atRanges."""
    hit = at_ranges(tv, ranges, step_seq_quirk=step_seq_quirk)
    if hit is None:
        return tv
    return minus_periodset(tv, hit.get_time())
