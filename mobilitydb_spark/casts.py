"""Constructors-between-durations and casts — SURVEY §2.7
(`src/temporal.c:823-1234` constructors; `:1062-1126,1502` casts;
SQL cast decls `22_temporal.in.sql:304-319`,
`51_tpoint.in.sql:112-172`).

Duration conversions follow the reference's rules: widening is always
possible; narrowing only when the value actually fits (an InstantSet
of one instant → Instant, a SequenceSet of one sequence → Sequence,
else error)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .boxops import STBox
from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, Period, Seq,
                    Temporal)


# -- duration conversions ----------------------------------------------------

def to_instant(tv: Temporal) -> Temporal:
    if tv.num_instants() != 1:
        raise ValueError("cannot cast to Instant: more than one instant")
    return Temporal(INSTANT, [tv.seqs[0]], tv.linear, tv.srid,
                    tv.step_default)


def to_instant_set(tv: Temporal) -> Temporal:
    if tv.duration in (INSTANT, INSTANTSET):
        return Temporal(INSTANTSET, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    if all(len(s.times) == 1 for s in tv.seqs):
        return Temporal(INSTANTSET, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    raise ValueError("cannot cast continuous sequences to InstantSet")


def to_sequence(tv: Temporal) -> Temporal:
    if tv.duration == INSTANT:
        return Temporal(SEQUENCE, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    if tv.duration == SEQUENCE:
        return tv
    if len(tv.seqs) == 1:
        return Temporal(SEQUENCE, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    raise ValueError("cannot cast to Sequence: multiple components")


def to_sequence_set(tv: Temporal) -> Temporal:
    return Temporal(SEQUENCESET, tv.seqs, tv.linear, tv.srid,
                    tv.step_default)


# -- type casts ---------------------------------------------------------------

def tint_to_tfloat(tv: Temporal) -> Temporal:
    """tint → tfloat keeps stepwise interpolation (temporal.c:1062)."""
    out = Temporal(tv.duration, [Seq(s.times.copy(), s.values.copy(),
                                     s.lower_inc, s.upper_inc)
                                 for s in tv.seqs],
                   linear=False, srid=tv.srid, step_default=False)
    return out


def tfloat_to_tint(tv: Temporal) -> Temporal:
    """tfloat → tint truncates values; only valid for stepwise
    (a linear tfloat cannot become a step tint, temporal.c:1090)."""
    if tv.linear:
        raise ValueError("cannot cast linear tfloat to tint")
    seqs = [Seq(s.times.copy(), np.trunc(s.values), s.lower_inc, s.upper_inc)
            for s in tv.seqs]
    return Temporal(tv.duration, seqs, False, tv.srid, True)


def to_period(tv: Temporal) -> Period:
    """temporal → period (bounding, temporal.c:1502)."""
    return tv.period()


@dataclass(frozen=True)
class TBox:
    """value × time box for tnumber (`include/temporal.h:107-114`)."""
    xmin: float
    xmax: float
    tmin: int
    tmax: int

    def expand(self, d: float, dt_us: int = 0) -> "TBox":
        return TBox(self.xmin - d, self.xmax + d,
                    self.tmin - dt_us, self.tmax + dt_us)


def tnumber_to_tbox(tv: Temporal) -> TBox:
    assert tv.dim == 1
    return TBox(float(tv.values.min()), float(tv.values.max()),
                tv.start_timestamp(), tv.end_timestamp())


def tpoint_to_stbox(tv: Temporal) -> STBox:
    return STBox.of(tv)


def tgeompoint_to_tgeogpoint(tv: Temporal) -> Temporal:
    """geometry(4326 planar) → geography: same coordinates, geodetic
    interpretation — distance/length switch to haversine meters
    (documented divergence from PostGIS ellipsoid,
    `tpoint_spatialfuncs.c:902-904`)."""
    out = Temporal(tv.duration, tv.seqs, tv.linear, 4326, tv.step_default)
    return out


def tbox_overlaps(a: TBox, b: TBox) -> bool:
    return (a.xmin <= b.xmax and b.xmin <= a.xmax
            and a.tmin <= b.tmax and b.tmin <= a.tmax)


def tbox_contains(a: TBox, b: TBox) -> bool:
    return (a.xmin <= b.xmin and b.xmax <= a.xmax
            and a.tmin <= b.tmin and b.tmax <= a.tmax)
