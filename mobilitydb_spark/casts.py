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
        raise ValueError("Cannot transform input to a temporal instant")
    return Temporal(INSTANT, [tv.seqs[0]], tv.linear, tv.srid,
                    tv.step_default)


def to_instant_set(tv: Temporal) -> Temporal:
    if tv.duration in (INSTANT, INSTANTSET):
        return Temporal(INSTANTSET, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    if all(len(s.times) == 1 for s in tv.seqs):
        return Temporal(INSTANTSET, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    raise ValueError("Cannot transform input to a temporal instant set")


def to_sequence(tv: Temporal) -> Temporal:
    if tv.duration == INSTANT:
        return Temporal(SEQUENCE, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    if tv.duration == SEQUENCE:
        return tv
    if len(tv.seqs) == 1:
        return Temporal(SEQUENCE, tv.seqs, tv.linear, tv.srid,
                        tv.step_default)
    raise ValueError("Cannot transform input to a temporal sequence")


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
    (a linear tfloat cannot become a step tint, temporal.c:1090) —
    instants/instant sets have no interpolation and always cast
    (22-suite: tint(tfloat '1.5@2001-01-01') = 1@...)."""
    if tv.linear and tv.duration not in (INSTANT, INSTANTSET):
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


def tbox_make(xmin: float, xmax: float, tmin: int, tmax: int,
              has_x: bool = True, has_t: bool = True) -> TBox:
    b = TBox(xmin, xmax, tmin, tmax)
    object.__setattr__(b, "_has_x", has_x)
    object.__setattr__(b, "_has_t", has_t)
    return b


def _hx(b: TBox) -> bool:
    return getattr(b, "_has_x", True)


def _ht(b: TBox) -> bool:
    return getattr(b, "_has_t", True)


def tbox_overlaps(a: TBox, b: TBox) -> bool:
    """&& on the SHARED dimensions (`src/temporal_boxops.c:96-110`:
    x compared only when both boxes have x, t only when both have t;
    goldens `test/expected/32_temporal_boxops.test.out`)."""
    if _hx(a) and _hx(b):
        if a.xmax < b.xmin or a.xmin > b.xmax:
            return False
    if _ht(a) and _ht(b):
        if a.tmax < b.tmin or a.tmin > b.tmax:
            return False
    return True


def tbox_contains(a: TBox, b: TBox) -> bool:
    """@> on the shared dimensions (`temporal_boxops.c:51-63`)."""
    if _hx(a) and _hx(b):
        if b.xmin < a.xmin or b.xmax > a.xmax:
            return False
    if _ht(a) and _ht(b):
        if b.tmin < a.tmin or b.tmax > a.tmax:
            return False
    return True


def tbox_contained(a: TBox, b: TBox) -> bool:
    return tbox_contains(b, a)


def tbox_same(a: TBox, b: TBox) -> bool:
    """~= on the shared dimensions (`temporal_boxops.c:123-135`)."""
    if _hx(a) and _hx(b):
        if a.xmin != b.xmin or a.xmax != b.xmax:
            return False
    if _ht(a) and _ht(b):
        if a.tmin != b.tmin or a.tmax != b.tmax:
            return False
    return True


def tbox_cmp(a: TBox, b: TBox) -> int:
    """B-tree total order (`src/tbox.c:274-308` tbox_cmp_internal):
    shared-dimension minima first, then shared maxima; drives the
    <, <=, >, >= operators."""
    for ka, kb, shared in (
            (a.xmin, b.xmin, _hx(a) and _hx(b)),
            (a.tmin, b.tmin, _ht(a) and _ht(b)),
            (a.xmax, b.xmax, _hx(a) and _hx(b)),
            (a.tmax, b.tmax, _ht(a) and _ht(b))):
        if shared:
            if ka < kb:
                return -1
            if ka > kb:
                return 1
    return 0


def tbox_eq(a: TBox, b: TBox) -> bool:
    """= (`src/tbox.c:369-380` tbox_eq_internal): flag equality plus
    raw-field equality — unlike ~=, no shared-dimension projection."""
    if _hx(a) != _hx(b) or _ht(a) != _ht(b):
        return False
    return (a.xmin == b.xmin and a.tmin == b.tmin
            and a.xmax == b.xmax and a.tmax == b.tmax)


# position operators over the value (x) / time (t) dimension
# (`src/temporal_posops.c:32-...`; both operands must carry the dim —
# the SQL operator matrix guarantees it)

def tbox_of_literal(kind: str, lit: str) -> TBox:
    """Bounding TBox of a typed literal — the cast ladder behind the
    reference's boxops/posops operator matrix (`src/temporal_boxops.c`
    range_to_tbox/period_to_tbox/... :560-720).  ``kind`` is the SQL
    type name as written in the reference tests; ``num`` = a bare
    numeric literal."""
    import re as _re
    from .types import (parse_period, parse_periodset, parse_temporal,
                        parse_timestampset, parse_ts)
    if kind == "tbox":
        return parse_tbox(lit)
    if kind == "num":
        v = float(lit)
        return tbox_make(v, v, 0, 0, has_x=True, has_t=False)
    if kind in ("intrange", "floatrange"):
        # raw lower/upper datums become xmin/xmax (range_to_tbox,
        # temporal_boxops.c:599-614).  The 32-suite goldens show the
        # reference's '[1,3]'::intrange reaching range_to_tbox with
        # upper datum 3 (e.g. tint seqset up to 3 ~= intrange '[1,3]'
        # is t, :2395-2399) — i.e. NO discrete +1 canonicalization in
        # the tested build — so bounds are taken as written.
        m = _re.match(r"\s*([\[\(])\s*([-\d.]+)\s*,\s*([-\d.]+)\s*([\]\)])",
                      lit)
        lo, hi = float(m.group(2)), float(m.group(3))
        return tbox_make(lo, hi, 0, 0, has_x=True, has_t=False)
    if kind == "timestamptz":
        t = int(parse_ts(lit))
        return tbox_make(0.0, 0.0, t, t, has_x=False, has_t=True)
    if kind == "timestampset":
        ts = parse_timestampset(lit)
        return tbox_make(0.0, 0.0, int(min(ts)), int(max(ts)),
                         has_x=False, has_t=True)
    if kind == "period":
        p = parse_period(lit)
        return tbox_make(0.0, 0.0, int(p.lower), int(p.upper),
                         has_x=False, has_t=True)
    if kind == "periodset":
        ps = parse_periodset(lit)
        return tbox_make(0.0, 0.0, int(min(p.lower for p in ps)),
                         int(max(p.upper for p in ps)),
                         has_x=False, has_t=True)
    if kind in ("tbool", "ttext"):
        ts = [int(parse_ts(x)) for x in _re.findall(r"@([^,}\])]+)", lit)]
        return tbox_make(0.0, 0.0, min(ts), max(ts),
                         has_x=False, has_t=True)
    if kind in ("tint", "tfloat"):
        tv = parse_temporal(lit)
        return tnumber_to_tbox(tv)
    raise ValueError(f"unknown literal kind {kind!r}")


def tbox_left(a: TBox, b: TBox) -> bool:
    return a.xmax < b.xmin


def tbox_overleft(a: TBox, b: TBox) -> bool:
    return a.xmax <= b.xmax


def tbox_right(a: TBox, b: TBox) -> bool:
    return a.xmin > b.xmax


def tbox_overright(a: TBox, b: TBox) -> bool:
    return a.xmin >= b.xmin


def tbox_before(a: TBox, b: TBox) -> bool:
    return a.tmax < b.tmin


def tbox_overbefore(a: TBox, b: TBox) -> bool:
    return a.tmax <= b.tmax


def tbox_after(a: TBox, b: TBox) -> bool:
    return a.tmin > b.tmax


def tbox_overafter(a: TBox, b: TBox) -> bool:
    return a.tmin >= b.tmin


# ---------------------------------------------------------------------------
# TBOX literal in/out (`src/tbox.c` tbox_in/tbox_out; goldens
# `test/expected/21_tbox.test.out`) — error messages verbatim
# ---------------------------------------------------------------------------

def parse_tbox(s: str) -> "TBox":
    """Parse a TBOX literal 'TBOX((x, t), (x, t))' where either the
    value or the time slot may be empty; bounds auto-sorted."""
    import re
    from .boxops import _parse_double, _parse_ts_tok
    txt = s.strip()
    m = re.match(r"(?i)^TBOX\s*", txt)
    if not m:
        raise ValueError("Could not parse TBOX")
    rest = txt[m.end():]
    if not rest.startswith("(") or not rest[1:].lstrip().startswith("("):
        raise ValueError("Could not parse TBOX: Missing opening parenthesis")
    body = rest[1:].lstrip()

    def read_tuple(src: str):
        end = src.find(")")
        if end < 0:
            raise ValueError(
                "Could not parse TBOX: Missing closing parenthesis")
        fields = [f.strip() for f in src[1:end].split(",")]
        if len(fields) != 2:
            raise ValueError(
                "Could not parse TBOX: Missing closing parenthesis")
        x = _parse_double(fields[0]) if fields[0] != "" else None
        if x is None and fields[1] == "":
            raise ValueError(
                "Could not parse TBOX: Invalid input syntax for type double")
        t = _parse_ts_tok(fields[1]) if fields[1] != "" else None
        return x, t, src[end + 1:].lstrip()

    try:
        x1, t1, body = read_tuple(body)
    except ValueError as e:
        raise ValueError(str(e).replace("STBOX", "TBOX"))
    if not body.startswith(",") or not body[1:].lstrip().startswith("("):
        raise ValueError("Could not parse TBOX: Missing opening parenthesis")
    try:
        x2, t2, body = read_tuple(body[1:].lstrip())
    except ValueError as e:
        raise ValueError(str(e).replace("STBOX", "TBOX"))
    if not body.startswith(")"):
        raise ValueError("Could not parse TBOX: Missing closing parenthesis")
    # the reference parses the SECOND tuple under the first tuple's
    # hasx/hast flags (temporal_parser.c:160-246) — an asymmetric
    # tuple is an error there, never a silent dimension demotion
    if x1 is not None and x2 is None:
        raise ValueError(
            "Could not parse TBOX: Invalid input syntax for type double")
    if t1 is not None and t2 is None:
        raise ValueError("Could not parse TBOX")
    if x1 is None and x2 is not None:
        # 2nd tuple's x-text reaches the timestamp parser there
        raise ValueError("Could not parse TBOX")
    if t1 is None and t2 is not None:
        # with hast unset the parser expects ')' where the t starts
        raise ValueError(
            "Could not parse TBOX: Missing closing parenthesis")
    has_x = x1 is not None and x2 is not None
    has_t = t1 is not None and t2 is not None
    xmin, xmax = sorted((x1, x2)) if has_x else (float("nan"),) * 2
    tmin, tmax = sorted((t1, t2)) if has_t else (0, 0)
    b = TBox(xmin, xmax, tmin, tmax)
    object.__setattr__(b, "_has_x", has_x)
    object.__setattr__(b, "_has_t", has_t)
    return b


def tbox_out(b: "TBox") -> str:
    """Print a TBox in the reference literal format."""
    from .types import fmt_ts
    has_x = getattr(b, "_has_x", True)
    has_t = getattr(b, "_has_t", True)

    def tup(x, t):
        xs = f"{x:.15g}" if has_x else ""
        ts = fmt_ts(t) if has_t else ""
        return f"({xs},{ts})"

    return f"TBOX({tup(b.xmin, b.tmin)},{tup(b.xmax, b.tmax)})"
