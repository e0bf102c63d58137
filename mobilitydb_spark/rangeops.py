"""Numeric range extension operators — SURVEY §2.6 second row
(`src/rangetypes_ext.c:204-570`): <<, >>, &<, &>, -|- between
int/float ranges and elements, with PostgreSQL bound semantics.

Goldens: `test/expected/07_rangetype_ext.test.out` (all 40 cases).
Adjacency uses continuous bound semantics (touching bounds with the
range side exclusive); the reference's int-range canonicalization is
applied at parse time for intrange literals.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class NumRange:
    lower: float
    upper: float
    lower_inc: bool
    upper_inc: bool
    empty: bool = False

    @staticmethod
    def parse(text: str, int_range: bool = False) -> "NumRange":
        s = text.strip()
        if s.lower() == "empty":
            return NumRange(0.0, 0.0, False, False, empty=True)
        if not s or s[0] not in "[(" or s[-1] not in "])":
            raise ValueError("Could not parse range")
        lo_inc, hi_inc = s[0] == "[", s[-1] == "]"
        lo_s, hi_s = [p.strip() for p in s[1:-1].split(",")]
        lo, hi = float(lo_s), float(hi_s)
        if int_range:
            # canonical [a, b): '[3,5]' -> [3,6), '(3,5)' -> [4,5)
            if not lo_inc:
                lo, lo_inc = lo + 1, True
            if hi_inc:
                hi, hi_inc = hi + 1, False
        if lo > hi or (lo == hi and not (lo_inc and hi_inc)):
            return NumRange(0.0, 0.0, False, False, empty=True)
        return NumRange(lo, hi, lo_inc, hi_inc)


def _as_range(v) -> NumRange:
    if isinstance(v, NumRange):
        return v
    x = float(v)
    return NumRange(x, x, True, True)


def range_left(a, b) -> bool:
    """a << b: a strictly before b."""
    ra, rb = _as_range(a), _as_range(b)
    if ra.empty or rb.empty:
        return False
    return (ra.upper < rb.lower
            or (ra.upper == rb.lower
                and not (ra.upper_inc and rb.lower_inc)))


def range_right(a, b) -> bool:
    """a >> b: a strictly after b."""
    return range_left(b, a)


def range_overleft(a, b) -> bool:
    """a &< b: a does not extend to the right of b.  The elem
    extension ops compare plain bound VALUES (rangetypes_ext.c:
    elem_overleft_range / range_overleft_elem golden rows)."""
    ra, rb = _as_range(a), _as_range(b)
    if ra.empty or rb.empty:
        return False
    return ra.upper <= rb.upper


def range_overright(a, b) -> bool:
    """a &> b: a does not extend to the left of b (plain bound
    values, like &<)."""
    ra, rb = _as_range(a), _as_range(b)
    if ra.empty or rb.empty:
        return False
    return ra.lower >= rb.lower


def range_adjacent(a, b) -> bool:
    """a -|- b: bounds touch without overlap."""
    ra, rb = _as_range(a), _as_range(b)
    if ra.empty or rb.empty:
        return False
    return ((ra.upper == rb.lower
             and ra.upper_inc != rb.lower_inc)
            or (rb.upper == ra.lower
                and rb.upper_inc != ra.lower_inc))
