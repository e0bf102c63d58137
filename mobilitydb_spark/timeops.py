"""Set operations + topological/position predicates on time types —
SURVEY §2.6 (`src/timeops.c`, 4081 LoC; SQL `11_timeops.in.sql`).

All kernels work on normalized ``list[Period]`` (PeriodSet) with
single-element lists standing in for Period and instantaneous periods
for timestamps — one code path for all 16 operand combinations, as
the reference's matrix of fmgr entries reduces to the same three
bound-merge kernels (union `:2468`, intersection `:2787`,
minus `:3265`; predicates `:40-2290`)."""

from __future__ import annotations

from .types import Period, normalize_periods


def union(a: list[Period], b: list[Period]) -> list[Period]:
    return normalize_periods(list(a) + list(b))


def intersection(a: list[Period], b: list[Period]) -> list[Period]:
    a = normalize_periods(a)
    b = normalize_periods(b)
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        inter = a[i].intersection(b[j])
        if inter is not None:
            out.append(inter)
        if (a[i].upper, a[i].upper_inc) < (b[j].upper, b[j].upper_inc):
            i += 1
        else:
            j += 1
    return out


def minus(a: list[Period], b: list[Period]) -> list[Period]:
    from .restrict import complement_periods
    return intersection(a, complement_periods(b))


# -- topological predicates (timeops.c:40-2290) -----------------------------

def contains(a: list[Period], b: list[Period]) -> bool:
    """a @> b: every instant of b lies in a (b minus a is empty)."""
    return minus(b, a) == []


def contained(a: list[Period], b: list[Period]) -> bool:
    return contains(b, a)


def overlaps(a: list[Period], b: list[Period]) -> bool:
    return len(intersection(a, b)) > 0


def before(a: list[Period], b: list[Period]) -> bool:
    """a <<# b: a strictly before b."""
    a = normalize_periods(a)
    b = normalize_periods(b)
    if not a or not b:
        return False
    pa, pb = a[-1], b[0]
    if pa.upper < pb.lower:
        return True
    return pa.upper == pb.lower and not (pa.upper_inc and pb.lower_inc)


def after(a: list[Period], b: list[Period]) -> bool:
    return before(b, a)


def overbefore(a: list[Period], b: list[Period]) -> bool:
    """a &<# b: a ends no later than b ends."""
    a = normalize_periods(a)
    b = normalize_periods(b)
    if not a or not b:
        return False
    return (a[-1].upper, a[-1].upper_inc) <= (b[-1].upper, b[-1].upper_inc)


def overafter(a: list[Period], b: list[Period]) -> bool:
    """a #&> b: a starts no earlier than b starts."""
    a = normalize_periods(a)
    b = normalize_periods(b)
    if not a or not b:
        return False
    return (a[0].lower, not a[0].lower_inc) >= (b[0].lower, not b[0].lower_inc)


def adjacent(a: list[Period], b: list[Period]) -> bool:
    """a -|- b: touch at a single bound without overlapping — exactly
    one of the meeting bounds is inclusive ([1,2) -|- [2,3], but
    [1,2) and (2,3] leave a gap and [1,2] ∩ [2,3] overlaps)."""
    a = normalize_periods(a)
    b = normalize_periods(b)
    if not a or not b or overlaps(a, b):
        return False
    if a[-1].upper == b[0].lower:
        return a[-1].upper_inc != b[0].lower_inc
    if b[-1].upper == a[0].lower:
        return b[-1].upper_inc != a[0].lower_inc
    return False


def period_shift(ps: list[Period], delta_us: int) -> list[Period]:
    return [Period(p.lower + delta_us, p.upper + delta_us,
                   p.lower_inc, p.upper_inc) for p in ps]
