"""FULL reference point-layer box/position-op suites run verbatim:
58_tpoint_boxops (1114 cases) + 60_tpoint_posops (1632 cases) — the
`&& @> <@ ~=` bbox ops and all 16 x/y/z/t position ops over the whole
stbox / geometry / geography / tgeompoint / tgeogpoint / timestamptz /
timestampset / period / periodset operand-order matrix, plus the
::stbox cast ladder, stbox(geo, time) constructors and
expandSpatial/expandTemporal — including the SRID / dimensionality /
geodetic-mismatch / missing-dimension ERROR and NULL blocks
(`point/test/expected/{58_tpoint_boxops,60_tpoint_posops}.test.out`
via scripts/port_58_60_goldens.py).

The per-wrapper precondition sequences mirror
`point/src/tpoint_boxops.c:246-960` and
`point/src/tpoint_posops.c:38-1974` exactly — including the
reference's quirk that `back_geom_tpoint` (geometry <</ tpoint... />>)
performs no SRID check (tpoint_posops.c:683-699) while its 15
siblings do.
"""

import json
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import parse_interval_us  # noqa: E402
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark import boxops  # noqa: E402
from mobilitydb_spark.boxops import (STBox, expand_spatial,  # noqa: E402
                                     expand_temporal, geo_stbox,
                                     parse_stbox, stbox_out, tpoint_stbox)
from mobilitydb_spark.types import (Temporal, parse_period,  # noqa: E402
                                    parse_periodset, parse_temporal,
                                    parse_timestampset, parse_ts)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "tpoint_boxposops_58_60.json")

# operator → (predicate, axis) — axis drives the precondition set
BOX_OPS = {"&&": boxops.overlaps, "@>": boxops.contains,
           "<@": boxops.contained, "~=": boxops.same}
POS_OPS = {
    "<<": (boxops.left, "x"), "&<": (boxops.overleft, "x"),
    ">>": (boxops.right, "x"), "&>": (boxops.overright, "x"),
    "<<|": (boxops.below, "y"), "&<|": (boxops.overbelow, "y"),
    "|>>": (boxops.above, "y"), "|&>": (boxops.overabove, "y"),
    "<</": (boxops.front, "z"), "&</": (boxops.overfront, "z"),
    "/>>": (boxops.back, "z"), "/&>": (boxops.overback, "z"),
    "<<#": (boxops.before, "t"), "&<#": (boxops.overbefore, "t"),
    "#>>": (boxops.after, "t"), "#&>": (boxops.overafter, "t"),
}
# longest-first so '<<|' wins over '<<' and '<<#' over '<<'
ALL_OPS = sorted(list(BOX_OPS) + list(POS_OPS), key=len, reverse=True)

GEO_RE = re.compile(r"^(geometry|geography)\s+'([^']*)'$", re.IGNORECASE)
PT_RE = re.compile(r"^Point\s*\(([-\d. ]+)\)$", re.IGNORECASE)


class Err(Exception):
    """Replicated reference elog/ereport."""


class GeoOp:
    def __init__(self, coords, dim, geodetic, srid):
        self.coords, self.dim = coords, dim
        self.geodetic, self.srid = geodetic, srid


class TimeOp:
    """timestamptz/timestampset/period/periodset operand → T-only box."""

    def __init__(self, tmin, tmax):
        self.tmin, self.tmax = tmin, tmax


def parse_geo(tok):
    m = GEO_RE.match(tok.strip())
    if not m:
        return None
    geodetic = m.group(1).lower() == "geography"
    lit = m.group(2).strip()
    srid = 4326 if geodetic else 0
    sm = re.match(r"SRID\s*=\s*(\d+)\s*;\s*(.*)$", lit, re.IGNORECASE)
    if sm:
        srid, lit = int(sm.group(1)), sm.group(2).strip()
    if re.fullmatch(r"Point\s+empty", lit, re.IGNORECASE):
        return GeoOp([], 2, geodetic, srid)
    if re.fullmatch(r"Point\s+Z\s+empty", lit, re.IGNORECASE):
        return GeoOp([], 3, geodetic, srid)
    pm = PT_RE.match(lit)
    if pm:
        coords = [[float(c) for c in pm.group(1).split()]]
        return GeoOp(coords, len(coords[0]), geodetic, srid)
    raise ValueError(f"unparsed geo literal {lit!r}")


def parse_operand(tok):
    tok = tok.strip()
    if tok.endswith("::stbox"):
        b = to_box(parse_operand(tok[:-len("::stbox")]))
        # an empty-geometry cast inside an operand yields SQL NULL and
        # the whole operator returns NULL — modelled by the caller
        return b
    if re.match(r"(?i)^stbox\s+'", tok):
        return parse_stbox(tok[tok.index("'") + 1:tok.rindex("'")])
    g = parse_geo(tok)
    if g is not None:
        return g
    if tok.startswith(("tgeompoint", "tgeogpoint")):
        tv = parse_tpoint(tok)
        tv._geodetic = tok.startswith("tgeogpoint")
        return tv
    m = re.match(r"(?i)^(timestamptz|timestampset|periodset|period)\s+"
                 r"'((?:[^']|'')*)'$", tok)
    if m:
        kind, lit = m.group(1).lower(), m.group(2)
        if kind == "timestamptz":
            t = int(parse_ts(lit))
            return TimeOp(t, t)
        if kind == "timestampset":
            ts = parse_timestampset(lit)
            return TimeOp(min(ts), max(ts))
        if kind == "period":
            p = parse_period(lit)
            return TimeOp(p.lower, p.upper)
        ps = parse_periodset(lit)
        return TimeOp(min(p.lower for p in ps), max(p.upper for p in ps))
    raise ValueError(f"unparsed operand {tok!r}")


def to_box(v):
    if isinstance(v, STBox):
        return v
    if isinstance(v, GeoOp):
        return geo_stbox(v.coords, v.dim, v.geodetic)
    if isinstance(v, Temporal):
        return tpoint_stbox(v, geodetic=getattr(v, "_geodetic", False))
    if isinstance(v, TimeOp):
        return STBox(float("nan"), float("nan"), float("nan"),
                     float("nan"), v.tmin, v.tmax, has_x=False)
    raise TypeError(type(v))


def _z_or_zero(b: STBox) -> STBox:
    """C STBOX structs are palloc0'd: a missing z reads 0.0 in the
    position-op internals (tpoint_posops.c works on raw doubles)."""
    if b.zmin is not None:
        return b
    return STBox(b.xmin, b.xmax, b.ymin, b.ymax, b.tmin, b.tmax,
                 0.0, 0.0, has_x=b.has_x, has_t=b.has_t,
                 geodetic=b.geodetic, zflag=False)


def _check_tpoint_geo(tv, g, axis, op_name, geo_left):
    """ensure_* sequence of the {geom,tpoint} wrappers."""
    srid_check = not (geo_left and op_name == "/>>" and axis == "z")
    # ^ reference quirk: back_geom_tpoint alone omits ensure_same_srid
    #   (tpoint_posops.c:683-699)
    if srid_check and tv.srid != g.srid:
        raise Err("The temporal point and the geometry must be in the "
                  "same SRID")
    if axis == "z":
        if tv.dim <= 2:
            raise Err("The temporal point must have Z dimension")
        if g.dim <= 2:
            raise Err("The geometry must have Z dimension")
    else:
        if (tv.dim > 2) != (g.dim > 2):
            raise Err("The temporal point and the geometry must be of "
                      "the same dimensionality")


def _check_tpoint_tpoint(a, b, axis):
    if a.srid != b.srid:
        raise Err("The temporal points must be in the same SRID")
    if axis == "z":
        if a.dim <= 2 or b.dim <= 2:
            raise Err("The temporal point must have Z dimension")
    elif (a.dim > 2) != (b.dim > 2):
        raise Err("The temporal points must be of the same "
                  "dimensionality")


def eval_op(op, left, right):
    """Dispatch one infix box/position operator with the reference's
    per-operand-class precondition sequences; returns bool or None
    (SQL NULL), raises Err for elog cases."""
    axis = None
    if op in POS_OPS:
        fn, axis = POS_OPS[op]
    else:
        fn = BOX_OPS[op]

    lt, rt = type(left).__name__, type(right).__name__

    def is_tp(v):
        return isinstance(v, Temporal)

    # --- tpoint vs geometry/geography ---------------------------------
    if (is_tp(left) and isinstance(right, GeoOp)) or \
            (isinstance(left, GeoOp) and is_tp(right)):
        tv = left if is_tp(left) else right
        g = right if is_tp(left) else left
        if axis in (None, "x", "y", "z"):
            _check_tpoint_geo(tv, g, axis or "xy", op,
                              geo_left=isinstance(left, GeoOp))
        gb = to_box(g)
        if gb is None:
            return None  # empty geometry → SQL NULL
        a, b = (to_box(left), gb) if is_tp(left) else (gb, to_box(right))
        if axis == "z":
            a, b = _z_or_zero(a), _z_or_zero(b)
        return fn(a, b)

    # --- tpoint vs tpoint ---------------------------------------------
    if is_tp(left) and is_tp(right):
        if axis in (None, "x", "y", "z"):
            _check_tpoint_tpoint(left, right, axis or "xy")
        a, b = to_box(left), to_box(right)
        if axis == "z":
            a, b = _z_or_zero(a), _z_or_zero(b)
        return fn(a, b)

    # --- stbox vs stbox -----------------------------------------------
    if isinstance(left, STBox) and isinstance(right, STBox):
        if axis != "t" and left.geodetic != right.geodetic:
            raise Err("Cannot compare geodetic and non-geodetic boxes")
        if axis in ("x", "y") and not (left.has_x and right.has_x):
            return None
        if axis == "z" and not (left.z_flag and right.z_flag):
            return None
        if axis == "t" and not (left.has_t and right.has_t):
            return None
        a, b = left, right
        if axis == "z":
            a, b = _z_or_zero(a), _z_or_zero(b)
        return fn(a, b)

    # --- stbox vs tpoint (either order) -------------------------------
    if isinstance(left, STBox) or isinstance(right, STBox):
        box = left if isinstance(left, STBox) else right
        if axis in ("x", "y") and not box.has_x:
            return None
        if axis == "z" and not box.z_flag:
            return None
        if axis == "t" and not box.has_t:
            return None
        a, b = to_box(left), to_box(right)
        if axis == "z":
            a, b = _z_or_zero(a), _z_or_zero(b)
        if isinstance(left, STBox) and axis in ("x", "y", "z"):
            # reference defect mirrored verbatim: every spatial
            # *_stbox_tpoint wrapper calls the internal with the
            # temporal box FIRST — `left_stbox_stbox_internal(&box1,
            # box)` (tpoint_posops.c:1239-1466) — so `stbox << tpoint`
            # actually computes tpoint-left-of-stbox; the temporal
            # wrappers (before/after) pass (box, &box1) correctly
            a, b = b, a
        return fn(a, b)

    # --- time operands (generic temporal layer: T dimension only) -----
    a, b = to_box(left), to_box(right)
    return fn(a, b)


FN_RE = re.compile(r"^(\w+)\((.*)\)$", re.S)


def split_args(argtext):
    out, depth, q, start = [], 0, False, 0
    for k, ch in enumerate(argtext):
        if ch == "'":
            q = not q
        if q:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(argtext[start:k].strip())
            start = k + 1
    out.append(argtext[start:].strip())
    return out


def split_infix(expr):
    """Split `LHS <op> RHS` at the top level (quote-aware; the .out
    occasionally omits spaces around the operator)."""
    q = False
    for k, ch in enumerate(expr):
        if ch == "'":
            q = not q
            continue
        if q:
            continue
        for op in ALL_OPS:
            if expr.startswith(op, k):
                # '<<' must not match inside '<<|' etc. — ALL_OPS is
                # longest-first so the first hit at position k wins
                return expr[:k].strip(), op, expr[k + len(op):].strip()
    return None


def eval_case(expr):
    expr = expr.strip()
    m = FN_RE.match(expr)
    if m and m.group(1).lower() in ("stbox", "expandspatial",
                                    "expandtemporal"):
        fname = m.group(1).lower()
        args = split_args(m.group(2))
        if fname == "stbox":
            g = parse_geo(args[0])
            gb = geo_stbox(g.coords, g.dim, g.geodetic)
            if gb is None:
                return None
            t = parse_operand(args[1])
            return STBox(gb.xmin, gb.xmax, gb.ymin, gb.ymax,
                         t.tmin, t.tmax, gb.zmin, gb.zmax,
                         geodetic=gb.geodetic, zflag=gb.zflag)
        arg0 = parse_operand(args[0])
        b = to_box(arg0)
        if b is None:
            return None
        if fname == "expandspatial":
            return expand_spatial(b, float(args[1]))
        dt = parse_interval_us(args[1].strip().strip("'"))
        try:
            return expand_temporal(b, dt)
        except ValueError as e:
            raise Err(str(e))
    parts = split_infix(expr)
    if parts is not None:
        lhs, op, rhs = parts
        a, b = parse_operand(lhs), parse_operand(rhs)
        if a is None or b is None:
            return None  # NULL operand (empty-geometry cast) → NULL
        return eval_op(op, a, b)
    assert expr.endswith("::stbox"), expr
    return parse_operand(expr)


def norm(res):
    if res is None:
        return None
    if isinstance(res, bool):
        return "t" if res else "f"
    if isinstance(res, STBox):
        return stbox_out(res)
    raise TypeError(type(res))


with open(GOLD) as fh:
    _GOLD = json.load(fh)
CASES = [(suite, i, expr, want)
         for suite, cases in _GOLD.items()
         for i, (expr, want) in enumerate(cases)]


@pytest.mark.parametrize(
    "suite,i,expr,want",
    CASES,
    ids=[f"{s.split('_')[0]}-{i}" for s, i, _, _ in CASES])
def test_boxposops_58_60(suite, i, expr, want):
    if isinstance(want, dict):
        with pytest.raises(Err) as ei:
            eval_case(expr)
        assert str(ei.value) == want["error"], expr
        return
    got = norm(eval_case(expr))
    assert got == want, f"{expr!r}: {got!r} != {want!r}"
