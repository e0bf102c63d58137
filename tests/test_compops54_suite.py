"""FULL reference suite 54_tpoint_compops run verbatim: 264 cases —
`#=` / `#<>` temporal comparisons over every geometry/geography ×
tgeompoint/tgeogpoint operand-order combination (2D and 3D, both
orders, empty geometries, tpoint × tpoint), with exact crossing
instants on linear sequences
(`point/test/expected/54_tpoint_compops.test.out` via
scripts/port_54_compops_goldens.py; semantics
`src/temporal_compops.c` + `point/src/tpoint.c` tcomp dispatch).

An empty geometry compares unequal to every point (PostGIS
datum_point_eq on an empty is false), so `tpoint #= empty` is the
constant-false profile and `#<>` the constant-true one — replicated
here by comparing the tpoint against itself with the flipped
operator, which also reproduces the reference's sequence
normalization of the constant profile."""

import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark.lifting import (const_temporal,  # noqa: E402
                                      lift_comparison)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "compops_54.json")

GEO_RE = re.compile(r"^(geometry|geography)\s+'([^']*)'$", re.IGNORECASE)
PT_RE = re.compile(r"^Point(\s+Z)?\s*\(([-\d. ]+)\)$", re.IGNORECASE)


def parse_geo(tok):
    m = GEO_RE.match(tok.strip())
    if not m:
        return None
    lit = m.group(2).strip()
    if re.fullmatch(r"Point(\s+Z)?\s+empty", lit, re.IGNORECASE):
        return "empty"
    pm = PT_RE.match(lit)
    assert pm, lit
    return np.array([float(c) for c in pm.group(2).split()])


def eval_case(expr):
    m = re.split(r"\s*#(=|<>)\s*", expr)
    assert len(m) == 3, expr
    lhs, sym, rhs = m
    op = "eq" if sym == "=" else "ne"
    ga, gb = parse_geo(lhs), parse_geo(rhs)
    ta, tb = parse_tpoint(lhs), parse_tpoint(rhs)
    if ta is not None and tb is not None:
        return lift_comparison(op, ta, tb)
    tv = ta if ta is not None else tb
    g = ga if ga is not None else gb
    assert tv is not None and g is not None, expr
    if isinstance(g, str):  # empty geometry: constant false/true
        return lift_comparison("ne" if op == "eq" else "eq", tv, tv)
    return lift_comparison(op, tv, const_temporal(g, tv))


with open(GOLD) as fh:
    CASES = json.load(fh)


@pytest.mark.parametrize("expr,want", CASES,
                         ids=[f"54-{i}" for i in range(len(CASES))])
def test_compops54(expr, want):
    res = eval_case(expr)
    got = None if res is None else str(res)
    assert got == want, f"{expr!r}: {got!r} != {want!r}"
