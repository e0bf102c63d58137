"""Reference suite 26_temporal_boolops run verbatim: temporal boolean
& | ~ over bool/tbool operand pairs with tbool literal outputs
(`test/expected/26_temporal_boolops.test.out` via
scripts/port_26_boolops_goldens.py)."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import Skip, parse_arg  # noqa: E402

from mobilitydb_spark import lifting  # noqa: E402
from mobilitydb_spark.types import (INSTANT, SEQUENCE, SEQUENCESET,  # noqa: E402
                                    Seq, Temporal)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "boolops_26.json")


def const_like(other: Temporal, c: float) -> Temporal:
    seqs = [Seq(s.times.copy(), np.full((len(s.times), 1), c),
                s.lower_inc, s.upper_inc) for s in other.seqs]
    out = Temporal(other.duration, seqs, False, other.srid, True)
    out.is_bool = True
    return out


def to_operand(tok, other):
    tok = tok.strip()
    if tok.upper() in ("TRUE", "FALSE"):
        if other is None:
            raise Skip("two scalars")
        return const_like(other, 1.0 if tok.upper() == "TRUE" else 0.0)
    tag, v = parse_arg(tok)
    if tag != "temporal":
        raise Skip(tok)
    return v


def test_26_temporal_boolops_suite():
    cases = json.load(open(GOLD))
    assert len(cases) >= 56
    fails, ran = [], 0
    for i, (lhs, op, rhs, want) in enumerate(cases):
        if op == "~":
            a = to_operand(lhs, None)
            res = lifting.tnot(a)
        else:
            lt = rt = None
            if re.match(r"^(\w+)\s+'", lhs.strip()):
                lt = to_operand(lhs, None)
            if rhs and re.match(r"^(\w+)\s+'", rhs.strip()):
                rt = to_operand(rhs, None)
            a = lt if lt is not None else to_operand(lhs, rt)
            b = rt if rt is not None else to_operand(rhs, lt)
            res = lifting.tand(a, b) if op == "&" else lifting.tor(a, b)
        if res is None:
            got = ""
        else:
            res.is_bool = True
            got = str(res)
        ran += 1
        if got != want:
            fails.append((i, lhs[:40], op, (rhs or "")[:40], want, got))
    assert not fails, (len(fails), fails[:6])
    assert ran == len(cases)
