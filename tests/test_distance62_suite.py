"""Reference suite 62_tpoint_distance run verbatim: temporal distance
`round(a <-> b, 6)` over tpoint/geometry operand pairs with tfloat
literal outputs (`point/test/expected/62_tpoint_distance.test.out`
via scripts/port_62_distance_goldens.py).

Skipped with an asserted budget: Linestring/other non-point geometry
operands (temporal distance to lines is a different kernel, covered
by NAD/shortestLine tests) and geography operands."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import Skip  # noqa: E402
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark import lifting  # noqa: E402
from mobilitydb_spark.types import (INSTANT, SEQUENCE, SEQUENCESET,  # noqa: E402
                                    Seq, Temporal)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "distance_62.json")

GEOM_POINT = re.compile(
    r"^geometry\s+'(?:srid=\d+;)?Point\(([-\d. ]+)\)'$", re.IGNORECASE)


def pg_round_vals(v: np.ndarray, d: int) -> np.ndarray:
    scale = 10.0 ** d
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale


def to_operand(tok: str):
    tok = tok.strip()
    tv = parse_tpoint(tok)
    if tv is not None:
        return tv
    m = GEOM_POINT.match(tok)
    if m:
        return np.array([float(c) for c in m.group(1).split()])
    raise Skip(f"operand {tok!r}")


def test_62_tpoint_distance_suite():
    cases = json.load(open(GOLD))
    assert len(cases) > 120
    fails, skipped, ran = [], 0, 0
    for i, (lhs, rhs, digits, want) in enumerate(cases):
        if "tgeogpoint" in lhs or "tgeogpoint" in rhs \
                or "geography" in lhs or "geography" in rhs:
            skipped += 1
            continue
        try:
            a = to_operand(lhs)
            b = to_operand(rhs)
        except Skip:
            skipped += 1
            continue
        if not isinstance(a, Temporal):
            a, b = b, a  # tdistance is symmetric
        res = lifting.tdistance(a, b)
        if res is None:
            got = ""
        else:
            seqs = [Seq(s.times.copy(),
                        pg_round_vals(s.values, digits),
                        s.lower_inc, s.upper_inc) for s in res.seqs]
            got = str(Temporal(res.duration, seqs, res.linear,
                               0, res.step_default))
        ran += 1
        if got != want:
            fails.append((i, lhs[:45], rhs[:45], want, got))
    assert not fails, (len(fails), fails[:6])
    assert ran >= 50, (ran, skipped)
