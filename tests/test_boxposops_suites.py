"""Reference suites 32_temporal_boxops + 34_temporal_posops run
VERBATIM (2700 cases): every `SELECT a <op> b` with its expected
boolean, lifted by scripts/port_boxposops_goldens.py into
tests/goldens/boxposops_32_34.json (expected values from
`test/expected/{32_temporal_boxops,34_temporal_posops}.test.out`).

Each case casts both typed literals to their bounding TBox
(casts.tbox_of_literal — the reference's cast ladder in
`src/temporal_boxops.c:560-720`) and applies the flag-aware box
comparison (`src/temporal_boxops.c:51-135`,
`src/temporal_posops.c:32-`)."""

import json
import os

from mobilitydb_spark import casts

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "boxposops_32_34.json")

OPS = {
    "&&": casts.tbox_overlaps,
    "@>": casts.tbox_contains,
    "<@": casts.tbox_contained,
    "~=": casts.tbox_same,
    "<<": casts.tbox_left,
    "&<": casts.tbox_overleft,
    ">>": casts.tbox_right,
    "&>": casts.tbox_overright,
    "<<#": casts.tbox_before,
    "&<#": casts.tbox_overbefore,
    "#>>": casts.tbox_after,
    "#&>": casts.tbox_overafter,
}


def _run_suite(name):
    cases = json.load(open(GOLD))[name]
    assert len(cases) > 1000
    fails = []
    for i, (lk, ll, op, rk, rl, want) in enumerate(cases):
        a = casts.tbox_of_literal(lk, ll)
        b = casts.tbox_of_literal(rk, rl)
        got = OPS[op](a, b)
        if got != want:
            fails.append((i, lk, ll, op, rk, rl, want, got))
    assert not fails, (len(fails), fails[:8])


def test_32_temporal_boxops_suite():
    _run_suite("32_temporal_boxops")


def test_34_temporal_posops_suite():
    _run_suite("34_temporal_posops")
