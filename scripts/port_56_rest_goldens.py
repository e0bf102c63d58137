#!/usr/bin/env python
"""One-time golden extractor for the FINAL 56_tpoint_spatialfuncs
tranche (expected values lifted verbatim — the accepted use of
reference goldens): every SELECT not already covered by
port_56_spatialfuncs_goldens.py / port_56_more_goldens.py —
SRID/setSRID accessors, transform/transform_gk, setprecision,
geometry-with-M casts in both directions, and the operand-validation
ERROR blocks of atGeometry/NAI/NAD/shortestLine →
tests/goldens/spatialfuncs_56_rest.json as [[expr, want], ...]."""

from __future__ import annotations

import importlib.util
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = ("/root/reference/point/test/expected/"
       "56_tpoint_spatialfuncs.test.out")
OUT = os.path.join(os.path.dirname(HERE), "tests", "goldens",
                   "spatialfuncs_56_rest.json")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(HERE, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def covered_patterns():
    pats = []
    for name in ("port_56_spatialfuncs_goldens", "port_56_more_goldens"):
        m = _load(name)
        if hasattr(m, "PATTERNS"):
            pats += [p for _, p in m.PATTERNS]
        for attr in dir(m):
            v = getattr(m, attr)
            if isinstance(v, re.Pattern) and v not in pats:
                pats.append(v)
    return pats


def main() -> None:
    pats = covered_patterns()
    lines = open(SRC, encoding="utf-8-sig").read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        if not lines[i].startswith("SELECT "):
            i += 1
            continue
        stmt = lines[i]
        while not stmt.rstrip().endswith(";"):
            i += 1
            stmt += " " + lines[i].strip()
        i += 1
        err = i < len(lines) and lines[i].startswith("ERROR")
        if err:
            want = {"error": lines[i].split(":", 1)[1].strip()}
            i += 1
        else:
            assert lines[i + 1].startswith("--"), (stmt, lines[i + 1])
            want = lines[i + 2].strip() or None
            i += 4
        if any(p.match(stmt) or p.match(stmt.rstrip(";"))
               for p in pats):
            continue  # already ported by an earlier tranche
        expr = stmt.rstrip().rstrip(";")[len("SELECT "):].strip()
        cases.append([expr, want])
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)
    print(len(cases), "cases")


if __name__ == "__main__":
    main()
