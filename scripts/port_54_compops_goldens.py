#!/usr/bin/env python
"""One-time golden extractor for the point-layer 54_tpoint_compops
reference suite (expected values lifted verbatim — the accepted use of
reference goldens): `point/test/expected/54_tpoint_compops.test.out` →
tests/goldens/compops_54.json.

Each case is ``[expr, want]`` where expr is the raw `lhs #=|#<> rhs`
body and want is the single output cell verbatim (a tbool literal) or
null for SQL NULL."""

from __future__ import annotations

import json
import os

REF = ("/root/reference/point/test/expected/"
       "54_tpoint_compops.test.out")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "compops_54.json")


def main() -> None:
    lines = open(REF, encoding="utf-8-sig").read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line.startswith("SELECT "):
            i += 1
            continue
        stmt = line
        while not stmt.rstrip().endswith(";"):
            i += 1
            stmt += " " + lines[i].strip()
        i += 1
        expr = stmt.rstrip().rstrip(";")[len("SELECT "):].strip()
        assert lines[i + 1].startswith("--"), (expr, lines[i + 1])
        val = lines[i + 2].strip()
        assert lines[i + 3].strip() == "(1 row)"
        cases.append([expr, val or None])
        i += 4
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)
    print(len(cases), "cases")


if __name__ == "__main__":
    main()
