#!/usr/bin/env python
"""One-time golden extractor for 24_tnumber_mathfuncs (+ - * / over
scalar/tnumber pairs, optionally wrapped in round(expr, d)) into
tests/goldens/mathfuncs_24.json.  Run manually; JSON committed."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/test/expected/24_tnumber_mathfuncs.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "mathfuncs_24.json")

BARE = re.compile(r"^SELECT (.+?) ([-+*/]) (.+);$")
ROUND = re.compile(r"^SELECT round\((.+?) ([-+*/]) (.+), (\d+)\);$")


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        m = ROUND.match(lines[i])
        digits = None
        if m:
            lhs, op, rhs, digits = m.groups()
        else:
            m = BARE.match(lines[i])
            if m:
                lhs, op, rhs = m.groups()
        if not m:
            i += 1
            continue
        if lines[i + 1].startswith("ERROR"):
            i += 2
            continue
        j = i + 1
        while not (lines[j].strip()
                   and set(lines[j].strip()) <= {"-", "+"}):
            j += 1
        cases.append([lhs, op, rhs,
                      int(digits) if digits else None,
                      lines[j + 1].strip()])
        i = j + 2
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
