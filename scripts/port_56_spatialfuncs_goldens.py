#!/usr/bin/env python
"""One-time golden extractor for a 56_tpoint_spatialfuncs subset:
round(NearestApproachDistance(a, b), d), round(length/
cumulativeLength/speed(x), d) and asText(atGeometry/minusGeometry)
cases into tests/goldens/spatialfuncs_56.json."""

from __future__ import annotations

import json
import os
import re

SRC = ("/root/reference/point/test/expected/"
       "56_tpoint_spatialfuncs.test.out")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "spatialfuncs_56.json")

NAD = re.compile(
    r"^SELECT round\(NearestApproachDistance\((.*)\)(?:::numeric)?, (\d+)\);$")


def split2(argtext):
    """Split two args at the top-level comma (quote-aware)."""
    depth, q = 0, False
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
            return argtext[:k].strip(), argtext[k + 1:].strip()
    return None
METRIC = re.compile(
    r"^SELECT round\((length|cumulativeLength|speed)\((.+?)\)(?:::numeric)?, (\d+)\);$")
ATGEO = re.compile(
    r"^SELECT asText\((atGeometry|minusGeometry)\((.*)\)\);$")


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        kind = None
        m = NAD.match(lines[i])
        if m:
            two = split2(m.group(1))
            if two is None:
                i += 1
                continue
            kind = ("nad", two[0], two[1], int(m.group(2)))
        else:
            m = METRIC.match(lines[i])
            if m:
                kind = (m.group(1), m.group(2), None, int(m.group(3)))
            else:
                m = ATGEO.match(lines[i])
                if m:
                    two = split2(m.group(2))
                    if two is None:
                        i += 1
                        continue
                    kind = (m.group(1), two[0], two[1], None)
        if not kind:
            i += 1
            continue
        if lines[i + 1].startswith("ERROR"):
            i += 2
            continue
        j = i + 1
        while j < len(lines) and not (
                lines[j].strip() and set(lines[j].strip()) <= {"-", "+"}):
            if lines[j].startswith(("SELECT", "ERROR")):
                break
            j += 1
        if j >= len(lines) or not lines[j].strip().startswith("-"):
            i += 1
            continue
        cases.append([*kind, lines[j + 1].strip()])
        i = j + 2
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
