#!/usr/bin/env python
"""One-time golden extractor for 62_tpoint_distance
(round(a <-> b, 6) temporal distance cases) into
tests/goldens/distance_62.json.  Multi-line literals (srid=5676
continuation lines) are skipped by the single-line matcher."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/point/test/expected/62_tpoint_distance.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "distance_62.json")

CASE = re.compile(r"^SELECT round\((.+?) <-> (.+), (\d+)\);$")
ERR_OUT = OUT.replace("distance_62.json", "distance_62_errors.json")


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    errors = []
    i = 0
    while i < len(lines):
        m = CASE.match(lines[i])
        if not m:
            i += 1
            continue
        if lines[i + 1].startswith("ERROR"):
            errors.append([m.group(1), m.group(2),
                           lines[i + 1].split("ERROR:", 1)[1].strip()])
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
        cases.append([m.group(1), m.group(2), int(m.group(3)),
                      lines[j + 1].strip()])
        i = j + 2
    print(len(cases), "cases,", len(errors), "errors")
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)
    with open(ERR_OUT, "w") as fh:
        json.dump(errors, fh, indent=0)


if __name__ == "__main__":
    main()
