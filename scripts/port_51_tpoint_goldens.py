#!/usr/bin/env python
"""One-time golden extractor for 51_tpoint (asText/asEWKT-wrapped
constructor/accessor/restrictor cases over tpoint literals) into
tests/goldens/tpoint_51.json.  Run manually; JSON committed."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/point/test/expected/51_tpoint.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "tpoint_51.json")

CASE_RE = re.compile(r"^SELECT (\w+)\((.*)\);$")


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        m = CASE_RE.match(lines[i])
        if not m:
            i += 1
            continue
        if lines[i + 1].startswith("ERROR"):
            i += 2
            continue
        j = i + 1
        while j < len(lines) and not (
                lines[j].strip() and set(lines[j].strip()) <= {"-", "+"}):
            if lines[j].startswith(("ERROR", "SELECT")):
                break
            j += 1
        if j >= len(lines) or not lines[j].strip().startswith("-"):
            i += 1
            continue
        val = lines[j + 1].split("|")[0].strip() \
            if j + 1 < len(lines) else ""
        cases.append([m.group(1), m.group(2), val])
        i = j + 2
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
