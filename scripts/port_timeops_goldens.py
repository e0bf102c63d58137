#!/usr/bin/env python
"""One-time golden extractor for the reference's 11_timeops suite
(union/intersection/minus/adjacent over the time-type operand matrix
with literal outputs) into tests/goldens/timeops_11.json.  Run
manually; the JSON is committed so tests never read /root/reference.
"""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/test/expected/11_timeops.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "timeops_11.json")

CASE_RE = re.compile(
    r"^SELECT (\w+) '([^']*)' (-\|-|\+|\*|-) (\w+) '([^']*)';$")


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        m = CASE_RE.match(lines[i])
        if not m:
            i += 1
            continue
        j = i + 1
        while not (lines[j].strip()
                   and set(lines[j].strip()) <= {"-", "+"}):
            j += 1
        cases.append([*m.groups(), lines[j + 1].strip()])
        i = j + 2
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
