#!/usr/bin/env python
"""One-time golden extractor for 26_temporal_boolops (& | ~ over
bool/tbool operand pairs) into tests/goldens/boolops_26.json."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/test/expected/26_temporal_boolops.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "boolops_26.json")

BIN = re.compile(r"^SELECT (.+?) ([&|]) (.+);$")
NOT = re.compile(r"^SELECT ~ (.+);$")


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        m = BIN.match(lines[i])
        un = None if m else NOT.match(lines[i])
        if not m and not un:
            i += 1
            continue
        j = i + 1
        while not (lines[j].strip()
                   and set(lines[j].strip()) <= {"-", "+"}):
            j += 1
        want = lines[j + 1].strip()
        if m:
            cases.append([m.group(1), m.group(2), m.group(3), want])
        else:
            cases.append([un.group(1), "~", None, want])
        i = j + 2
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
