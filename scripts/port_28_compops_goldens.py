#!/usr/bin/env python
"""One-time golden extractor for the reference's 28_temporal_compops
suite (#=, #<>, #<, #<=, #>, #>= over scalar/temporal operand pairs)
into tests/goldens/compops_28.json.  Run manually; JSON committed."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/test/expected/28_temporal_compops.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "compops_28.json")

CASE_RE = re.compile(
    r"^SELECT (.+?) (#=|#<>|#<=|#>=|#<|#>) (.+);$")


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
        while not (lines[j].strip()
                   and set(lines[j].strip()) <= {"-", "+"}):
            j += 1
        cases.append([m.group(1), m.group(2), m.group(3),
                      lines[j + 1].strip()])
        i = j + 2
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
