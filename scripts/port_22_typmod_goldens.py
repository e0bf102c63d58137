#!/usr/bin/env python
"""One-time golden extractor for the 22_temporal suite's typmod block
(`SELECT <type>(<Duration>) '<literal>';` — the column-typmod
constrained literal casts skipped by port_22_temporal_goldens.py)
into tests/goldens/temporal_22_typmod.json.  Each case is
[type, typmod, literal, kind, expected] where kind is "ok" (expected
is the printed value) or "error" (expected is the ERROR message).
Run manually; the JSON is committed."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/test/expected/22_temporal.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "temporal_22_typmod.json")

CASE_RE = re.compile(
    r"^SELECT (tbool|tint|tfloat|ttext)\((\w+)\) '(.*)';$", re.I)


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    for i, l in enumerate(lines):
        m = CASE_RE.match(l)
        if not m:
            continue
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        if nxt.startswith("ERROR:"):
            cases.append([m.group(1), m.group(2), m.group(3), "error",
                          nxt[len("ERROR:"):].strip()])
        else:
            # header, ---- separator, then the value row
            val = lines[i + 3].split("|")[0].strip() \
                if i + 3 < len(lines) else ""
            cases.append([m.group(1), m.group(2), m.group(3), "ok", val])
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
