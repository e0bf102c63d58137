#!/usr/bin/env python
"""One-time golden extractor for the FULL 68_tpoint_tempspatialrels
reference suite (contains/containsproperly/covers/coveredby/crosses/
disjoint/equals/intersects/overlaps/touches/within/dwithin/relate over
geometry/geography × tgeompoint/tgeogpoint literal matrices, incl. the
ERROR blocks) from
`/root/reference/point/test/expected/68_tpoint_tempspatialrels.test.out`
into tests/goldens/tempspatialrels_68.json.

Each case is ``[fn, argtext, want]`` where want is the single output
cell verbatim ("t"/"f"/DE-9IM matrix), null for SQL NULL, or
``{"error": msg}`` for expected-raise rows."""

from __future__ import annotations

import json
import os
import re

SRC = ("/root/reference/point/test/expected/"
       "68_tpoint_tempspatialrels.test.out")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "tempspatialrels_68.json")

SEL = re.compile(r"^SELECT (\w+)\((.*)\);$")


def main() -> None:
    lines = open(SRC, encoding="utf-8-sig").read().splitlines()
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
        m = SEL.match(stmt.rstrip())
        i += 1
        if m is None:
            continue
        fn, argtext = m.group(1), m.group(2)
        if i < len(lines) and lines[i].startswith("ERROR"):
            msg = lines[i].split(":", 1)[1].strip()
            cases.append([fn, argtext, {"error": msg}])
            i += 1
            continue
        # header / ---- / value / (1 row)
        if i + 3 >= len(lines) or not lines[i + 1].startswith("--"):
            continue
        val = lines[i + 2]
        assert lines[i + 3].strip() == "(1 row)", (stmt, lines[i + 3])
        want = val.strip() or None
        cases.append([fn, argtext, want])
        i += 4
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)
    from collections import Counter
    print(len(cases), "cases")
    print(Counter(c[0] for c in cases))
    print(Counter(json.dumps(c[2]) if isinstance(c[2], dict) else c[2]
                  for c in cases))


if __name__ == "__main__":
    main()
