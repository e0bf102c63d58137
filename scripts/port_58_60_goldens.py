#!/usr/bin/env python
"""One-time golden extractor for the point-layer 58_tpoint_boxops and
60_tpoint_posops reference suites (expected values lifted verbatim —
the accepted use of reference goldens):
`point/test/expected/{58_tpoint_boxops,60_tpoint_posops}.test.out` →
tests/goldens/tpoint_boxposops_58_60.json.

Each case is ``[expr, want]`` where expr is the raw SELECT body
(infix box/position op between typed literals, an ``::stbox`` cast, a
``stbox(geo, time)`` constructor, or expandSpatial/expandTemporal) and
want is the single output cell verbatim ("t"/"f"/an STBOX literal),
null for SQL NULL, or ``{"error": msg}``.

The handful of ``SELECT count(*) FROM tbl_*`` queries are SKIPPED and
counted: they read the reference's point-layer random tables, which
were never committed upstream (`point/test/scripts/
dump_test_tables_postgis*.txt` hold only the pg_dump command line), so
their counts are tied to a lost dataset."""

from __future__ import annotations

import json
import os
from collections import Counter

REF = "/root/reference/point/test/expected"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "tpoint_boxposops_58_60.json")


def extract(path: str):
    lines = open(path, encoding="utf-8-sig").read().splitlines()
    cases, skipped_tbl = [], 0
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line.upper().startswith("SELECT "):
            i += 1
            continue
        stmt = line
        while not stmt.rstrip().endswith(";"):
            i += 1
            stmt += " " + lines[i].strip()
        i += 1
        expr = stmt.rstrip().rstrip(";")[len("SELECT "):].strip()
        if " FROM " in expr.upper():
            skipped_tbl += 1
            # swallow its result block
            if i < len(lines) and lines[i].startswith("ERROR"):
                i += 1
            elif i + 1 < len(lines) and lines[i + 1].startswith("--"):
                i += 4
            continue
        if i < len(lines) and lines[i].startswith("ERROR"):
            msg = lines[i].split(":", 1)[1].strip()
            cases.append([expr, {"error": msg}])
            i += 1
            continue
        if i + 3 >= len(lines) or not lines[i + 1].startswith("--"):
            continue
        val = lines[i + 2]
        assert lines[i + 3].strip() == "(1 row)", (stmt, lines[i + 3])
        cases.append([expr, val.strip() or None])
        i += 4
    return cases, skipped_tbl


def main() -> None:
    out = {}
    for name in ["58_tpoint_boxops", "60_tpoint_posops"]:
        cases, skipped = extract(os.path.join(REF, f"{name}.test.out"))
        out[name] = cases
        print(name, len(cases), "cases;", skipped,
              "tbl_* count queries skipped (lost upstream dataset)")
        print(Counter(json.dumps(c[1]) if isinstance(c[1], dict)
                      else ("NULL" if c[1] is None else
                            c[1] if c[1] in "tf" else "STR")
                      for c in cases))
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=0)


if __name__ == "__main__":
    main()
