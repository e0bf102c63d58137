#!/usr/bin/env python
"""One-time golden extractor for the point-layer 53_tpoint_out
reference suite (expected values lifted verbatim — the accepted use of
reference goldens): `point/test/expected/53_tpoint_out.test.out` →
tests/goldens/tpoint_out_53.json as [[expr, want], ...] with
``{"error": msg}`` rows for the ERROR block."""

from __future__ import annotations

import json
import os

REF = "/root/reference/point/test/expected/53_tpoint_out.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "tpoint_out_53.json")


def main() -> None:
    lines = open(REF, encoding="utf-8-sig").read().splitlines()
    cases = []
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
        assert " FROM " not in expr.upper(), expr
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
    print(len(cases), "cases")


if __name__ == "__main__":
    main()
