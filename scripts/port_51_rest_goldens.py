#!/usr/bin/env python
"""One-time golden extractor for the 51_tpoint families NOT in
tpoint_51.json (which holds the 459 single-line `SELECT fn(...)` ok
cases): the total-order comparison and ?=/%= operator cases, the bare
literal-parse error block, and the function-call error block —
multi-line statements included.  Output
tests/goldens/tpoint_51_rest.json: a list of
[stmt, kind, expected] with kind "ok" (expected = first value line)
or "error" (expected = ERROR message).  Run manually; committed."""

from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/point/test/expected/51_tpoint.test.out"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "tpoint_51_rest.json")

FN_RE = re.compile(r"^SELECT (\w+)\((.*)\);$")   # already-ported ok cases


def parse_out(path):
    """Yield (stmt, kind, expected) for every SELECT in a pg_regress
    .out file; stmt has continuation lines joined by a single space."""
    lines = open(path, errors="replace").read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i].startswith("SELECT "):
            i += 1
            continue
        stmt_lines = [lines[i]]
        while not stmt_lines[-1].rstrip().endswith(";"):
            i += 1
            stmt_lines.append(lines[i])
        stmt = " ".join(p.strip() for p in stmt_lines)
        single = len(stmt_lines) == 1
        i += 1
        if i < len(lines) and lines[i].startswith("ERROR:"):
            yield stmt, single, "error", lines[i][len("ERROR:"):].strip()
            continue
        # header line(s), ---- separator, value row
        j = i
        while j < len(lines) and not (
                lines[j].strip() and set(lines[j].strip()) <= {"-", "+"}):
            if lines[j].startswith("SELECT") or lines[j].startswith("ERROR"):
                break
            j += 1
        if j < len(lines) and lines[j].strip().startswith("-"):
            val = lines[j + 1].split("|")[0].strip() \
                if j + 1 < len(lines) else ""
            yield stmt, single, "ok", val
            i = j + 2


def main() -> None:
    cases = []
    for stmt, single, kind, expected in parse_out(SRC):
        if kind == "ok" and single and FN_RE.match(stmt):
            continue  # in tpoint_51.json already (single-line fn cases)
        if stmt.startswith("SELECT format_type"):
            continue  # pg_catalog introspection, not portable
        cases.append([stmt, kind, expected])
    print(len(cases))
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
