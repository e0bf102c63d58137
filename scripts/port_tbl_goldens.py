#!/usr/bin/env python
"""One-time golden extractor for the base-layer `*_tbl` regression
suites: parses `SELECT count(*) ...;` queries (possibly wrapped over
several lines) and their count results from
`/root/reference/test/expected/<suite>.test.out` into
tests/goldens/tbl_<suite>.json as [[sql, count], ...].  Non-count
SELECTs (e.g. MAX/round probes) are captured with their raw result
string instead."""

from __future__ import annotations

import json
import os
import re
import sys

REF = "/root/reference/test/expected"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

SUITES = sys.argv[1:] or [
    "11_timeops_tbl", "24_tnumber_mathfuncs_tbl",
    "26_temporal_boolops_tbl", "28_temporal_compops_tbl",
    "32_temporal_boxops_tbl", "34_temporal_posops_tbl",
]


def parse(path: str) -> list[list]:
    lines = open(path).read().splitlines()
    cases = []
    i = 0
    while i < len(lines):
        s = lines[i].lstrip("﻿")
        if not re.match(r"(?i)^\s*select\b", s):
            i += 1
            continue
        sql = [s]
        while not sql[-1].rstrip().endswith(";"):
            i += 1
            sql.append(lines[i])
        sql_text = " ".join(x.strip() for x in sql)
        i += 1
        if i < len(lines) and lines[i].startswith("ERROR"):
            i += 1
            continue
        # header line(s): " count " / column name, then ----- divider
        while i < len(lines) and not set(lines[i].strip()) <= {"-", "+"}:
            i += 1
        i += 1
        vals = []
        while i < len(lines) and not lines[i].startswith("("):
            vals.append(lines[i].strip())
            i += 1
        i += 1  # the "(N rows)" line
        cases.append([sql_text, vals[0] if len(vals) == 1 else vals])
    return cases


def main() -> None:
    for suite in SUITES:
        cases = parse(os.path.join(REF, f"{suite}.test.out"))
        out = os.path.join(OUT_DIR, f"tbl_{suite}.json")
        with open(out, "w") as fh:
            json.dump(cases, fh, indent=0)
        print(suite, len(cases))


if __name__ == "__main__":
    main()
