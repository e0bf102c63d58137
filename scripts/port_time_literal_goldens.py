#!/usr/bin/env python
"""One-time golden extractor for the remaining base-layer LITERAL
suites 01_period / 03_timestampset / 05_periodset /
36_temporal_aggfuncs / 38_temporal_waggfuncs: every `SELECT ...;` and
its printed result (or `ERROR: <msg>`) from
`/root/reference/test/expected/<suite>.test.out` into
tests/goldens/time_<suite>.json as [[sql, want], ...]."""

from __future__ import annotations

import json
import os
import re
import sys

REF = "/root/reference/test/expected"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

SUITES = sys.argv[1:] or [
    "01_period", "03_timestampset", "05_periodset",
    "36_temporal_aggfuncs", "38_temporal_waggfuncs",
]


def parse(path: str) -> list[list]:
    lines = open(path).read().splitlines()
    cases, i = [], 0
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
            cases.append([sql_text, "ERROR: " + lines[i][7:].strip()])
            i += 1
            continue
        # column-header line(s), then the ---- divider
        while i < len(lines) and not set(lines[i].strip()) <= {"-", "+"}:
            i += 1
        i += 1
        vals = []
        while i < len(lines) and not lines[i].startswith("("):
            vals.append(lines[i].strip())
            i += 1
        i += 1  # "(N rows)"
        cases.append([sql_text, vals[0] if len(vals) == 1 else vals])
    return cases


def main() -> None:
    for suite in SUITES:
        cases = parse(os.path.join(REF, f"{suite}.test.out"))
        out = os.path.join(OUT_DIR, f"time_{suite}.json")
        with open(out, "w") as f:
            json.dump(cases, f, indent=0)
        print(suite, len(cases), "->", out)


if __name__ == "__main__":
    main()
