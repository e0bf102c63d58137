#!/usr/bin/env python
"""One-time golden extractor for the reference's 32_temporal_boxops /
34_temporal_posops suites (expected values lifted verbatim, the
accepted use of reference goldens): parses the .test.out files into a
compact JSON list of [lhs_kind, lhs_literal, op, rhs_kind,
rhs_literal, expected_bool] committed under tests/goldens/, so the
repo stays standalone (tests never read /root/reference).

Run manually; the output JSON is committed.
"""

from __future__ import annotations

import json
import os
import re

REF = "/root/reference/test/expected"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

OPS = ["<<#", "&<#", "#>>", "#&>", "&&", "@>", "<@", "~=",
       "<<", "&<", ">>", "&>"]
OP_RE = "|".join(re.escape(o) for o in
                 sorted(OPS, key=len, reverse=True))
CASE_RE = re.compile(
    rf"^SELECT (.+?) ({OP_RE}) (.+);$")
OPERAND_RE = re.compile(r"^(\w+)\s+'([^']*)'")  # extra SELECT columns ignored


def parse_operand(tok: str):
    m = OPERAND_RE.match(tok.strip())
    if m:
        return m.group(1), m.group(2)
    return "num", tok.strip()


def extract(path: str):
    cases = []
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        m = CASE_RE.match(lines[i])
        if not m:
            i += 1
            continue
        lhs, op, rhs = m.groups()
        # expected value is two lines after the dashes
        j = i + 1
        while j < len(lines) and not (lines[j].strip() and set(lines[j].strip()) <= {"-", "+"}):
            j += 1
        val = lines[j + 1].split("|")[0].strip()
        assert val in ("t", "f"), (path, i, val)
        lk, ll = parse_operand(lhs)
        rk, rl = parse_operand(rhs)
        cases.append([lk, ll, op, rk, rl, val == "t"])
        i = j + 2
    return cases


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    all_cases = {}
    for name in ["32_temporal_boxops", "34_temporal_posops"]:
        cases = extract(os.path.join(REF, f"{name}.test.out"))
        all_cases[name] = cases
        print(name, len(cases))
    with open(os.path.join(OUT, "boxposops_32_34.json"), "w") as fh:
        json.dump(all_cases, fh, indent=0)


if __name__ == "__main__":
    main()
