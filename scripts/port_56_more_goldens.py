#!/usr/bin/env python
"""One-time golden extractor for the round-5 56_tpoint_spatialfuncs
tranches: |=| (NAD operator), ShortestLine, NearestApproachInstant
(plain + setPrecision), round(degrees(azimuth(..))), twcentroid and
trajectory cases into tests/goldens/spatialfuncs_56_more.json as
[family, arg1, arg2|None, digits|None, want]."""

from __future__ import annotations

import json
import os
import re

SRC = ("/root/reference/point/test/expected/"
       "56_tpoint_spatialfuncs.test.out")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "spatialfuncs_56_more.json")


def split2(argtext: str):
    depth, q = 0, False
    for k, ch in enumerate(argtext):
        if ch == "'":
            q = not q
        if q:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            return argtext[:k].strip(), argtext[k + 1:].strip()
    return None


PATTERNS = [
    ("nadop", re.compile(
        r"^SELECT round\(\((.+ \|=\| .+)\)(?:::numeric)?, (\d+)\);$")),
    ("shortestline", re.compile(
        r"(?i)^SELECT ST_AsText\((?:ShortestLine)\((.*)\)\);$")),
    ("nai_prec", re.compile(
        r"(?i)^SELECT asText\(setPrecision\(NearestApproachInstant\((.*)\),\s*(\d+)\)\);$")),
    ("nai", re.compile(
        r"(?i)^SELECT asText\(NearestApproachInstant\((.*)\)\);$")),
    ("azimuth", re.compile(
        r"^SELECT round\(degrees\(azimuth\((.+?)\)\)(?:::numeric)?, (\d+)\);$")),
    ("twcentroid", re.compile(
        r"(?i)^SELECT st_astext\(twcentroid\((.+?)\)\);$")),
    ("trajectory", re.compile(
        r"(?i)^SELECT ST_AsText\(trajectory\((.+?)\)\);$")),
]


def main() -> None:
    lines = open(SRC).read().splitlines()
    cases = []
    counts: dict[str, int] = {}
    i = 0
    while i < len(lines):
        rec = None
        for fam, pat in PATTERNS:
            m = pat.match(lines[i])
            if not m:
                continue
            if fam in ("nadop",):
                two = None
                body = m.group(1)
                # split at top-level |=|
                depth, q = 0, False
                for k in range(len(body) - 2):
                    ch = body[k]
                    if ch == "'":
                        q = not q
                    if q:
                        continue
                    if ch in "([":
                        depth += 1
                    elif ch in ")]":
                        depth -= 1
                    elif depth == 0 and body[k:k + 3] == "|=|":
                        two = (body[:k].strip(), body[k + 3:].strip())
                        break
                if two is None:
                    break
                rec = [fam, two[0], two[1], int(m.group(2))]
            elif fam in ("shortestline", "nai", "nai_prec"):
                two = split2(m.group(1))
                if two is None:
                    break
                digits = int(m.group(2)) if fam == "nai_prec" else None
                rec = [fam, two[0], two[1], digits]
            elif fam in ("azimuth",):
                rec = [fam, m.group(1), None, int(m.group(2))]
            else:
                rec = [fam, m.group(1), None, None]
            break
        if rec is None:
            i += 1
            continue
        if lines[i + 1].startswith("ERROR"):
            i += 2
            continue
        j = i + 1
        while j < len(lines) and not (
                lines[j].strip() and set(lines[j].strip()) <= {"-", "+"}):
            if lines[j].startswith(("SELECT", "ERROR")):
                break
            j += 1
        if j >= len(lines) or not lines[j].strip().startswith("-"):
            i += 1
            continue
        cases.append(rec + [lines[j + 1].strip()])
        counts[rec[0]] = counts.get(rec[0], 0) + 1
        i = j + 2
    print(len(cases), counts)
    with open(OUT, "w") as fh:
        json.dump(cases, fh, indent=0)


if __name__ == "__main__":
    main()
