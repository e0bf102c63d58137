"""FULL reference suite 53_tpoint_out run verbatim: 61 cases —
asText / asEWKT (SRID-prefixed) over every duration × dimension ×
geometry/geography combination, asMFJSON with precision and
bbox/short-crs/urn-crs option bitmask (incl. the unknown-SRID error),
and asBinary/asEWKB/asHexEWKB in the reference's temporal-WKB byte
layout (`point/test/expected/53_tpoint_out.test.out` via
scripts/port_53_out_goldens.py; semantics
`point/src/tpoint_out.c`)."""

import json
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark.mfjson import as_mfjson, tpoint_wkb  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "tpoint_out_53.json")


def split_args(argtext):
    out, depth, q, start = [], 0, False, 0
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
            out.append(argtext[start:k].strip())
            start = k + 1
    out.append(argtext[start:].strip())
    return out


def eval_case(expr):
    m = re.match(r"^(\w+)\((.*)\)$", expr, re.S)
    assert m, expr
    fname = m.group(1).lower()
    args = split_args(m.group(2))
    if args[0] == "'{}'::tgeompoint[]":
        return None  # empty-array literal casts to SQL NULL array out
    am = re.match(r"(?i)^ARRAY\[(.*)\]$", args[0], re.S)
    if am:
        elems = [eval_one(fname, t.strip())
                 for t in split_args(am.group(1))]
        return "{" + ",".join(f'"{e}"' for e in elems) + "}"
    return eval_one(fname, args[0], args[1:])


def eval_one(fname, tok, extra=()):
    tv = parse_tpoint(tok)
    assert tv is not None, tok
    txt = str(tv)
    if fname == "astext":
        return re.sub(r"^SRID=\d+;", "", txt)
    if fname == "asewkt":
        if tv.srid and not txt.startswith("SRID="):
            txt = f"SRID={tv.srid};{txt}"
        return txt
    args = [tok, *extra]
    if fname == "asmfjson":
        precision = int(args[1]) if len(args) > 1 else None
        options = int(args[2]) if len(args) > 2 else 0
        return as_mfjson(tv, precision, options)
    if fname == "asbinary":
        return "\\x" + tpoint_wkb(tv, extended=False).hex()
    if fname == "asewkb":
        return "\\x" + tpoint_wkb(tv, extended=True).hex()
    if fname == "ashexewkb":
        return tpoint_wkb(tv, extended=True, hex_out=True)
    raise ValueError(fname)


with open(GOLD) as fh:
    CASES = json.load(fh)


@pytest.mark.parametrize("expr,want", CASES,
                         ids=[f"53-{i}" for i in range(len(CASES))])
def test_tpoint_out53(expr, want):
    if isinstance(want, dict):
        with pytest.raises(ValueError) as ei:
            eval_case(expr)
        assert str(ei.value) == want["error"], expr
        return
    got = eval_case(expr)
    assert got == want, f"{expr!r}: {got!r} != {want!r}"
