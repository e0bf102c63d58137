"""FULL reference suite 27_temporal_textfuncs run verbatim: 32 cases
— `||` textcat over text × ttext in both orders and every
duration-pair combination, plus upper()/lower()
(`test/expected/27_temporal_textfuncs.test.out` via
scripts/port_27_textfuncs_goldens.py; semantics
`src/temporal_textfuncs.c:50-117`)."""

import json
import os
import re

import numpy as np
import pytest

from mobilitydb_spark.ttext import TText
from mobilitydb_spark.types import Seq, Temporal

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "textfuncs_27.json")

TTEXT_RE = re.compile(r"^ttext\s+'((?:[^']|'')*)'$")
TEXT_RE = re.compile(r"^text\s+'((?:[^']|'')*)'$")


def const_ttext(word: str, like: TText) -> TText:
    """A ttext constantly equal to ``word`` over ``like``'s shape —
    the base⊕temporal path of textcat."""
    tv = like.temporal
    seqs = [Seq(s.times.copy(), np.zeros((len(s.times), 1)),
                s.lower_inc, s.upper_inc) for s in tv.seqs]
    return TText(Temporal(tv.duration, seqs, False, 0, True), [word])


def parse_operand(tok):
    tok = tok.strip()
    m = TTEXT_RE.match(tok)
    if m:
        return TText.parse(m.group(1))
    m = TEXT_RE.match(tok)
    if m:
        return m.group(1)
    raise ValueError(tok)


def split_concat(expr):
    q = False
    for k, ch in enumerate(expr):
        if ch == "'":
            q = not q
        elif not q and expr.startswith("||", k):
            return expr[:k].strip(), expr[k + 2:].strip()
    return None


def eval_case(expr):
    expr = expr.strip()
    m = re.match(r"^(upper|lower)\((.*)\)$", expr, re.S)
    if m:
        tt = parse_operand(m.group(2))
        return tt.upper() if m.group(1) == "upper" else tt.lower()
    lhs, rhs = split_concat(expr)
    a, b = parse_operand(lhs), parse_operand(rhs)
    if isinstance(a, str):
        a = const_ttext(a, b)
    elif isinstance(b, str):
        b = const_ttext(b, a)
    return a.concat(b)


with open(GOLD) as fh:
    CASES = json.load(fh)


@pytest.mark.parametrize("expr,want", CASES,
                         ids=[f"27-{i}" for i in range(len(CASES))])
def test_textfuncs27(expr, want):
    res = eval_case(expr)
    got = None if res is None else str(res)
    assert got == want, f"{expr!r}: {got!r} != {want!r}"
