"""Reference suite 28_temporal_compops run verbatim: lifted temporal
comparisons `a (#=|#<>|#<|#<=|#>|#>=) b` with tbool literal outputs,
lifted by scripts/port_28_compops_goldens.py from
`test/expected/28_temporal_compops.test.out`.

Scalar operands lift to a constant temporal over the other operand's
sequences (`src/temporal_compops.c` tcomp_base_temporal).  ttext/text
operand cases run via the order-preserving union-vocab coding of the
22-suite runner (r5) — 687 of 823 cases run, zero skips; the 136-case tint-left x
tfloat-right ordered-op reference defect family stays excluded with
its proof."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import Skip, parse_arg  # noqa: E402

from mobilitydb_spark import lifting  # noqa: E402
from mobilitydb_spark.types import Seq, Temporal  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "compops_28.json")

OPS = {"#=": "eq", "#<>": "ne", "#<": "lt", "#<=": "le",
       "#>": "gt", "#>=": "ge"}


def to_temporal(tok: str, other):
    tok = tok.strip()
    if tok in ("TRUE", "FALSE", "true", "false"):
        return const_like(other, 1.0 if tok.upper() == "TRUE" else 0.0,
                          is_bool=True)
    if re.match(r"^-?\d+(\.\d+)?$", tok):
        return const_like(other, float(tok), is_bool=False)
    tag, v = parse_arg(tok)  # bare quoted literals cast by context
    if tag != "temporal":
        raise Skip(f"operand {tok!r}")
    return v


def const_like(other, c: float, is_bool: bool) -> Temporal:
    """Constant temporal over ``other``'s sequence structure (the
    reference casts the base value to the temporal's type and lifts,
    tcomp_base_temporal)."""
    if not isinstance(other, Temporal):
        raise Skip("two scalars")
    seqs = [Seq(s.times.copy(),
                np.full((len(s.times), 1), c),
                s.lower_inc, s.upper_inc) for s in other.seqs]
    out = Temporal(other.duration, seqs, False, other.srid, True)
    out.is_bool = is_bool
    return out


def test_28_temporal_compops_suite():
    cases = json.load(open(GOLD))
    assert len(cases) > 800
    fails, skipped, ran, quirks = [], 0, 0, 0
    for i, (lhs, op, rhs, want) in enumerate(cases):
        # Reference defect class (136 cases, 72 observably wrong):
        # ORDERED comparisons with tint LEFT and tfloat RIGHT are
        # path-dependent in the reference — the instant x instant
        # path is correct, the instant-set path returns the SWAPPED
        # comparison (tint '1@d1' #< tfloat '{1.5@d1}' = f although
        # 1 < 1.5, while the same pair as plain instants = t), and
        # the sequence paths mix the swap with unnormalized crossing
        # splits.  Every tfloat-LEFT mirror matches our results, and
        # #=/#<> (symmetric) are unaffected, isolating the defect to
        # that dispatch path; the whole class is excluded.
        if (op in ("#<", "#<=", "#>", "#>=")
                and lhs.strip().startswith("tint ")
                and rhs.strip().startswith("tfloat ")):
            quirks += 1
            continue
        try:
            if "ttext" in lhs or "ttext" in rhs:
                # text operands: order-preserving union-vocab ranks
                # (see the 22-suite runner) — exact for every cmp op
                from test_temporal22_suite import _unify_text_args
                toks = []
                for tok in (lhs, rhs):
                    tok = tok.strip()
                    if tok.startswith("'"):
                        toks.append(("text", tok.strip("'")))
                    else:
                        toks.append(parse_arg(tok))
                toks = _unify_text_args(toks)
                ts = [t[1] for t in toks if t[0] == "temporal"]
                a = (toks[0][1] if toks[0][0] == "temporal"
                     else const_like(ts[0], toks[0][1], False))
                b = (toks[1][1] if toks[1][0] == "temporal"
                     else const_like(ts[0], toks[1][1], False))
            else:
                # parse the temporal side first so scalars can lift
                lt = rt = None
                if re.match(r"^(\w+)\s+'", lhs.strip()):
                    lt = to_temporal(lhs, None)
                if re.match(r"^(\w+)\s+'", rhs.strip()):
                    rt = to_temporal(rhs, None)
                a = lt if lt is not None else to_temporal(lhs, rt)
                b = rt if rt is not None else to_temporal(rhs, lt)
        except Skip:
            skipped += 1
            continue
        res = lifting.lift_comparison(OPS[op], a, b)
        if res is None:
            got = ""
        else:
            res.is_bool = True
            # result duration mirrors the (synchronized) operands':
            # a single-sequence result of sequence operands prints
            # bare, one instant of instant operands prints bare
            from mobilitydb_spark.types import (INSTANT, INSTANTSET,
                                                SEQUENCE, SEQUENCESET)
            src_dur = max(a.duration, b.duration)
            # linear operands go through the crossing lifter which
            # always returns a sequence SET; step operands map
            # sequence -> sequence (src/temporal_compops.c)
            if src_dur == SEQUENCE and res.duration == SEQUENCESET \
                    and len(res.seqs) == 1 \
                    and not (a.linear or b.linear):
                res = Temporal(SEQUENCE, res.seqs, res.linear,
                               res.srid, res.step_default)
                res.is_bool = True
            elif src_dur == INSTANT and len(res.seqs) == 1 \
                    and len(res.seqs[0].times) == 1:
                res = Temporal(INSTANT, res.seqs, res.linear,
                               res.srid, res.step_default)
                res.is_bool = True
            got = str(res)
        ran += 1
        if got != want:
            fails.append((i, lhs[:50], op, rhs[:50], want, got))
    assert not fails, (len(fails), fails[:8])
    assert ran == 687 and skipped == 0, (ran, skipped)
    assert quirks == 136, quirks
