"""The 51_tpoint families beyond the 459 fn-call cases — run verbatim
(`point/test/expected/51_tpoint.test.out` via
scripts/port_51_rest_goldens.py): the total-order comparison block
(192 cases incl. the stbox-first cmp, the cross-duration
hash-then-VARSIZE fallback, and two pinned reference defects), the
?=/%= ever/always operator block, the bare-literal parse-error block,
the typmod-constrained literal forms, and the function-call error
block — 519 cases, zero skips.

Pinned reference defects reproduced VERBATIM by this runner (engine
APIs stay sane):

1. `temporal_le` is bound to `cmp == 0` (`src/temporal.c:3358-3375`
   returns true only on equality — the suite's own `a < b` true /
   `a <= b` false rows prove it).
2. `temporal_cmp_internal`'s cross-duration fallback
   (`src/temporal.c:3316-3333`): after `hash1 < hash2` the else
   branch re-tests the same inequality (`hash2 > hash1` — dead code),
   so hash1 >= hash2 falls through to the VARSIZE comparison; the
   trailing duration compare is unreachable.
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import Skip, split_args  # noqa: E402
import test_tpoint51_suite as R51  # noqa: E402
from test_tpoint51_suite import tpoint_mem_size  # noqa: E402

from mobilitydb_spark import boxops, everops, pghash  # noqa: E402
from mobilitydb_spark.tpoint_strict import (  # noqa: E402
    SRID_DEFAULT, ensure_tpoint_geo_operand, tpoint_in, tpoint_typmod_in,
    tpoint_valid_typmod)
from mobilitydb_spark.types import (SEQUENCE, SEQUENCESET, Seq,  # noqa: E402
    Temporal, fmt_ts, parse_ts)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "tpoint_51_rest.json")

TP_RE = re.compile(r"^(tgeompoint|tgeogpoint)(\(([^)]*)\))?\s+'(.*?)'\s*$",
                   re.S)
GEO_RE = re.compile(r"^(geometry|geography)\s+'(.*)'$", re.I)
STPT_RE = re.compile(r"^ST_Point\(([-\d.]+)\s*,\s*([-\d.]+)\)$", re.I)
FNCALL_RE = re.compile(r"^(\w+)\((.*)\)$", re.S)
WRAPPERS = {"astext", "asewkt", "st_asewkt", "st_astext"}
CONSTRUCTORS = {"tgeompointi", "tgeogpointi", "tgeompointseq",
                "tgeogpointseq", "tgeompoints", "tgeogpoints"}


def parse_tp_operand(tok):
    m = TP_RE.match(tok.strip())
    if m is None:
        return None
    geod = m.group(1) == "tgeogpoint"
    tv = tpoint_in(m.group(4), geodetic=geod)
    if m.group(3) is not None:
        # SQL folds the unquoted typmod identifiers to lowercase
        parts = [p.strip().lower() for p in m.group(3).split(",")]
        tm = tpoint_typmod_in(parts, geography=geod)
        tpoint_valid_typmod(tv, tm)
    return tv


def parse_geo_operand(tok):
    """→ (kind, coords, srid, is_geography) or None."""
    m = STPT_RE.match(tok.strip())
    if m:
        return ("point", np.array([float(m.group(1)),
                                   float(m.group(2))]), 0, False)
    m = GEO_RE.match(tok.strip())
    if not m:
        return None
    wkt = m.group(2)
    is_geog = m.group(1).lower() == "geography"
    srid = 0
    sm = re.match(r"SRID\s*=\s*(\d+)\s*;", wkt, re.I)
    if sm:
        srid = int(sm.group(1))
        wkt = wkt[sm.end():]
    if re.match(r"^\s*point(\s+z)?\s+empty\s*$", wkt, re.I):
        return ("point_empty", None, srid, is_geog)
    pm = re.match(r"^\s*point\s*(z\s*)?\(([^)]*)\)\s*$", wkt, re.I)
    if pm:
        return ("point", np.array([float(x)
                                   for x in pm.group(2).split()]),
                srid, is_geog)
    kw = re.match(r"^\s*(\w+)", wkt).group(1).lower()
    return (kw, None, srid, is_geog)


def strict_tp_elem(tok, hint_geod):
    tv = parse_tp_operand(tok)
    if tv is not None:
        return tv
    t = tok.strip()
    if t.startswith("'") and t.endswith("'"):
        return tpoint_in(t[1:-1], geodetic=hint_geod)
    return None


def eval_inst_ctor(fn, args_text):
    toks = split_args(args_text)
    g = parse_geo_operand(toks[0])
    if g is None:
        return None
    kind, coords, srid, is_geog = g
    if kind == "point_empty":
        raise ValueError("Only non-empty geometries accepted")
    if kind != "point":
        raise ValueError("Only point geometries accepted")
    t = int(parse_ts(re.sub(r"(?i)timestamptz", "",
                            toks[1]).strip().strip("'")))
    geod = fn.lower().startswith("tgeog")
    eff = srid or (SRID_DEFAULT if geod or is_geog else 0)
    return Temporal.instant(t, coords, eff)


def eval_ctor(fn, args_text):
    """tgeompoint{inst,i,seq,s} over ARRAY[...] with the
    temporali/seq/s_make parity checks (same SRID, same
    dimensionality, increasing timestamps)."""
    f = fn.lower()
    if f in ("tgeompointinst", "tgeogpointinst"):
        return eval_inst_ctor(fn, args_text)
    if f not in CONSTRUCTORS:
        return None
    toks = split_args(args_text)
    if not toks or not toks[0].upper().startswith("ARRAY["):
        return None
    inner = toks[0].strip()[6:-1]
    geod = f.startswith("tgeog")
    items = []
    for el in split_args(inner):
        m = FNCALL_RE.match(el.strip())
        if m and m.group(1).lower() in ("tgeompointinst",
                                        "tgeogpointinst"):
            items.append(eval_inst_ctor(m.group(1), m.group(2)))
        elif m and m.group(1).lower() in ("tgeompointseq",
                                          "tgeogpointseq"):
            items.append(eval_ctor(m.group(1), m.group(2)))
        else:
            tv = strict_tp_elem(el, geod)
            if tv is None:
                raise Skip("ctor elem " + el[:40])
            items.append(tv)
    srids = {i.srid for i in items}
    if len(srids) > 1:
        raise ValueError("All geometries composing a temporal point "
                         "must be of the same SRID")
    dims = {i.seqs[0].values.shape[1] for i in items}
    if len(dims) > 1:
        raise ValueError("All geometries composing a temporal point "
                         "must be of the same dimensionality")
    srid = items[0].srid
    if f in ("tgeompoints", "tgeogpoints"):
        seqs = [s.seqs[0] for s in items]
        return Temporal(SEQUENCESET, seqs, items[0].linear, srid,
                        items[0].step_default)
    ts = np.array([int(i.seqs[0].times[0]) for i in items],
                  dtype=np.int64)
    for a, b in zip(ts, ts[1:]):
        if b <= a:
            raise ValueError(
                "Timestamps for temporal value must be increasing: "
                f"{fmt_ts(int(a))}, {fmt_ts(int(b))}")
    vs = np.vstack([i.seqs[0].values[0] for i in items])
    if f.endswith("i"):
        return Temporal.instant_set(ts, vs, srid)
    lohi = [t.strip().lower() for t in toks[1:]]
    lo = lohi[0] == "true" if len(lohi) > 0 else True
    hi = lohi[1] == "true" if len(lohi) > 1 else True
    return Temporal(SEQUENCE, [Seq(ts, vs, lo, hi)], True, srid)


def guard(fn, args_text):
    """Reference-parity operand validation, recursing through the
    asText/asewkt wrappers."""
    f = fn.lower()
    m = FNCALL_RE.match(args_text.strip())
    if f in WRAPPERS and m:
        guard(m.group(1), m.group(2))
        return
    toks = split_args(args_text)
    strict_args = [parse_tp_operand(t) for t in toks]
    if f in ("getvalue", "gettimestamp") and strict_args and \
            strict_args[0] is not None:
        if strict_args[0].duration != 1:
            raise ValueError("Input must be a temporal instant")
    if f in ("numsequences", "startsequence", "endsequence",
             "sequencen", "sequences") and strict_args and \
            strict_args[0] is not None:
        if strict_args[0].duration not in (3, 4):
            raise ValueError("Input must be a temporal sequence (set)")
    if f in ("atvalue", "minusvalue", "atvalues", "minusvalues") and \
            strict_args and strict_args[0] is not None:
        tg = toks[0].lstrip().lower().startswith("tgeog")
        for t in toks[1:]:
            g = parse_geo_operand(t)
            if g is not None and g[0] != "point_empty":
                ensure_tpoint_geo_operand(strict_args[0], g[0], g[1],
                                          g[2], g[3], tv_geodetic=tg)
            elif t.strip().upper().startswith("ARRAY["):
                for it in split_args(t.strip()[6:-1]):
                    gi = parse_geo_operand(it)
                    if gi is not None and gi[0] != "point_empty":
                        ensure_tpoint_geo_operand(
                            strict_args[0], gi[0], gi[1], gi[2], gi[3],
                            tv_geodetic=tg)
    if f == "appendinstant" and len(strict_args) >= 2 and \
            strict_args[0] is not None and strict_args[1] is not None:
        a, b = strict_args[0], strict_args[1]
        if a.srid != b.srid:
            raise ValueError("All geometries composing a temporal "
                             "point must be of the same SRID")
        if a.seqs[0].values.shape[1] != b.seqs[0].values.shape[1]:
            raise ValueError("All geometries composing a temporal "
                             "point must be of the same dimensionality")
        last_t = int(a.seqs[-1].times[-1])
        new_t = int(b.seqs[0].times[0])
        if new_t <= last_t:
            raise ValueError(
                "Timestamps for temporal value must be increasing: "
                f"{fmt_ts(last_t)}, {fmt_ts(new_t)}")
    if f in CONSTRUCTORS or f in ("tgeompointinst", "tgeogpointinst"):
        eval_ctor(fn, args_text)


def tpoint_cmp_ref(a, b):
    """temporal_cmp_internal for tpoints: stbox first, same-duration
    specific (canonical text as the value tiebreak — pinned by all 48
    equal-box same-duration cases), then the DEFECTIVE cross-duration
    fallback: `hash1 < hash2` else VARSIZE (see module docstring)."""
    c = boxops.stbox_cmp(boxops.tpoint_stbox(a, a.srid == 4326),
                         boxops.tpoint_stbox(b, b.srid == 4326))
    if c:
        return c
    if a.duration == b.duration:
        sa, sb = str(a), str(b)
        return 0 if sa == sb else (-1 if sa < sb else 1)
    ha = pghash.tpoint_hash(a) & 0xFFFFFFFF
    hb = pghash.tpoint_hash(b) & 0xFFFFFFFF
    if ha < hb:
        return -1
    za, zb = tpoint_mem_size(a), tpoint_mem_size(b)
    return -1 if za < zb else (1 if za > zb else 0)


def split_op(expr):
    for op in ("?=", "%=", "<>", "<=", ">=", "=", "<", ">"):
        depth, q = 0, False
        for i in range(len(expr)):
            ch = expr[i]
            if ch == "'":
                q = not q
            elif not q and ch == "(":
                depth += 1
            elif not q and ch == ")":
                depth -= 1
            elif not q and depth == 0 and expr[i:i + len(op)] == op:
                if op in ("=", "<", ">") and i > 0 and \
                        expr[i - 1] in "?%<>=":
                    continue
                if op in ("=", "<", ">") and i + 1 < len(expr) and \
                        expr[i + 1] in "=>":
                    continue
                return expr[:i].strip(), op, expr[i + len(op):].strip()
    return None


def evaluate_stmt(stmt):
    body = stmt[len("SELECT "):].rstrip(";").strip()
    sp = split_op(body)
    if sp:
        lhs, op, rhs = sp
        ltv = parse_tp_operand(lhs)
        if ltv is None:
            raise Skip("lhs not tpoint: " + lhs[:40])
        if op in ("?=", "%="):
            g = parse_geo_operand(rhs)
            if g is None:
                raise Skip("rhs: " + rhs[:40])
            kind, coords, srid, is_geog = g
            if kind == "point_empty":
                return "f"  # ever/always vs empty geometry is false
            ensure_tpoint_geo_operand(
                ltv, kind, coords, srid, is_geog,
                tv_geodetic=lhs.lstrip().lower().startswith("tgeog"))
            r = everops.ever("eq", ltv, coords) if op == "?=" \
                else everops.always("eq", ltv, coords)
            return "t" if r else "f"
        rtv = parse_tp_operand(rhs)
        if rtv is None:
            raise Skip("rhs not tpoint: " + rhs[:40])
        c = tpoint_cmp_ref(ltv, rtv)
        # '<=' bound to equality: pinned reference defect #1
        r = {"=": c == 0, "<>": c != 0, "<": c < 0, "<=": c == 0,
             ">": c > 0, ">=": c >= 0}[op]
        return "t" if r else "f"
    tv = parse_tp_operand(body)
    if tv is not None:
        return str(tv)
    m = FNCALL_RE.match(body)
    if not m:
        raise Skip("unparsed stmt: " + body[:50])
    fn, args_text = m.group(1), m.group(2)
    if fn.endswith("_typmod_in"):
        if "ARRAY[[" in args_text:
            raise ValueError("typmod array must be one-dimensional")
        if re.search(r",\s*NULL", args_text):
            raise ValueError("typmod array must not contain nulls")
        raise Skip("typmod_in ok form")
    guard(fn, args_text)
    mi = FNCALL_RE.match(args_text.strip())
    if fn.lower() in WRAPPERS and mi and \
            (mi.group(1).lower() in CONSTRUCTORS
             or mi.group(1).lower().endswith("pointinst")):
        tvc = eval_ctor(mi.group(1), mi.group(2))
        if tvc is not None:
            out = str(tvc)
            if fn.lower() in ("astext", "st_astext"):
                out = re.sub(r"^SRID=\d+;", "", out)
            return out
    return R51.evaluate(fn, args_text)


def test_51_rest_suite():
    gold = json.load(open(GOLD))
    assert len(gold) == 519
    ran = failed = 0
    for stmt, kind, exp in gold:
        try:
            got = evaluate_stmt(stmt)
            if kind == "ok":
                assert got == exp, (stmt, exp, got)
            else:
                raise AssertionError(f"expected error: {stmt} -> {exp}, "
                                     f"got {got}")
        except Skip:
            raise AssertionError(f"unexpected skip: {stmt}")
        except ValueError as e:
            assert kind == "error" and str(e) == exp, (stmt, exp, str(e))
        ran += 1
    assert ran == 519
