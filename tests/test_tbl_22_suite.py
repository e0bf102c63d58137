"""22_temporal_tbl run over the reference's own random tables:
duration-cast matrix, accessors, ever-comparisons, restriction
counts, shift/append — against the verbatim expected outputs
(`test/expected/22_temporal_tbl.test.out` via
scripts/port_tbl_goldens.py).  Every case runs (skipped == 0);
nine are excluded with pinned per-case proofs (KNOWN_DIVERGENT):
five reference defects and the four MAX(memSize) rows whose
published values are impossible under the in-tree varlena layouts
the literal suite certifies."""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_tbl_suites import _norm  # noqa: E402
from test_tbl_time_suites import (fmt_interval, load_fileorder,  # noqa: E402
                                  parse_interval)
from test_temporal22_suite import append_instant  # noqa: E402

import numpy as np  # noqa: E402

from mobilitydb_spark import casts, everops, restrict  # noqa: E402
from mobilitydb_spark.types import (INSTANT, INSTANTSET, SEQUENCE,  # noqa: E402
                                    SEQUENCESET, Period, Temporal, fmt_ts)

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "goldens")

DUR_NAME = {INSTANT: "Instant", INSTANTSET: "InstantSet",
            SEQUENCE: "Sequence", SEQUENCESET: "SequenceSet"}
CAST_FN = {"inst": casts.to_instant, "i": casts.to_instant_set,
           "seq": casts.to_sequence, "s": casts.to_sequence_set}
EVER_OP = {"?=": "eq", "?<>": "ne", "?<": "lt", "?<=": "le",
           "?>": "gt", "?>=": "ge"}


class Skip(Exception):
    pass


_RAW_CACHE: dict[str, list] = {}


def _raw_fileorder(table: str) -> list:
    """Unparsed literal strings in pg_dump COPY (heap) order — for
    text-valued accessors where the vocab coding would lose the
    actual strings."""
    if table not in _RAW_CACHE:
        import pyarrow.parquet as pq
        from test_tbl_suites import FIX
        t = pq.read_table(os.path.join(FIX, f"{table}.parquet"))
        _RAW_CACHE[table] = t.column("v").to_pylist()
    return _RAW_CACHE[table]


def _pg_round6(x: float) -> str:
    """PG `round(float8::numeric, 6)` rendering: float8→numeric goes
    through %.15g (float8_numeric uses DBL_DIG significant digits),
    then rounds half-up at 6 decimals."""
    from decimal import ROUND_HALF_UP, Decimal
    return str(Decimal(f"{float(x):.15g}").quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _nn(table):
    return [v for v in load_fileorder(table) if v is not None]


def _cast_suffix(fn: str) -> str:
    m = re.match(r"^t(?:bool|int|float|text)(inst|i|seq|s)$", fn)
    assert m, fn
    return m.group(1)


def _tspan(tv: Temporal) -> int:
    return sum(int(s.times[-1]) - int(s.times[0]) for s in tv.seqs)


def eval22(sql: str):
    s = re.sub(r"\s+", " ", sql.strip().rstrip(";")).strip()
    low = s.lower()

    # --- DISTINCT duration(cast(col)) ------------------------------------
    m = re.match(
        r"(?i)^select distinct duration\((\w+)\((\w+)\)\) from (tbl_\w+)"
        r"(?: where (numinstants|numsequences)\(\w+\) = 1)?$", s)
    if m:
        fn, _col, table, filt = m.groups()
        out = set()
        has_null = False
        for v in load_fileorder(table):
            if v is None:
                if not filt:
                    has_null = True
                continue
            if filt and (v.num_instants() if filt.lower() == "numinstants"
                         else v.num_sequences()) != 1:
                continue
            out.add(DUR_NAME[CAST_FN[_cast_suffix(fn)](v).duration])
        res = ([""] if has_null else []) + sorted(out)
        return res if len(res) != 1 else res[0]

    # --- ever comparisons vs startValue ----------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+) where temp "
        r"(\?=|\?<>|\?<=|\?>=|\?<|\?>) startvalue\(temp\)$", s)
    if m:
        table, op = m.groups()
        n = 0
        for v in _nn(table):
            v0 = float(v.seqs[0].values[0][0])
            if everops.ever(EVER_OP[op], v, v0):
                n += 1
        return n

    # --- restriction pair counts -----------------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+), (tbl_\w+) where "
        r"(\w+)\(temp, (\w+)\) is not null$", s)
    if m:
        ttab, otab, fn, _oc = m.groups()
        fn = fn.lower()
        temps = _nn(ttab)
        others = _nn(otab)

        def apply(v, o):
            if fn in ("atvalue", "minusvalue", "atrange", "minusrange"):
                from test_tbl_suites import _vocab_rank
                from mobilitydb_spark import rangeops
                if fn in ("atvalue", "minusvalue"):
                    x = _vocab_rank(o) if otab == "tbl_text" else float(o)
                    f = (restrict.at_value if fn == "atvalue"
                         else restrict.minus_value)
                    return f(v, x)
                r = rangeops.NumRange.parse(o, int_range="int" in otab)
                if r.empty:
                    return None
                f = (restrict.at_range if fn == "atrange"
                     else restrict.minus_range)
                return f(v, r.lower, r.upper, r.lower_inc, r.upper_inc,
                         step_seq_quirk=True)
            if fn == "attimestamp":
                return restrict.at_timestamp(v, o)
            if fn == "minustimestamp":
                return restrict.minus_timestamp(v, o)
            if fn == "valueattimestamp":
                return v.value_at(o)
            if fn == "intersectstimestamp":
                return restrict.intersects_timestamp(v, o)
            if fn == "attimestampset":
                return restrict.at_timestampset(v, o)
            if fn == "minustimestampset":
                return restrict.minus_timestampset(v, o)
            if fn == "intersectstimestampset":
                return any(restrict.intersects_timestamp(v, t) for t in o)
            if fn == "atperiod":
                return restrict.at_period(v, o)
            if fn == "minusperiod":
                return restrict.minus_period(v, o)
            if fn == "intersectsperiod":
                return restrict.intersects_period(v, o)
            if fn == "atperiodset":
                return restrict.at_periodset(v, o)
            if fn == "minusperiodset":
                return restrict.minus_periodset(v, o)
            if fn == "intersectsperiodset":
                return any(restrict.intersects_period(v, p) for p in o)
            raise Skip(fn)

        n = 0
        for v in temps:
            for o in others:
                r = apply(v, o)
                if r is not None and not (isinstance(r, bool) and False):
                    n += 1
        return n

    # --- ALWAYS comparisons vs scalar tables ------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+), (tbl_int|tbl_float|"
        r"tbl_text) where temp (%=|%<>|%<=|%>=|%<|%>) (\w+)$", s)
    if m:
        ttab, stab, op, _sc = m.groups()
        from test_tbl_suites import _vocab_rank
        scal = [(_vocab_rank(v) if stab == "tbl_text" else float(v))
                for v in _nn(stab)]
        n = 0
        for v in _nn(ttab):
            for x in scal:
                if everops.always(EVER_OP["?" + op[1:]], v, x):
                    n += 1
        return n

    # --- EVER comparisons vs scalar tables --------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+), (tbl_int|tbl_float|"
        r"tbl_text) where temp (\?=|\?<>|\?<=|\?>=|\?<|\?>) (\w+)$", s)
    if m:
        ttab, stab, op, _sc = m.groups()
        from test_tbl_suites import _vocab_rank
        scal = [(_vocab_rank(v) if stab == "tbl_text" else float(v))
                for v in _nn(stab)]
        n = 0
        for v in _nn(ttab):
            for x in scal:
                if everops.ever(EVER_OP[op], v, x):
                    n += 1
        return n

    # --- atValue/minusValue vs scalar tables ------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+), (tbl_int|tbl_float|"
        r"tbl_text) where (atvalue|minusvalue)\(temp, \w+\) is not null$", s)
    if m:
        ttab, stab, fn = m.groups()
        from test_tbl_suites import _vocab_rank
        scal = [(_vocab_rank(v) if stab == "tbl_text" else float(v))
                for v in _nn(stab)]
        f = restrict.at_value if fn.lower() == "atvalue" \
            else restrict.minus_value
        n = 0
        for v in _nn(ttab):
            for x in scal:
                if f(v, x) is not None:
                    n += 1
        return n

    # --- atRange/minusRange vs range tables -------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+), (tbl_intrange|"
        r"tbl_floatrange) where (atrange|minusrange)\(temp, \w+\) "
        r"is not null$", s)
    if m:
        ttab, rtab, fn = m.groups()
        from mobilitydb_spark import rangeops
        ranges = [rangeops.NumRange.parse(v, int_range="int" in rtab)
                  for v in _nn(rtab)]
        f = restrict.at_range if fn.lower() == "atrange" \
            else restrict.minus_range
        n = 0
        for v in _nn(ttab):
            for r in ranges:
                if r.empty:
                    continue
                if f(v, r.lower, r.upper, r.lower_inc,
                     r.upper_inc) is not None:
                    n += 1
        return n

    # --- total-order comparison pair counts -------------------------------
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+) t1, \1 t2 where "
        r"t1\.temp (<=|<|>=|>|=|<>) t2\.temp$", s)
    if m:
        table, op = m.groups()
        rows = _nn(table)
        n = 0
        for a in rows:
            for b in rows:
                c = everops.temporal_cmp(a, b)
                if {"<": c < 0, "<=": c <= 0, ">": c > 0,
                        ">=": c >= 0, "=": c == 0, "<>": c != 0}[op]:
                    n += 1
        return n

    # --- COUNT(shift(temp, i)) -------------------------------------------
    m = re.match(r"(?i)^select count\(shift\(temp, i\)\) from (tbl_\w+), "
                 r"tbl_interval$", s)
    if m:
        temps = _nn(m.group(1))
        ivs = [parse_interval(v) for v in _nn("tbl_interval")]
        n = 0
        for v in temps:
            for us in ivs:
                if v.shift(us) is not None:
                    n += 1
        return n

    # --- single-table accessor COUNTs ------------------------------------
    m = re.match(r"(?i)^select count\((\w+)\(temp(?:, numinstants\(temp\))?"
                 r"\)\) from (tbl_\w+)$", s)
    if m:
        fn, table = m.group(1).lower(), m.group(2)
        n = 0
        for v in _nn(table):
            if fn in ("startinstant", "endinstant", "instantn"):
                n += 1
            elif fn in ("minusmin", "minusmax"):
                r = (restrict.minus_min(v) if fn == "minusmin"
                     else restrict.minus_max(v))
                if r is not None:
                    n += 1
            else:
                raise Skip(fn)
        return n

    # --- DISTINCT duration(cast(col)) with a timespan filter --------------
    m = re.match(
        r"(?i)^select distinct duration\((\w+)\((\w+)\)\) from (tbl_\w+) "
        r"where timespan\(\w+\) = '([^']*)'$", s)
    if m:
        fn, _col, table, iv = m.groups()
        want_us = parse_interval(iv)
        out = set()
        for v in _nn(table):
            if _tspan(v) != want_us:
                continue
            out.add(DUR_NAME[CAST_FN[_cast_suffix(fn)](v).duration])
        return out

    # --- tint -> tfloat cast totality counts -------------------------------
    m = re.match(r"(?i)^select count\(\*\) from (tbl_\w+) where "
                 r"tfloat\(\w+\) is not null$", s)
    if m:
        return len(_nn(m.group(1)))

    # --- DISTINCT duration(temp) ORDER BY 1 (NULLS LAST) -------------------
    m = re.match(r"(?i)^select distinct duration\(temp\) from (tbl_\w+) "
                 r"order by 1$", s)
    if m:
        rows = load_fileorder(m.group(1))
        out = sorted({DUR_NAME[v.duration] for v in rows if v is not None})
        if any(v is None for v in rows):
            out.append("")
        return out

    # --- value accessors: MAX / round(MAX ::numeric 6) / DISTINCT ---------
    VFN = r"(getvalue|startvalue|endvalue|minvalue|maxvalue)"
    mi = re.match(rf"(?i)^select max\({VFN}\((temp|inst|ti|seq|ts)\)\) "
                  rf"from (tbl_\w+)$", s)
    mf = re.match(rf"(?i)^select round\(max\({VFN}\((temp|inst|ti|seq|ts)"
                  rf"\)\)::numeric, 6\) from (tbl_\w+)$", s)
    md = re.match(rf"(?i)^select distinct {VFN}\((temp|inst|ti|seq|ts)\) "
                  rf"from (tbl_\w+)$", s)
    if mi or mf or md:
        m = mi or mf or md
        fn, _col, table = m.group(1).lower(), m.group(2), m.group(3)
        is_text = table.startswith("tbl_ttext")
        is_bool = table.startswith("tbl_tbool")

        def row_val(parsed, raw):
            if is_text:
                words = re.findall(r'"([^"]*)"', raw)
                return {"getvalue": words[0], "startvalue": words[0],
                        "endvalue": words[-1], "minvalue": min(words),
                        "maxvalue": max(words)}[fn]
            vals = np.concatenate(
                [sq.values[:, 0] for sq in parsed.seqs])
            return {"getvalue": vals[0], "startvalue": vals[0],
                    "endvalue": float(parsed.seqs[-1].values[-1][0]),
                    "minvalue": vals.min(), "maxvalue": vals.max()}[fn]

        parsed_rows = load_fileorder(table)
        raw_rows = _raw_fileorder(table)
        vals = [row_val(p, r) for p, r in zip(parsed_rows, raw_rows)
                if p is not None]
        if md:  # DISTINCT, no ORDER BY: compare unordered
            out = set()
            for v in vals:
                out.add(("t" if v else "f") if is_bool else str(v))
            if any(p is None for p in parsed_rows):
                out.add("")
            return out
        best = max(vals)
        if mf:
            return _pg_round6(float(best))
        return best if is_text else int(best)

    # --- MAX(array_length(getValues(temp), 1)) ----------------------------
    m = re.match(r"(?i)^select max\(array_length\(getvalues\(temp\), 1\)\) "
                 r"from (tbl_\w+)$", s)
    if m:
        table = m.group(1)
        is_text = table == "tbl_ttext"
        raw_rows = _raw_fileorder(table)

        def nvals(parsed, raw):
            if is_text:
                return len(set(re.findall(r'"([^"]*)"', raw)))
            if table == "tbl_tfloat":
                # tfloat getValues returns floatranges
                # (src/temporalseq.c:1596-1622, temporals.c:843-858)
                if parsed.duration in (INSTANT, INSTANTSET):
                    return len({float(sq.values[0][0])
                                for sq in parsed.seqs})
                rngs = sorted((float(sq.values[:, 0].min()),
                               float(sq.values[:, 0].max()))
                              for sq in parsed.seqs)
                n, cur_hi = 0, None
                for lo, hi in rngs:  # closed ranges: merge on touch
                    if cur_hi is None or lo > cur_hi:
                        n += 1
                        cur_hi = hi
                    else:
                        cur_hi = max(cur_hi, hi)
                return n
            return len({float(x) for sq in parsed.seqs
                        for x in sq.values[:, 0]})

        return max(nvals(p, r) for p, r in
                   zip(load_fileorder(table), raw_rows) if p is not None)

    # --- round(MAX(upper(valueRange(temp)))::numeric, 6) -------------------
    m = re.match(r"(?i)^select round\(max\(upper\(valuerange\(temp\)\)\)"
                 r"::numeric, 6\) from (tbl_\w+)$", s)
    if m:
        table = m.group(1)
        best = max(float(np.concatenate(
            [sq.values[:, 0] for sq in v.seqs]).max())
            for v in _nn(table))
        if table == "tbl_tint":
            best += 1  # intrange upper canonicalized to exclusive
        return _pg_round6(best)

    # --- always/ever vs a bool literal ------------------------------------
    m = re.match(r"(?i)^select count\(\*\) from (tbl_\w+) where temp "
                 r"(%=|%<>|\?=|\?<>) (true|false)$", s)
    if m:
        table, op, lit = m.groups()
        x = 1.0 if lit.lower() == "true" else 0.0
        f = everops.always if op.startswith("%") else everops.ever
        cmpk = EVER_OP["?" + op[1:]]
        return sum(1 for v in _nn(table) if f(cmpk, v, x))

    # --- at/minusValue(temp, bool literal) ---------------------------------
    m = re.match(r"(?i)^select count\(\*\) from (tbl_\w+) where "
                 r"(atvalue|minusvalue)\(temp, (true|false)\) "
                 r"is not null$", s)
    if m:
        table, fn, lit = m.groups()
        x = 1.0 if lit.lower() == "true" else 0.0
        f = restrict.at_value if fn.lower() == "atvalue" \
            else restrict.minus_value
        return sum(1 for v in _nn(table) if f(v, x) is not None)

    # --- at/minusValues|Ranges(temp, array_agg subquery) -------------------
    # (the subquery's LIMIT 10 applies to the single aggregated row,
    # so valuearr holds ALL non-null source values)
    m = re.match(
        r"(?i)^select count\(\*\) from (tbl_\w+), \( select "
        r"array_agg\(\w+\) as valuearr from (tbl_\w+) where \w+ is not "
        r"null limit 10 \) tmp where (atvalues|minusvalues|atranges|"
        r"minusranges)\(temp, valuearr\) is not null$", s)
    if m:
        ttab, stab, fn = m.group(1), m.group(2), m.group(3).lower()
        from test_tbl_suites import _vocab_rank
        if fn in ("atvalues", "minusvalues"):
            targets = np.array(
                [_vocab_rank(v) if stab == "tbl_text" else float(v)
                 for v in _nn(stab)])[:, None]
            f = restrict.at_values if fn == "atvalues" \
                else restrict.minus_values
            return sum(1 for v in _nn(ttab)
                       if f(v, targets) is not None)
        from mobilitydb_spark import rangeops
        rngs = [rangeops.NumRange.parse(v, int_range="int" in stab)
                for v in _nn(stab)]
        args = [(r.lower, r.upper, r.lower_inc, r.upper_inc)
                for r in rngs if not r.empty]
        f = restrict.at_ranges if fn == "atranges" \
            else restrict.minus_ranges
        return sum(1 for v in _nn(ttab) if f(v, args) is not None)

    # --- minusMin/minusMax count-star --------------------------------------
    m = re.match(r"(?i)^select count\(\*\) from (tbl_\w+) where "
                 r"(minusmin|minusmax)\(temp\) is not null$", s)
    if m:
        f = restrict.minus_min if m.group(2).lower() == "minusmin" \
            else restrict.minus_max
        return sum(1 for v in _nn(m.group(1)) if f(v) is not None)

    # --- integral / twAvg sums ---------------------------------------------
    m = re.match(r"(?i)^select round\(sum\((integral|twavg)\(temp\)\)"
                 r"::numeric, 6\) from (tbl_\w+)$", s)
    if m:
        from mobilitydb_spark import aggs
        f = aggs.tnumber_integral if m.group(1).lower() == "integral" \
            else aggs.tnumber_twavg
        total = 0.0
        for v in load_fileorder(m.group(2)):  # heap-order seq-scan sum
            if v is not None:
                total += f(v)
        return _pg_round6(total)

    # --- MAX(...) accessor families --------------------------------------
    m = re.match(r"(?i)^select max\((.+)\) from (tbl_\w+)$", s)
    if m:
        expr = re.sub(r"\s+", "", m.group(1).lower())
        table = m.group(2)
        rows = _nn(table)
        col = r"(?:temp|inst|ti|seq|ts)"
        if re.fullmatch(rf"timespan\({col}\)", expr):
            return fmt_interval(max(_tspan(v) for v in rows))
        if re.fullmatch(rf"timespan\(period\({col}\)\)", expr):
            return fmt_interval(max(
                int(v.times.max()) - int(v.times.min()) for v in rows))
        if re.fullmatch(rf"timespan\(gettime\({col}\)\)", expr):
            return fmt_interval(max(_tspan(v) for v in rows))
        if re.fullmatch(rf"numinstants\({col}\)", expr):
            return max(v.num_instants() for v in rows)
        if re.fullmatch(rf"numsequences\({col}\)", expr):
            return max(v.num_sequences() for v in rows)
        if re.fullmatch(rf"numtimestamps\({col}\)", expr):
            return max(v.num_instants() for v in rows)
        if re.fullmatch(rf"endtimestamp\({col}\)|timestampn\({col},"
                        rf"numtimestamps\({col}\)\)", expr):
            return fmt_ts(max(int(v.times.max()) for v in rows))
        if re.fullmatch(rf"starttimestamp\({col}\)", expr):
            return fmt_ts(max(int(v.times.min()) for v in rows))
        if re.fullmatch(rf"gettimestamp\({col}\)", expr):
            return fmt_ts(max(int(v.times[0]) for v in rows))
        if re.fullmatch(rf"array_length\(instants\({col}\),1\)", expr):
            return max(v.num_instants() for v in rows)
        if re.fullmatch(rf"array_length\(timestamps\({col}\),1\)", expr):
            return max(v.num_instants() for v in rows)
        if re.fullmatch(rf"array_length\(sequences\({col}\),1\)", expr):
            return max(v.num_sequences() for v in rows)
        if re.fullmatch(rf"timespan\((?:start|end)sequence\({col}\)\)", expr):
            pick = 0 if "start" in expr else -1
            return fmt_interval(max(
                int(v.seqs[pick].times[-1]) - int(v.seqs[pick].times[0])
                for v in rows))
        if re.fullmatch(rf"timespan\(sequencen\({col},numsequences\({col}\)"
                        rf"\)\)", expr):
            return fmt_interval(max(
                int(v.seqs[-1].times[-1]) - int(v.seqs[-1].times[0])
                for v in rows))
        if re.fullmatch(rf"numinstants\(at(?:min|max)\({col}\)\)", expr):
            f = restrict.at_min if "atmin" in expr else restrict.at_max
            best = 0
            for v in rows:
                r = f(v)
                if r is not None:
                    best = max(best, r.num_instants())
            return best
        if re.fullmatch(
                rf"numinstants\(appendinstant\({col},shift\(endinstant"
                rf"\({col}\),'5min'\)\)\)", expr):
            best = 0
            for v in rows:
                last = Temporal(INSTANT, [v.seqs[-1].__class__(
                    v.seqs[-1].times[-1:] + 300_000_000,
                    v.seqs[-1].values[-1:].copy())],
                    v.linear, v.srid, v.step_default)
                best = max(best, append_instant(v, last).num_instants())
            return best
        raise Skip(expr)

    raise Skip(s[:60])


# Reference defects, excluded with proof:
#  214 — `tfloat ?<> startValue`: temporali/temporalseq_always_eq's
#        FLOAT8 bbox shortcut compares `(int) box.xmax ==
#        DatumGetFloat8(value)` (src/temporali.c:793,
#        src/temporalseq.c:1878 — an int cast on the float bound), so
#        every CONSTANT non-integer float multi-instant temporal
#        reports always_eq false → ever_ne true.  The fixture has
#        exactly 11 such rows (8 instant sets + 3 sequences, verified
#        constant-valued) = the 72-vs-61 gap; single instants route
#        through temporalinst_always_eq, which compares correctly.
#  337/343/349/355 — `t1.temp <= t2.temp` counts equal the suite's
#        own `=` counts (106/104/106/108) instead of `<`+`=`
#        (4661/4660/4661/4662): the catalog's <= operator is bound to
#        the equality function.  Our counts satisfy the identity
#        against the suite's own `<`, `=`, `>`, `>=` rows.
KNOWN_DIVERGENT = {214: "always_eq float int-cast",
                   337: "<= bound to =", 343: "<= bound to =",
                   349: "<= bound to =", 355: "<= bound to =",
                   # 76-79 MAX(memSize(temp)): the published maxes
                   # (1904/1976/1936/1752) are IMPOSSIBLE under the
                   # in-tree varlena layouts that the literal suite's
                   # own 18 memSize goldens certify bit-exactly
                   # (types.temporal_mem_size): the committed dump's
                   # tbl_tbool max row has 52 instants (its
                   # MAX(numInstants) golden, case 160, PASSES), and
                   # 52 instants cost >= 48 + 40*52 = 2128 bytes in
                   # the CHEAPEST duration (InstantSet) — already over
                   # 1904; the actual max rows are 9-sequence sets
                   # (2928/2808/3008/3480).  Like 32_temporal_box_tbl,
                   # these four rows are tied to a stale binary whose
                   # smaller structs predate the committed headers.
                   76: "memSize stale-binary layout",
                   77: "memSize stale-binary layout",
                   78: "memSize stale-binary layout",
                   79: "memSize stale-binary layout"}


def test_tbl_22_temporal():
    cases = json.load(open(os.path.join(GOLD, "tbl_22_temporal_tbl.json")))
    fails, skipped, ran = [], 0, 0
    for i, (sql, want) in enumerate(cases):
        if i in KNOWN_DIVERGENT:
            continue
        if i == 80:
            # extractor artifact: the .out keeps `SELECT period(temp)
            # FROM tbl_tbool;` inside a /* */ comment block
            # (22_temporal_tbl.test.out:571-578) and the parser paired
            # it with the output of the next REAL query, swallowing
            # that query's own SELECT line.  Run the real query.
            sql = "SELECT DISTINCT getValue(inst) FROM tbl_tboolinst;"
        try:
            got = eval22(sql)
        except Skip:
            skipped += 1
            continue
        ran += 1
        if isinstance(got, set):  # DISTINCT without ORDER BY
            ok = sorted(got) == sorted(
                want if isinstance(want, list) else [want])
        else:
            ok = _norm(got) == _norm(want)
        if not ok:
            fails.append((i, sql[:80], str(want)[:50], str(got)[:50]))
    assert not fails, (len(fails), fails[:8])
    assert ran >= 349, (ran, skipped)
    assert skipped == 0, skipped
