"""Temporal value model: periods + temporal values (tpoint/tfloat/…).

Re-expression of MobilityDB's type system (SURVEY §1) for Spark:

- ``Period`` — closed/open timestamp interval, never empty
  (`include/timetypes.h:27-33`)
- ``PeriodSet`` — sorted disjoint periods (`timetypes.h:43-48`)
- ``Temporal`` — the 4-duration hierarchy Instant / InstantSet /
  Sequence / SequenceSet (`include/temporal.h:42-47`); values are
  numpy arrays shaped (n_instants, dim) with dim=1 for tfloat/tint
  and dim=2 for tpoint, timestamps int64 microseconds UTC.

Invariants preserved from the reference (`src/temporalseq.c`):
- sequences normalized: redundant collinear (linear) / repeated
  (stepwise) instants merged (`temporalseq.c:385`
  ``temporalinstarr_normalize``)
- sequence sets hold disjoint, sorted sequences (`:470`)
- instantaneous sequences are ``[v@t]`` inclusive on both ends
- value at t inside a linear segment = linear interpolation
  (`temporalseq.c:3111-3160`)

The literal grammar (``Point(1 1)@2000-01-01``, ``{…}``, ``[…)``,
``SRID=…;`` / ``Interp=Stepwise;`` prefixes) follows
`src/temporal_parser.c:412-598` and `point/src/tpoint_parser.c`; it
exists for golden-file fixtures and tests — table data uses the
struct encoding directly.

Spark-side encoding (one struct column, see ``TPOINT_SPARK_SCHEMA``)
uses a uniform sequence-list layout for all four durations; the
``duration`` tag keeps reference-faithful output forms.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

EPSILON = 1.0e-6  # include/temporal.h:30

INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET = 1, 2, 3, 4
_DUR_NAMES = {INSTANT: "Instant", INSTANTSET: "InstantSet",
              SEQUENCE: "Sequence", SEQUENCESET: "SequenceSet"}

US = np.int64(1)  # timestamps are int64 microseconds since epoch (UTC)

TPOINT_SPARK_SCHEMA = (
    "struct<duration:tinyint,srid:int,linear:boolean,"
    "seqs:array<struct<lower_inc:boolean,upper_inc:boolean,"
    "insts:array<struct<t:timestamp,x:double,y:double>>>>>")

TFLOAT_SPARK_SCHEMA = (
    "struct<duration:tinyint,srid:int,linear:boolean,"
    "seqs:array<struct<lower_inc:boolean,upper_inc:boolean,"
    "insts:array<struct<t:timestamp,v:double>>>>>")


# ---------------------------------------------------------------------------
# timestamps
# ---------------------------------------------------------------------------

def parse_ts(s: str) -> np.int64:
    """ISO timestamp → int64 µs UTC (harness pins UTC, test.sh:32)."""
    s = s.strip()
    m = re.match(r"^(.*?)([+-]\d{2})(:?\d{2})?$", s)
    off_us = 0
    if m and not re.match(r".*\d{4}-\d{2}$", m.group(1)):
        base, hh, mm = m.group(1), m.group(2), m.group(3)
        if len(base) >= 10:  # time part, or bare date → ±HH is an offset
            # (date-only '2001-01-01+00' = offset from midnight, the
            # pre-junk-check behaviour; PG accepts it the same way)
            s = base
            off_us = int(hh) * 3600_000_000
            if mm:
                off_us += int(np.sign(int(hh)) or 1) * int(mm.lstrip(":")) * 60_000_000
    s = s.strip()
    if s.endswith(("Z", "z")):  # np.datetime64 deprecated tz-aware input
        s = s[:-1]
    if re.search(r"[^0-9T:. \-]", s):
        # reject residual junk (e.g. a trailing comma) ourselves:
        # np.datetime64 would route it through its deprecated
        # tz-aware parser and warn before raising
        raise ValueError(f'Error parsing datetime string "{s}"')
    dt = np.datetime64(s.replace(" ", "T"), "us")
    return np.int64(dt.astype(np.int64) - off_us)


def fmt_ts(us: int) -> str:
    dt = np.datetime64(int(us), "us")
    s = str(dt)
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    s = s.replace("T", " ")
    if len(s) == 10:
        s += " 00:00:00"
    return s + "+00"


# ---------------------------------------------------------------------------
# Period / PeriodSet
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Period:
    """timetypes.h:27-33 — {lower, upper, lower_inc, upper_inc}."""
    lower: int
    upper: int
    lower_inc: bool = True
    upper_inc: bool = True

    def __post_init__(self):
        if self.upper < self.lower:
            raise ValueError("period upper < lower")
        if self.upper == self.lower and not (self.lower_inc and self.upper_inc):
            raise ValueError("instantaneous period must be inclusive")

    def contains_ts(self, t: int) -> bool:
        if t < self.lower or t > self.upper:
            return False
        if t == self.lower and not self.lower_inc:
            return False
        if t == self.upper and not self.upper_inc:
            return False
        return True

    def overlaps(self, other: "Period") -> bool:
        if self.upper < other.lower or other.upper < self.lower:
            return False
        if self.upper == other.lower:
            return self.upper_inc and other.lower_inc
        if other.upper == self.lower:
            return other.upper_inc and self.lower_inc
        return True

    def intersection(self, other: "Period") -> "Period | None":
        if not self.overlaps(other):
            return None
        if self.lower > other.lower:
            lo, lo_inc = self.lower, self.lower_inc
        elif self.lower < other.lower:
            lo, lo_inc = other.lower, other.lower_inc
        else:
            lo, lo_inc = self.lower, self.lower_inc and other.lower_inc
        if self.upper < other.upper:
            hi, hi_inc = self.upper, self.upper_inc
        elif self.upper > other.upper:
            hi, hi_inc = other.upper, other.upper_inc
        else:
            hi, hi_inc = self.upper, self.upper_inc and other.upper_inc
        return Period(lo, hi, lo_inc, hi_inc)

    def __str__(self):
        lb = "[" if self.lower_inc else "("
        ub = "]" if self.upper_inc else ")"
        return f"{lb}{fmt_ts(self.lower)}, {fmt_ts(self.upper)}{ub}"


def normalize_periods(periods: list[Period]) -> list[Period]:
    """Sort + merge overlapping/adjacent → canonical disjoint list
    (PeriodSet invariant, `src/timeops.c` union kernels)."""
    if not periods:
        return []
    ps = sorted(periods, key=lambda p: (p.lower, not p.lower_inc))
    out = [ps[0]]
    for p in ps[1:]:
        last = out[-1]
        touches = (p.lower < last.upper
                   or (p.lower == last.upper and (p.lower_inc or last.upper_inc)))
        if touches:
            if (p.upper, p.upper_inc) > (last.upper, last.upper_inc):
                out[-1] = Period(last.lower, max(last.upper, p.upper),
                                 last.lower_inc,
                                 p.upper_inc if p.upper >= last.upper
                                 else last.upper_inc)
        else:
            out.append(p)
    return out


# ---------------------------------------------------------------------------
# Temporal sequences
# ---------------------------------------------------------------------------

@dataclass
class Seq:
    """One (possibly instantaneous) sequence: times ascending, values
    shaped (n, dim)."""
    times: np.ndarray           # int64 µs, ascending, distinct
    values: np.ndarray          # float64 (n, dim)
    lower_inc: bool = True
    upper_inc: bool = True

    def __post_init__(self):
        self.times = np.asarray(self.times, dtype=np.int64)
        self.values = np.atleast_2d(np.asarray(self.values, dtype=np.float64))
        if self.values.shape[0] != len(self.times):
            self.values = self.values.T
        n = len(self.times)
        if n == 0:
            raise ValueError("empty sequence")
        if n > 1 and not (np.diff(self.times) > 0).all():
            raise ValueError("timestamps must be strictly increasing")
        if n == 1:
            self.lower_inc = self.upper_inc = True

    @property
    def period(self) -> Period:
        return Period(int(self.times[0]), int(self.times[-1]),
                      self.lower_inc, self.upper_inc)

    @property
    def dim(self) -> int:
        return self.values.shape[1]


def _collinear(v0, v1, v2, t0, t1, t2) -> bool:
    """Is v1 the linear interpolation of (v0, v2) at t1? (cf.
    ``float_collinear``/``geompoint_collinear`` `temporalseq.c:268-340`)."""
    if t2 == t0:
        return False
    ratio = (t1 - t0) / (t2 - t0)
    interp = v0 + (v2 - v0) * ratio
    return bool(np.all(np.abs(interp - v1) <= EPSILON))


def normalize_instants(times: np.ndarray, values: np.ndarray,
                       linear: bool) -> tuple[np.ndarray, np.ndarray]:
    """Drop redundant instants (`temporalseq.c:385`
    ``temporalinstarr_normalize``): for linear interp, middle instants
    collinear with neighbours; for stepwise, repeats of the previous
    value (except the last instant, which always stays)."""
    n = len(times)
    if n <= 2:
        return times, values
    # vectorized no-drop fast path: if NO instant is collinear with /
    # equal to its immediate neighbours, the sequential pass below
    # (whose reference point only moves when a drop happens) keeps
    # everything — skip the per-instant Python loop entirely.  This is
    # the overwhelmingly common case for measured trajectories.
    t0 = times[:-2].astype(np.float64)
    t1 = times[1:-1].astype(np.float64)
    t2 = times[2:].astype(np.float64)
    if linear:
        dt = t2 - t0
        ratio = np.where(dt != 0.0, (t1 - t0) / np.where(dt == 0, 1.0, dt),
                         np.nan)
        interp = values[:-2] + (values[2:] - values[:-2]) * ratio[:, None]
        cand = (dt != 0.0) & np.all(np.abs(interp - values[1:-1]) <= EPSILON,
                                    axis=1)
    else:
        cand = np.all(np.abs(values[1:-1] - values[:-2]) <= EPSILON, axis=1)
    if not cand.any():
        return times, values
    keep = np.ones(n, dtype=bool)
    j = 0  # last kept index
    for i in range(1, n - 1):
        if linear:
            if _collinear(values[j], values[i], values[i + 1],
                          times[j], times[i], times[i + 1]):
                keep[i] = False
            else:
                j = i
        else:
            if np.all(np.abs(values[i] - values[j]) <= EPSILON):
                keep[i] = False
            else:
                j = i
    return times[keep], values[keep]


@dataclass
class Temporal:
    """A temporal value of any duration, uniform sequence-list layout.

    ``step_default`` marks base types whose interpolation default is
    stepwise (tint/tbool/ttext) — they never print the
    ``Interp=Stepwise;`` prefix, unlike stepwise tfloat/tpoint.
    """
    duration: int
    seqs: list[Seq] = field(default_factory=list)
    linear: bool = True
    srid: int = 0
    step_default: bool = False

    # -- constructors -------------------------------------------------
    @staticmethod
    def instant(t: int, value, srid: int = 0, linear: bool = True) -> "Temporal":
        return Temporal(INSTANT, [Seq(np.array([t]), np.array([value]))],
                        linear, srid)

    @staticmethod
    def instant_set(times, values, srid: int = 0, linear: bool = True) -> "Temporal":
        times = np.asarray(times, dtype=np.int64)
        values = np.atleast_2d(np.asarray(values, dtype=np.float64))
        if values.shape[0] != len(times):
            values = values.T
        order = np.argsort(times, kind="stable")
        times, values = times[order], values[order]
        if len(np.unique(times)) != len(times):
            raise ValueError("duplicate timestamps in instant set")
        seqs = [Seq(times[i:i + 1], values[i:i + 1]) for i in range(len(times))]
        return Temporal(INSTANTSET, seqs, linear, srid)

    @staticmethod
    def sequence(times, values, lower_inc=True, upper_inc=True,
                 srid: int = 0, linear: bool = True,
                 normalize: bool = True) -> "Temporal":
        times = np.asarray(times, dtype=np.int64)
        values = np.atleast_2d(np.asarray(values, dtype=np.float64))
        if values.shape[0] != len(times):
            values = values.T
        if normalize:
            times, values = normalize_instants(times, values, linear)
        return Temporal(SEQUENCE, [Seq(times, values, lower_inc, upper_inc)],
                        linear, srid)

    @staticmethod
    def sequence_set(seqs: list[Seq], srid: int = 0, linear: bool = True,
                     normalize: bool = True) -> "Temporal":
        seqs = sorted(seqs, key=lambda s: (s.times[0], not s.lower_inc))
        for a, b in zip(seqs, seqs[1:]):
            if a.period.overlaps(b.period):
                raise ValueError("overlapping sequences in sequence set")
        if normalize:
            seqs = [Seq(*normalize_instants(s.times, s.values, linear),
                        s.lower_inc, s.upper_inc) for s in seqs]
        return Temporal(SEQUENCESET, seqs, linear, srid)

    # -- accessors (SURVEY §2.7; src/temporal.c:1264-2098) -------------
    @property
    def times(self) -> np.ndarray:
        return np.concatenate([s.times for s in self.seqs])

    @property
    def values(self) -> np.ndarray:
        return np.vstack([s.values for s in self.seqs])

    @property
    def dim(self) -> int:
        return self.seqs[0].dim

    def num_instants(self) -> int:
        return sum(len(s.times) for s in self.seqs)

    def num_sequences(self) -> int:
        return len(self.seqs)

    def start_value(self):
        return self.seqs[0].values[0]

    def end_value(self):
        return self.seqs[-1].values[-1]

    def min_value(self):
        return self.values.min(axis=0)

    def max_value(self):
        return self.values.max(axis=0)

    def start_timestamp(self) -> int:
        return int(self.seqs[0].times[0])

    def end_timestamp(self) -> int:
        return int(self.seqs[-1].times[-1])

    def period(self) -> Period:
        return Period(self.start_timestamp(), self.end_timestamp(),
                      self.seqs[0].lower_inc, self.seqs[-1].upper_inc)

    def get_time(self) -> list[Period]:
        """Time domain as a normalized period list (getTime,
        `src/temporal.c:1502`)."""
        return normalize_periods([s.period for s in self.seqs])

    def timespan(self) -> int:
        return self.end_timestamp() - self.start_timestamp()

    def duration_us(self) -> int:
        """Total defined duration (sum over sequences)."""
        return int(sum(int(s.times[-1]) - int(s.times[0]) for s in self.seqs))

    def shift(self, delta_us: int) -> "Temporal":
        out = Temporal(self.duration,
                       [Seq(s.times + np.int64(delta_us), s.values.copy(),
                            s.lower_inc, s.upper_inc) for s in self.seqs],
                       self.linear, self.srid, self.step_default)
        out.is_bool = self.is_bool
        return out

    # -- interpolation (temporalseq.c:3111-3160) -----------------------
    def value_at(self, t: int):
        """Exact value at timestamp t, or None outside the domain."""
        for s in self.seqs:
            if not s.period.contains_ts(t):
                continue
            i = int(np.searchsorted(s.times, t, side="right")) - 1
            if i >= 0 and s.times[i] == t:
                return s.values[i].copy()
            if not self.linear:
                return s.values[i].copy()
            t0, t1 = s.times[i], s.times[i + 1]
            ratio = (t - t0) / (t1 - t0)
            return s.values[i] + (s.values[i + 1] - s.values[i]) * ratio
        return None

    # tbool values print as t/f (set by the parser on t/f literals and
    # propagated by the boolean ops)
    is_bool: bool = False

    # -- output --------------------------------------------------------
    def _fmt_value(self, v: np.ndarray) -> str:
        def num(x):
            if x == int(x):
                return str(int(x))
            return repr(float(x))

        def coord(x):
            # point coordinates print through PostGIS lwprint (%.15g),
            # unlike plain tfloat values (PG float8out shortest-repr)
            # — visible on transform_gk outputs (56-suite goldens)
            return str(int(x)) if x == int(x) else f"{float(x):.15g}"
        if self.dim == 3:
            return (f"POINT Z ({coord(v[0])} {coord(v[1])} "
                    f"{coord(v[2])})")
        if self.dim == 2:
            return f"POINT({coord(v[0])} {coord(v[1])})"
        if self.is_bool:
            return "t" if v[0] > 0.5 else "f"
        return num(v[0])

    def __str__(self):
        def inst_str(s: Seq, i: int) -> str:
            return f"{self._fmt_value(s.values[i])}@{fmt_ts(s.times[i])}"

        def seq_str(s: Seq) -> str:
            body = ", ".join(inst_str(s, i) for i in range(len(s.times)))
            lb = "[" if s.lower_inc else "("
            ub = "]" if s.upper_inc else ")"
            return f"{lb}{body}{ub}"

        prefix = ""
        if self.srid:
            prefix += f"SRID={self.srid};"
        if not self.linear and not self.step_default \
                and self.duration in (SEQUENCE, SEQUENCESET):
            prefix += "Interp=Stepwise;"
        if self.duration == INSTANT:
            return prefix + inst_str(self.seqs[0], 0)
        if self.duration == INSTANTSET:
            return prefix + "{" + ", ".join(
                inst_str(s, 0) for s in self.seqs) + "}"
        if self.duration == SEQUENCE:
            return prefix + seq_str(self.seqs[0])
        return prefix + "{" + ", ".join(seq_str(s) for s in self.seqs) + "}"

    def duration_name(self) -> str:
        return _DUR_NAMES[self.duration]


def _dpad(x: int) -> int:
    return (x + 7) & ~7


def temporal_mem_size(tv: "Temporal",
                      text_bytes: "list[int] | None" = None) -> int:
    """memSize: the reference's varlena byte size, replicated from the
    in-tree layouts (`include/temporal.h:142-190` + the constructors'
    size arithmetic):

    - TemporalInst  = double_pad(24) + value  (`temporalinst_make`,
      temporalinst.c:104-129); by-value base types store a padded
      8-byte Datum, text stores double_pad(4 + bytes)
    - TemporalI     = double_pad(24 + n·8) + double_pad(bbox)
      + Σ double_pad(inst)               (temporali.c:126-134)
    - TemporalSeq   = double_pad(48) + (n+1)·8 + double_pad(bbox)
      + Σ double_pad(inst)               (temporalseq.c:624-648)
    - TemporalS     = double_pad(32) + m·8 + double_pad(bbox)
      + Σ double_pad(seq)                (temporals.c:137-147)

    bbox = Period (24) for tbool/ttext, TBOX (40) for tint/tfloat
    (`temporal_boxops.c:150-162`).  ``text_bytes`` supplies per-instant
    utf-8 byte lengths for ttext values (in instant order).

    Calibrated bit-exactly by the 18 literal memSize goldens of the
    22 suite (`test/expected/22_temporal.test.out:1588-1688`)."""
    if text_bytes is not None:
        inst_sizes = [24 + _dpad(4 + b) for b in text_bytes]
        bbox = 24
    else:
        n_inst = sum(len(s.times) for s in tv.seqs)
        inst_sizes = [32] * n_inst
        bbox = 24 if tv.is_bool else 40
    if tv.duration == INSTANT:
        return inst_sizes[0]
    if tv.duration == INSTANTSET:
        n = len(inst_sizes)
        return _dpad(24 + n * 8) + _dpad(bbox) + sum(map(_dpad, inst_sizes))

    def seq_size(sizes: list) -> int:
        return (_dpad(48) + (len(sizes) + 1) * 8 + _dpad(bbox)
                + sum(map(_dpad, sizes)))

    if tv.duration == SEQUENCE:
        return seq_size(inst_sizes)
    out = _dpad(32) + len(tv.seqs) * 8 + _dpad(bbox)
    k = 0
    for s in tv.seqs:
        out += _dpad(seq_size(inst_sizes[k:k + len(s.times)]))
        k += len(s.times)
    return out


# ---------------------------------------------------------------------------
# literal parser (fixture/golden-file use; temporal_parser.c:412-598)
# ---------------------------------------------------------------------------

_POINT_RE = re.compile(
    r"^\s*point\s*(?:z\s*)?\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)"
    r"(?:\s+([-\d.eE+]+))?\s*\)\s*$", re.IGNORECASE)


def _parse_inst(tok: str, want_point: bool):
    val, _, ts = tok.rpartition("@")
    if not val:
        raise ValueError(f"bad instant literal {tok!r}")
    t = parse_ts(ts)
    m = _POINT_RE.match(val)
    if m:
        coords = [float(m.group(1)), float(m.group(2))]
        if m.group(3) is not None:
            coords.append(float(m.group(3)))  # 3D (z), tpoint_parser.c
        return t, np.array(coords)
    if want_point:
        raise ValueError(f"expected point value in {tok!r}")
    v = {"true": 1.0, "t": 1.0, "false": 0.0, "f": 0.0}.get(
        val.strip().lower())
    if v is None:
        v = float(val)
    return t, np.array([v])


def _split_top(s: str) -> list[str]:
    """Split on commas not inside parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [t.strip() for t in out if t.strip()]


def parse_duration_typmod(s: str) -> int:
    """temporal_typmod_in (`src/temporal.c:739-783`): a single duration
    name, matched case-insensitively; anything else is an error.  SQL
    folds the unquoted typmod identifier to lowercase before the call,
    so error messages echo the folded form — callers emulating the SQL
    frontend should fold before calling."""
    for dur, name in _DUR_NAMES.items():
        if s.lower() == name.lower():
            return dur
    raise ValueError(f"Invalid temporal type modifier: {s}")


def valid_typmod(tv: "Temporal", typmod_dur: int) -> "Temporal":
    """temporal_valid_typmod (`src/temporal.c:113-126`): a positive
    column typmod requires the literal's duration to match exactly."""
    if typmod_dur > 0 and tv.duration != typmod_dur:
        raise ValueError(
            f"Temporal type ({_DUR_NAMES[tv.duration]}) does not match "
            f"column type ({_DUR_NAMES[typmod_dur]})")
    return tv


def parse_temporal(text: str, point: bool | None = None) -> Temporal:
    """Parse a temporal literal (tpoint or tfloat/tbool grammar)."""
    s = text.strip()
    srid = 0
    linear = True
    changed = True
    while changed:
        changed = False
        m = re.match(r"^SRID\s*=\s*(\d+)\s*;\s*", s, re.IGNORECASE)
        if m:
            srid = int(m.group(1))
            s = s[m.end():]
            changed = True
        m = re.match(r"^Interp\s*=\s*Stepwise\s*;\s*", s, re.IGNORECASE)
        if m:
            linear = False
            s = s[m.end():]
            changed = True
    want_point = bool(point) or "point" in s.lower()

    def parse_seq(body: str) -> Seq:
        lower_inc = body[0] == "["
        upper_inc = body[-1] == "]"
        toks = _split_top(body[1:-1])
        pairs = [_parse_inst(t, want_point) for t in toks]
        times = np.array([p[0] for p in pairs], dtype=np.int64)
        vals = np.vstack([p[1] for p in pairs])
        times, vals = normalize_instants(times, vals, linear)
        return Seq(times, vals, lower_inc, upper_inc)

    def build() -> Temporal:
        if s.startswith("{"):
            inner = s[1:-1].strip()
            if inner.startswith("[") or inner.startswith("("):
                # sequence set: split on "," between ]/) and [/(
                parts = re.split(r"(?<=[\])])\s*,\s*(?=[\[(])", inner)
                seqs = [parse_seq(p.strip()) for p in parts]
                return Temporal.sequence_set(seqs, srid, linear,
                                             normalize=False)
            toks = _split_top(inner)
            pairs = [_parse_inst(t, want_point) for t in toks]
            times = np.array([p[0] for p in pairs], dtype=np.int64)
            vals = np.vstack([p[1] for p in pairs])
            return Temporal.instant_set(times, vals, srid, linear)
        if s.startswith("[") or s.startswith("("):
            seq = parse_seq(s)
            return Temporal(SEQUENCE, [seq], linear, srid)
        t, v = _parse_inst(s, want_point)
        return Temporal.instant(int(t), v, srid, linear)

    out = build()
    # tbool literals (t/f/true/false values) print back as t/f
    if not want_point and re.search(
            r"(?i)(?:^|[\s,{\[(])(?:t|f|true|false)\s*@", s):
        out.is_bool = True
        out.linear = False
        out.step_default = True
    return out


def parse_period(text: str) -> Period:
    """Parse a period literal with the reference's validation
    (`src/period.c` period_in/period_make; golden errors
    `test/expected/01_period.test.out:1-27`)."""
    s = text.strip()
    if not s or s[0] not in "[(" or s[-1] not in "])":
        raise ValueError("Could not parse period")
    lower_inc = s[0] == "["
    upper_inc = s[-1] == "]"
    parts = [p.strip() for p in s[1:-1].split(",")]
    if len(parts) != 2:
        raise ValueError("Could not parse period")
    try:
        lo, hi = int(parse_ts(parts[0])), int(parse_ts(parts[1]))
    except Exception:
        raise ValueError("Could not parse period")
    if lo > hi:
        raise ValueError("Period lower bound must be less than or equal "
                         "to period upper bound")
    if lo == hi and not (lower_inc and upper_inc):
        raise ValueError("Period cannot be empty")
    return Period(lo, hi, lower_inc, upper_inc)


def parse_periodset(text: str) -> list[Period]:
    s = text.strip()
    if not s.startswith("{") or not s.endswith("}"):
        raise ValueError("Could not parse period set")
    parts = re.split(r"(?<=[\])])\s*,\s*(?=[\[(])", s[1:-1].strip())
    try:
        periods = [parse_period(p) for p in parts]
    except ValueError as e:
        if "Could not parse period" in str(e):
            raise ValueError("Could not parse period set")
        raise
    if not periods:
        raise ValueError("A period set must have at least one period")
    return normalize_periods(periods)


def parse_timestampset(text: str) -> list[int]:
    """Parse a timestampset literal (`src/timestampset.c`
    timestampset_in; goldens 03_timestampset): sorted distinct µs."""
    s = text.strip()
    if not s.startswith("{") or not s.endswith("}"):
        raise ValueError("Could not parse timestamp set")
    toks = [t.strip() for t in s[1:-1].split(",")]
    try:
        out = [int(parse_ts(t)) for t in toks if t]
    except Exception:
        raise ValueError("Could not parse timestamp set")
    if not out:
        raise ValueError("A timestamp set must have at least one timestamp")
    if len(set(out)) != len(out) or out != sorted(out):
        raise ValueError("Invalid value for timestamp set")
    return out


def format_timestampset(ts: list[int]) -> str:
    return "{" + ", ".join(fmt_ts(int(t)) for t in ts) + "}"


def format_periodset(ps: list[Period]) -> str:
    """Print a period list in the reference periodset format."""
    return "{" + ", ".join(str(p) for p in ps) + "}"
