"""Reference-parity STRICT parser + typmod machinery for temporal
points.

The lenient ``types.parse_temporal`` accepts anything unambiguous (the
right default for data loading); this module reproduces the
reference's error behavior character-for-character for API parity:

- ``tpoint_in``        — `point/src/tpoint_parser.c:246-440`
  (tpointinst/tpointi/tpointseq/tpoints_parse) + the PostGIS
  geometry-token errors raised through `basetype_parse`
- ``tpoint_typmod_in`` / ``tpoint_valid_typmod`` —
  `point/src/tpoint.c:140-330` / `:68-110`
- ``ensure_tpoint_geo_operand`` — the operand checks shared by
  ever/always comparisons and at/minusValue(s)
  (`point/src/tpoint_spatialfuncs.c` ensure_point_type /
  ensure_same_srid_tpoint_gs / ensure_same_dimensionality)

Golden evidence: tests/goldens/tpoint_51_rest.json (the 51-suite's
literal/operator/function error blocks, 282 cases) via
tests/test_tpoint51_rest_suite.py.
"""

from __future__ import annotations

import re

import numpy as np

from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, Seq,
                    Temporal, _DUR_NAMES, fmt_ts, parse_ts)

SRID_UNKNOWN = 0
SRID_DEFAULT = 4326  # PostGIS SRID_DEFAULT for geography

# Geometry-type keywords lwgeom's WKT lexer recognizes (anything else
# in value position is "parse error - invalid geometry").
_GEO_KEYWORDS = (
    "geometrycollection", "multilinestring", "multipolygon",
    "multipoint", "linestring", "circularstring", "compoundcurve",
    "curvepolygon", "multicurve", "multisurface", "polyhedralsurface",
    "polygon", "triangle", "tin", "point",
)

_NUM_RE = re.compile(r"^-?\d+(\.\d+)?([eE][-+]?\d+)?$")


def _is_geographic_srid(srid: int) -> bool:
    """Sandbox proxy for PostGIS srid_is_latlong (no spatial_ref_sys
    here): EPSG's geographic-2D block is 4000-4999; everything else in
    the suites (5434, 5676, 3857, ...) is projected."""
    return srid == SRID_UNKNOWN or 4000 <= srid < 5000


class _Cursor:
    __slots__ = ("s", "i")

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, ch: str) -> bool:
        self.ws()
        if self.peek() == ch:
            self.i += 1
            return True
        return False

    def at_end(self) -> bool:
        self.ws()
        return self.i >= len(self.s)


def _bad() -> ValueError:
    return ValueError("Could not parse temporal value")


def _parse_geo_token(c: _Cursor, tpoint_srid: list[int],
                     geodetic: bool,
                     geo_srids: list[int]) -> np.ndarray:
    """One geometry value up to '@' — PostGIS-error-parity point parse
    (`tpointinst_parse` via basetype_parse + the ensure_* ladder)."""
    c.ws()
    geo_srid = SRID_UNKNOWN
    m = re.match(r"SRID\s*=\s*(\d+)\s*;", c.s[c.i:], re.IGNORECASE)
    if m:
        geo_srid = int(m.group(1))
        c.i += m.end()
        c.ws()
    rest = c.s[c.i:]
    kw = next((k for k in _GEO_KEYWORDS
               if rest.lower().startswith(k)), None)
    if kw is None:
        raise ValueError("parse error - invalid geometry")
    c.i += len(kw)
    c.ws()
    # optional Z/M/ZM dimensionality suffix token
    has_m = False
    sm = re.match(r"(ZM|Z|M)\b", c.s[c.i:], re.IGNORECASE)
    if sm:
        has_m = "m" in sm.group(1).lower()
        c.i += sm.end()
        c.ws()
    if c.s[c.i:c.i + 5].lower() == "empty":
        c.i += 5
        if kw != "point":
            raise ValueError("Only point geometries accepted")
        raise ValueError("Only non-empty geometries accepted")
    if not c.eat("("):
        raise ValueError("parse error - invalid geometry")
    depth, j = 1, c.i
    while j < len(c.s) and depth:
        if c.s[j] == "(":
            depth += 1
        elif c.s[j] == ")":
            depth -= 1
        j += 1
    if depth:
        raise ValueError("parse error - invalid geometry")
    body = c.s[c.i:j - 1]
    c.i = j
    if kw != "point":
        raise ValueError("Only point geometries accepted")
    coords = body.split()
    if not (2 <= len(coords) <= 4) or not all(
            _NUM_RE.match(t) for t in coords):
        raise ValueError("parse error - invalid geometry")
    if has_m or len(coords) == 4 or (sm and len(coords) == 3
                                     and not sm.group(1).lower() == "z"):
        raise ValueError(
            "Only geometries without M dimension accepted")
    # SRID bookkeeping (`tpoint_parser.c:258-273`).  The reference
    # parses container literals TWICE (count pass + build pass), so a
    # later instant's SRID can retroactively conflict with an earlier
    # explicit one — record the explicit srid for the second pass.
    geo_srids.append(geo_srid)
    if (tpoint_srid[0] != SRID_UNKNOWN and geo_srid != SRID_UNKNOWN
            and tpoint_srid[0] != geo_srid):
        raise ValueError(
            f"Geometry SRID ({geo_srid}) does not match temporal type "
            f"SRID ({tpoint_srid[0]})")
    if geodetic:
        if tpoint_srid[0] == SRID_UNKNOWN and geo_srid != SRID_DEFAULT \
                and geo_srid != SRID_UNKNOWN:
            tpoint_srid[0] = geo_srid
    else:
        if tpoint_srid[0] == SRID_UNKNOWN and geo_srid != SRID_UNKNOWN:
            tpoint_srid[0] = geo_srid
    return np.array([float(t) for t in coords])


def _parse_ts_token(c: _Cursor) -> int:
    """timestamp_parse: scan to the next delimiter, feed timestamptz_in
    (`src/temporal_parser.c`)."""
    c.ws()
    j = c.i
    while j < len(c.s) and c.s[j] not in ",]})":
        j += 1
    tok = c.s[c.i:j].strip()
    c.i = j
    return int(parse_ts(tok))


def _parse_instant(c: _Cursor, tpoint_srid: list[int],
                   geodetic: bool,
                   geo_srids: list[int]) -> tuple[int, np.ndarray]:
    v = _parse_geo_token(c, tpoint_srid, geodetic, geo_srids)
    c.ws()
    if not c.eat("@"):
        raise _bad()
    t = _parse_ts_token(c)
    return t, v


def _ensure_increasing(pairs, strict_seq: bool):
    for (t1, _), (t2, _) in zip(pairs, pairs[1:]):
        if t2 <= t1:
            raise ValueError(
                "Timestamps for temporal value must be increasing: "
                f"{fmt_ts(t1)}, {fmt_ts(t2)}")


def _ensure_same_dim(pairs):
    dims = {len(v) for _, v in pairs}
    if len(dims) > 1:
        raise ValueError("All geometries composing a temporal point "
                         "must be of the same dimensionality")


def _parse_seq(c: _Cursor, tpoint_srid: list[int],
               geodetic: bool, geo_srids: list[int]) -> Seq:
    c.ws()
    lower_inc = c.peek() == "["
    if c.peek() not in "[(":
        raise _bad()
    c.i += 1
    pairs = [_parse_instant(c, tpoint_srid, geodetic, geo_srids)]
    while c.eat(","):
        pairs.append(_parse_instant(c, tpoint_srid, geodetic, geo_srids))
    c.ws()
    if c.peek() not in "])":
        raise _bad()
    upper_inc = c.peek() == "]"
    c.i += 1
    _ensure_same_dim(pairs)
    _ensure_increasing(pairs, True)
    times = np.array([p[0] for p in pairs], dtype=np.int64)
    vals = np.vstack([p[1] for p in pairs])
    return Seq(times, vals, lower_inc, upper_inc)


def tpoint_in(text: str, geodetic: bool = False) -> Temporal:
    """Strict tpoint literal parser with reference error parity
    (`tpoint_parse`, `point/src/tpoint_parser.c:380-440`)."""
    c = _Cursor(text)
    srid = [SRID_UNKNOWN]
    geo_srids: list[int] = []
    linear = True
    c.ws()
    m = re.match(r"SRID\s*=\s*(\d+)\s*;", c.s[c.i:], re.IGNORECASE)
    if m:
        srid[0] = int(m.group(1))
        c.i += m.end()
        c.ws()
    m = re.match(r"Interp\s*=\s*Stepwise\s*;", c.s[c.i:], re.IGNORECASE)
    if m:
        linear = False
        c.i += m.end()
        c.ws()

    if c.peek() == "{":
        c.i += 1
        c.ws()
        if c.peek() in "[(":
            seqs = [_parse_seq(c, srid, geodetic, geo_srids)]
            while c.eat(","):
                seqs.append(_parse_seq(c, srid, geodetic, geo_srids))
            if not c.eat("}"):
                raise _bad()
            out = Temporal(SEQUENCESET, seqs, linear, 0, not linear)
        else:
            pairs = [_parse_instant(c, srid, geodetic, geo_srids)]
            while c.eat(","):
                pairs.append(_parse_instant(c, srid, geodetic, geo_srids))
            if not c.eat("}"):
                raise _bad()
            _ensure_same_dim(pairs)
            _ensure_increasing(pairs, False)
            times = np.array([p[0] for p in pairs], dtype=np.int64)
            vals = np.vstack([p[1] for p in pairs])
            out = Temporal.instant_set(times, vals, 0, linear)
    elif c.peek() in "[(":
        seq = _parse_seq(c, srid, geodetic, geo_srids)
        out = Temporal(SEQUENCE, [seq], linear, 0, not linear)
    else:
        t, v = _parse_instant(c, srid, geodetic, geo_srids)
        out = Temporal.instant(int(t), v, 0, linear)
        geo_srids = []  # single pass for a top-level instant
    if not c.at_end():
        raise _bad()
    # second parsing pass (`tpoint_parser.c` tpointi/seq/s_parse re-run
    # from `bak` with the final tpoint_srid): an explicit per-instant
    # SRID must match the srid the whole literal settled on
    for gsrid in geo_srids:
        if srid[0] != SRID_UNKNOWN and gsrid != SRID_UNKNOWN \
                and srid[0] != gsrid:
            raise ValueError(
                f"Geometry SRID ({gsrid}) does not match temporal "
                f"type SRID ({srid[0]})")
    # cross-sequence dimensionality (seqset)
    if out.duration == SEQUENCESET:
        dims = {s.values.shape[1] for s in out.seqs}
        if len(dims) > 1:
            raise ValueError(
                "All geometries composing a temporal point "
                "must be of the same dimensionality")
    eff = srid[0]
    if geodetic:
        if eff == SRID_UNKNOWN:
            eff = SRID_DEFAULT
        if not _is_geographic_srid(eff):
            raise ValueError("Only lon/lat coordinate systems are "
                             "supported in geography.")
    return Temporal(out.duration, out.seqs, linear, eff,
                    out.step_default)


# --- typmod (`point/src/tpoint.c:140-330`) ---------------------------------

_GEOTYPE_RE = re.compile(
    r"^(" + "|".join(_GEO_KEYWORDS) + r")(z|m|zm)?$", re.IGNORECASE)


def _duration_of(s: str) -> int | None:
    for dur, name in _DUR_NAMES.items():
        if s.lower() == name.lower():
            return dur
    return None


def _geotype_of(s: str):
    """geometry_type_from_string → (base, has_z, has_m) or None."""
    m = _GEOTYPE_RE.match(s.strip().lower())
    if not m:
        return None
    suffix = m.group(2) or ""
    return m.group(1), "z" in suffix, "m" in suffix


def tpoint_typmod_in(parts: list[str], geography: bool = False) -> dict:
    """(Duration[,Type[,SRID]]) / (Type[,SRID]) column modifiers with
    the reference's exact error ladder (`tpoint.c:140-330`).  `parts`
    are SQL-folded (lowercase) cstrings."""
    tm = {"duration": 0, "z": False, "srid": SRID_UNKNOWN,
          "has_type": False}
    if geography:
        tm["srid"] = SRID_DEFAULT

    def set_geotype(s, single):
        gt = _geotype_of(s)
        if gt is None:
            raise ValueError(
                f"Invalid temporal point type modifier: {s}")
        base, z, has_m = gt
        if base != "point" or has_m:
            if single:
                raise ValueError("Only point geometries accepted")
            raise ValueError(
                "Only point geometries without M dimension accepted")
        tm["z"] = z
        tm["has_type"] = True

    if len(parts) == 3:
        dur = _duration_of(parts[0])
        if dur is None:
            raise ValueError(
                f"Invalid duration type modifier: {parts[0]}")
        tm["duration"] = dur
        gt = _geotype_of(parts[1])
        if gt is None:
            raise ValueError(
                f"Invalid geometry type modifier: {parts[1]}")
        if gt[0] != "point" or gt[2]:
            raise ValueError(
                "Only point geometries without M dimension accepted")
        tm["z"] = gt[1]
        tm["has_type"] = True
        tm["srid"] = int(parts[2])
    elif len(parts) == 2:
        dur = _duration_of(parts[0])
        if dur is not None:
            tm["duration"] = dur
            gt = _geotype_of(parts[1])
            if gt is None:
                raise ValueError(
                    f"Invalid geometry type modifier: {parts[1]}")
            if gt[0] != "point" or gt[2]:
                raise ValueError(
                    "Only point geometries without M dimension accepted")
            tm["z"] = gt[1]
            tm["has_type"] = True
        else:
            set_geotype(parts[0], single=False)
            tm["srid"] = int(parts[1])
    elif len(parts) == 1:
        dur = _duration_of(parts[0])
        if dur is not None:
            tm["duration"] = dur
        else:
            set_geotype(parts[0], single=True)
    else:
        raise ValueError("Invalid temporal point type modifier:")
    return tm


def tpoint_valid_typmod(tv: Temporal, tm: dict) -> Temporal:
    """`tpoint.c:68-110` — SRID, then duration, then Z both ways."""
    has_z = tv.seqs[0].values.shape[1] > 2
    if tm["has_type"] and tm["srid"] > 0 and tm["srid"] != tv.srid:
        raise ValueError(
            f"Temporal point SRID ({tv.srid}) does not match column "
            f"SRID ({tm['srid']})")
    if tm["has_type"] and tm["duration"] > 0 \
            and tm["duration"] != tv.duration:
        raise ValueError(
            f"Temporal type ({_DUR_NAMES[tv.duration]}) does not match "
            f"column type ({_DUR_NAMES[tm['duration']]})")
    if not tm["has_type"] and tm["duration"] > 0 \
            and tm["duration"] != tv.duration:
        raise ValueError(
            f"Temporal type ({_DUR_NAMES[tv.duration]}) does not match "
            f"column type ({_DUR_NAMES[tm['duration']]})")
    if tm["has_type"]:
        if tm["z"] and not has_z:
            raise ValueError(
                "Column has Z dimension but temporal point does not")
        if has_z and not tm["z"]:
            raise ValueError(
                "Temporal point has Z dimension but column does not")
    return tv


# --- spatial operand checks -------------------------------------------------

def ensure_tpoint_geo_operand(tv: Temporal, geo_kind: str,
                              coords: np.ndarray | None,
                              geo_srid: int, geography: bool,
                              tv_geodetic: bool = False) -> None:
    """ever/always + at/minusValue operand ladder
    (`point/src/tpoint_spatialfuncs.c`): point type, same SRID, same
    dimensionality.  A bare-geometry operand cast to geography (either
    side geodetic) picks up PostGIS's default SRID."""
    if geo_kind != "point":
        raise ValueError("Only point geometries accepted")
    eff_tv = tv.srid
    eff_geo = geo_srid
    if (geography or tv_geodetic) and not geo_srid:
        eff_geo = SRID_DEFAULT
    if eff_tv != eff_geo:
        raise ValueError("The temporal point and the geometry must be "
                         "in the same SRID")
    if coords is not None and \
            len(coords) != tv.seqs[0].values.shape[1]:
        raise ValueError("The temporal point and the geometry must be "
                         "of the same dimensionality")
