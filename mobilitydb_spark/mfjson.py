"""OGC Moving Features JSON in/out — SURVEY §2.1
(`point/src/tpoint_in.c:81-380` fromMFJSON,
`point/src/tpoint_out.c` asMFJSON).

MFJSON maps 1:1 onto the value model:
- MovingPoint Instant      → {"type":"MovingPoint","coordinates":[x,y],"datetimes": t, "interpolations":["Discrete"]}
- InstantSet / Sequence / SequenceSet → coordinate+datetime arrays,
  interpolations Discrete / Linear / Stepwise, sequence sets as a
  "sequences" array with lower_inc/upper_inc flags.

Used for exchange fixtures; inside Spark the struct encoding is the
native form (``F.to_json`` over the struct column covers the bulk
export path)."""

from __future__ import annotations

import json

import numpy as np

from .types import (INSTANT, INSTANTSET, SEQUENCE, SEQUENCESET, Seq,
                    Temporal, fmt_ts, parse_ts)


def _iso(us: int) -> str:
    # the reference's ISO form: fmt_ts with a 'T' date/time separator
    # and the short '+00' offset (tpoint_out.c datetimes_mfjson_buf)
    return fmt_ts(int(us)).replace(" ", "T", 1)


# the reference resolves the urn:ogc long-form crs through the PostGIS
# spatial_ref_sys table; the SRIDs this engine ships closed-form
# support for stand in for that catalog (53-suite error parity)
_KNOWN_SRIDS = {4326, 3857, 31466, 31467, 31468, 31469}


def _num(v: float, precision: int | None) -> str:
    """Coordinate formatting (lwprint_double): fixed decimals at the
    requested precision with trailing zeros trimmed, %.15g otherwise."""
    if precision is None:
        return f"{float(v):.15g}"
    s = f"{float(v):.{precision}f}"
    return s.rstrip("0").rstrip(".") if "." in s else s


def as_mfjson(tv: Temporal, precision: int | None = None,
              options: int | None = None) -> str:
    """asMFJSON (`point/src/tpoint_out.c:129-560`): options bitmask
    1 = stBoundedBy bbox, 2 = short-form crs, 4 = urn long-form crs
    (errors on an SRID outside the catalog, like spatial_ref_sys).
    ``options=None`` keeps the legacy engine default — short crs
    whenever an SRID is set — so MFJSON roundtrips preserve it."""
    if precision is not None:
        precision = min(max(precision, 0), 15)
    legacy = options is None
    opts = (2 if tv.srid else 0) if legacy else options
    interp = ("Discrete" if tv.duration in (INSTANT, INSTANTSET)
              else ("Linear" if tv.linear else "Stepwise"))
    point = tv.dim >= 2
    parts = [f'"type":"{"MovingPoint" if point else "MovingFloat"}"']
    if opts & 2 and tv.srid:
        parts.append('"crs":{"type":"name","properties":'
                     f'{{"name":"EPSG:{tv.srid}"}}}}')
    elif opts & 4 and tv.srid:
        if tv.srid not in _KNOWN_SRIDS:
            raise ValueError(f"SRID {tv.srid} unknown in "
                             "spatial_ref_sys table")
        parts.append('"crs":{"type":"name","properties":'
                     f'{{"name":"urn:ogc:def:crs:EPSG::{tv.srid}"}}}}')
    if opts & 1:
        v = tv.values
        lo = [float(c) for c in v.min(axis=0)]
        hi = [float(c) for c in v.max(axis=0)]
        p = precision if precision is not None else 15
        bbox = ",".join(f"{c:.{p}f}" for c in lo + hi)
        parts.append('"stBoundedBy":{"bbox":[' + bbox + '],"period":'
                     f'{{"begin":"{fmt_ts(tv.start_timestamp())}",'
                     f'"end":"{fmt_ts(tv.end_timestamp())}"}}}}')

    def coords(s: Seq):
        if point:
            return ("[" + ",".join(
                "[" + ",".join(_num(c, precision) for c in row) + "]"
                for row in s.values) + "]")
        return ("[" + ",".join(_num(v[0], precision)
                               for v in s.values) + "]")

    def one_coord(s: Seq):
        if point:
            return ("[" + ",".join(_num(c, precision)
                                   for c in s.values[0]) + "]")
        return _num(s.values[0, 0], precision)

    def dts(times):
        return "[" + ",".join(f'"{_iso(t)}"' for t in times) + "]"

    if tv.duration == INSTANT:
        parts.append(f'"coordinates":{one_coord(tv.seqs[0])}')
        parts.append(f'"datetimes":"{_iso(tv.seqs[0].times[0])}"')
    elif tv.duration == INSTANTSET:
        parts.append('"coordinates":[' + ",".join(
            one_coord(s) for s in tv.seqs) + "]")
        parts.append('"datetimes":' + dts([s.times[0] for s in tv.seqs]))
    elif tv.duration == SEQUENCE:
        s = tv.seqs[0]
        parts.append(f'"coordinates":{coords(s)}')
        parts.append(f'"datetimes":{dts(s.times)}')
        parts.append(f'"lower_inc":{"true" if s.lower_inc else "false"}')
        parts.append(f'"upper_inc":{"true" if s.upper_inc else "false"}')
    else:
        seqs = ",".join(
            f'{{"coordinates":{coords(s)},"datetimes":{dts(s.times)},'
            f'"lower_inc":{"true" if s.lower_inc else "false"},'
            f'"upper_inc":{"true" if s.upper_inc else "false"}}}'
            for s in tv.seqs)
        parts.append(f'"sequences":[{seqs}]')
    parts.append(f'"interpolations":["{interp}"]')
    return "{" + ",".join(parts) + "}"


def from_mfjson(text: str) -> Temporal:
    obj = json.loads(text)
    interp = (obj.get("interpolations") or ["Linear"])[0]
    linear = interp == "Linear"
    srid = 0
    crs = obj.get("crs", {}).get("properties", {}).get("name", "")
    if crs.startswith("EPSG:"):
        srid = int(crs.split(":")[1])

    def to_vals(coords):
        arr = np.asarray(coords, dtype=np.float64)
        return arr if arr.ndim == 2 else arr[:, None]

    def ts_arr(dts):
        return np.array([parse_ts(d.replace("+00:00", "")) for d in dts],
                        dtype=np.int64)

    if "sequences" in obj:
        seqs = [Seq(ts_arr(s["datetimes"]), to_vals(s["coordinates"]),
                    bool(s.get("lower_inc", True)),
                    bool(s.get("upper_inc", True)))
                for s in obj["sequences"]]
        return Temporal(SEQUENCESET, seqs, linear, srid)
    dts = obj["datetimes"]
    if isinstance(dts, str):  # Instant
        v = np.asarray(obj["coordinates"], dtype=np.float64)
        v = v if v.ndim else np.array([float(v)])
        return Temporal.instant(int(parse_ts(dts.replace("+00:00", ""))),
                                v, srid, linear)
    vals = to_vals(obj["coordinates"])
    times = ts_arr(dts)
    if interp == "Discrete":
        return Temporal.instant_set(times, vals, srid, linear)
    return Temporal(SEQUENCE, [Seq(times, vals,
                                   bool(obj.get("lower_inc", True)),
                                   bool(obj.get("upper_inc", True)))],
                    linear, srid)


# ---------------------------------------------------------------------------
# binary codec — the asEWKB/fromEWKB roundtrip surface
# (`point/src/tpoint_out.c` asEWKB / `tpoint_in.c` fromEWKB, goldens
# `point/test/expected/52_tpoint_in.test.out:66-132`).  The reference's
# wire bytes are its internal varlena layout; ours is a documented
# little-endian layout carrying the identical information (duration,
# srid, interp, per-sequence bounds, times, coords), so every 52-suite
# roundtrip invariant holds bit-exactly on values.
# ---------------------------------------------------------------------------

def as_ewkb(tv: Temporal) -> bytes:
    import struct
    out = [struct.pack("<BBiBB", 1, tv.duration, tv.srid,
                       (1 if tv.linear else 0)
                       | (2 if tv.step_default else 0)
                       | (4 if tv.is_bool else 0),
                       tv.dim)]
    out.append(struct.pack("<I", len(tv.seqs)))
    for s in tv.seqs:
        out.append(struct.pack("<BBI",
                               1 if s.lower_inc else 0,
                               1 if s.upper_inc else 0,
                               len(s.times)))
        out.append(np.asarray(s.times, dtype="<i8").tobytes())
        out.append(np.asarray(s.values, dtype="<f8").tobytes())
    return b"".join(out)


def from_ewkb(buf: bytes) -> Temporal:
    import struct
    magic, dur, srid, flags, dim = struct.unpack_from("<BBiBB", buf, 0)
    if magic != 1:
        raise ValueError("Could not parse temporal EWKB: bad magic")
    off = 8
    (nseq,) = struct.unpack_from("<I", buf, off)
    off += 4
    seqs = []
    for _ in range(nseq):
        lo, hi, n = struct.unpack_from("<BBI", buf, off)
        off += 6
        ts = np.frombuffer(buf, dtype="<i8", count=n, offset=off).copy()
        off += 8 * n
        vs = np.frombuffer(buf, dtype="<f8", count=n * dim,
                           offset=off).copy().reshape(n, dim)
        off += 8 * n * dim
        seqs.append(Seq(ts.astype(np.int64), vs, bool(lo), bool(hi)))
    out = Temporal(dur, seqs, bool(flags & 1), srid, bool(flags & 2))
    out.is_bool = bool(flags & 4)
    return out


# ---------------------------------------------------------------------------
# reference-layout temporal WKB — the asBinary/asEWKB/asHexEWKB output
# surface (`point/src/tpoint_out.c:688-1010`).  Unlike as_ewkb above
# (this engine's wire format), these emit the reference's exact byte
# layout: [endian][duration+flags][srid?][per-duration body], NDR,
# timestamps as int64 µs since the PG epoch 2000-01-01.
# ---------------------------------------------------------------------------

_PG_EPOCH_US = 946684800000000  # 2000-01-01 in unix µs

_WKB_ZFLAG = 0x10       # point/include/tpoint.h:84-86
_WKB_SRIDFLAG = 0x20
_WKB_LINEAR = 0x40
_WKB_LOWER_INC = 0x01   # tpoint.h:76-77
_WKB_UPPER_INC = 0x02


def tpoint_wkb(tv: Temporal, extended: bool = False,
               hex_out: bool = False) -> bytes | str:
    """asBinary (plain) / asEWKB (extended) / asHexEWKB
    (extended + hex) with the reference's byte layout."""
    import struct
    from .types import INSTANT, INSTANTSET, SEQUENCE
    flags = 0
    with_srid = extended and tv.srid != 0
    if extended:
        if tv.dim > 2:
            flags |= _WKB_ZFLAG
        if with_srid:
            flags |= _WKB_SRIDFLAG
        if tv.linear:
            flags |= _WKB_LINEAR
    out = [struct.pack("<BB", 1, tv.duration + flags)]
    if with_srid:
        out.append(struct.pack("<i", tv.srid))

    def inst_body(s: Seq, i: int):
        out.append(np.asarray(s.values[i], dtype="<f8").tobytes())
        out.append(struct.pack("<q", int(s.times[i]) - _PG_EPOCH_US))

    def seq_body(s: Seq):
        out.append(struct.pack("<iB", len(s.times),
                               (_WKB_LOWER_INC if s.lower_inc else 0)
                               | (_WKB_UPPER_INC if s.upper_inc else 0)))
        for i in range(len(s.times)):
            inst_body(s, i)

    if tv.duration == INSTANT:
        inst_body(tv.seqs[0], 0)
    elif tv.duration == INSTANTSET:
        out.append(struct.pack("<i", len(tv.seqs)))
        for s in tv.seqs:
            inst_body(s, 0)
    elif tv.duration == SEQUENCE:
        seq_body(tv.seqs[0])
    else:
        out.append(struct.pack("<i", len(tv.seqs)))
        for s in tv.seqs:
            seq_body(s)
    raw = b"".join(out)
    return raw.hex().upper() if hex_out else raw
