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
    return str(np.datetime64(int(us), "us")) + "+00:00"


def as_mfjson(tv: Temporal) -> str:
    interp = ("Discrete" if tv.duration in (INSTANT, INSTANTSET)
              else ("Linear" if tv.linear else "Stepwise"))
    obj: dict = {"type": "MovingPoint" if tv.dim >= 2 else "MovingFloat",
                 "interpolations": [interp]}
    if tv.srid:
        obj["crs"] = {"type": "name",
                      "properties": {"name": f"EPSG:{tv.srid}"}}

    def coords(s: Seq):
        if tv.dim >= 2:  # 2D or 3D points: full coordinate rows
            return [[float(c) for c in row] for row in s.values]
        return [float(v[0]) for v in s.values]

    if tv.duration == INSTANT:
        obj["coordinates"] = coords(tv.seqs[0])[0]
        obj["datetimes"] = _iso(tv.seqs[0].times[0])
    elif tv.duration == INSTANTSET:
        obj["coordinates"] = [coords(s)[0] for s in tv.seqs]
        obj["datetimes"] = [_iso(s.times[0]) for s in tv.seqs]
    elif tv.duration == SEQUENCE:
        s = tv.seqs[0]
        obj["coordinates"] = coords(s)
        obj["datetimes"] = [_iso(t) for t in s.times]
        obj["lower_inc"] = bool(s.lower_inc)
        obj["upper_inc"] = bool(s.upper_inc)
    else:
        obj["sequences"] = [{
            "coordinates": coords(s),
            "datetimes": [_iso(t) for t in s.times],
            "lower_inc": bool(s.lower_inc),
            "upper_inc": bool(s.upper_inc),
        } for s in tv.seqs]
    return json.dumps(obj)


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
