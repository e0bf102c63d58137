"""STBOX/TBOX box + position operator algebra — SURVEY §2.10.

Reference: `src/temporal_boxops.c:65-1433`,
`point/src/tpoint_boxops.c:246-957` (bbox ops `&& @> <@ ~=`),
`point/src/tpoint_posops.c:38-1974` (position ops `<< &< >> &> <<| …`).

Two forms:
- plain-Python predicates on ``STBox`` (kernel/tests),
- Spark ``Column`` builders over a box struct column
  ``struct<xmin,xmax,ymin,ymax,tmin,tmax>`` — pure comparisons that
  stay in whole-stage codegen and feed the cell-cover join prefilter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .types import Temporal


@dataclass(frozen=True)
class STBox:
    """`include/temporal.h:118-129` (2D/3D + time; zmin/zmax are None
    for 2D boxes, mirroring the reference's MOBDB_FLAGS_GET_Z)."""
    xmin: float
    xmax: float
    ymin: float
    ymax: float
    tmin: int
    tmax: int
    zmin: float | None = None
    zmax: float | None = None
    # literal-grammar flags (`50_stbox` in/out): x/y or time dimension
    # absent, geodetic box
    has_x: bool = True
    has_t: bool = True
    geodetic: bool = False
    # MOBDB Z *flag* as distinct from z-value presence: a 2D geodetic
    # box stores the geocentric z bounds but keeps Z=false
    # (`tpoint_boxops.c:59-65` copies gbox z when GEODETIC but sets
    # MOBDB_FLAGS_SET_Z from FLAGS_GET_Z(gs)); box predicates compare z
    # only when BOTH operands carry the flag. None = derive from zmin.
    zflag: bool | None = None

    @property
    def has_z(self) -> bool:
        return self.zmin is not None

    @property
    def z_flag(self) -> bool:
        return self.has_z if self.zflag is None else self.zflag

    @staticmethod
    def of(tv: Temporal) -> "STBox":
        v = tv.values
        return STBox(float(v[:, 0].min()), float(v[:, 0].max()),
                     float(v[:, 1].min()) if tv.dim > 1 else 0.0,
                     float(v[:, 1].max()) if tv.dim > 1 else 0.0,
                     tv.start_timestamp(), tv.end_timestamp(),
                     float(v[:, 2].min()) if tv.dim > 2 else None,
                     float(v[:, 2].max()) if tv.dim > 2 else None)

    def expand(self, d: float, dt_us: int = 0) -> "STBox":
        """expandSpatial/expandTemporal (`tpoint_boxops.c:440-538`)."""
        return STBox(self.xmin - d, self.xmax + d, self.ymin - d,
                     self.ymax + d, self.tmin - dt_us, self.tmax + dt_us,
                     None if self.zmin is None else self.zmin - d,
                     None if self.zmax is None else self.zmax + d)


def _both_z(a: STBox, b: STBox) -> bool:
    return a.z_flag and b.z_flag


def overlaps(a: STBox, b: STBox) -> bool:
    """&& — every dimension shared by both boxes intersects
    (`tpoint_boxops.c:overlaps_stbox_stbox_internal`)."""
    if a.has_x and b.has_x and not (
            a.xmin <= b.xmax and b.xmin <= a.xmax
            and a.ymin <= b.ymax and b.ymin <= a.ymax):
        return False
    if _both_z(a, b) and not (a.zmin <= b.zmax and b.zmin <= a.zmax):
        return False
    if a.has_t and b.has_t and not (a.tmin <= b.tmax and b.tmin <= a.tmax):
        return False
    return True


def contains(a: STBox, b: STBox) -> bool:
    """@> (`tpoint_boxops.c:contains_stbox_stbox_internal`)."""
    if a.has_x and b.has_x and not (
            a.xmin <= b.xmin and b.xmax <= a.xmax
            and a.ymin <= b.ymin and b.ymax <= a.ymax):
        return False
    if _both_z(a, b) and not (a.zmin <= b.zmin and b.zmax <= a.zmax):
        return False
    if a.has_t and b.has_t and not (a.tmin <= b.tmin and b.tmax <= a.tmax):
        return False
    return True


def contained(a: STBox, b: STBox) -> bool:
    return contains(b, a)


def same(a: STBox, b: STBox) -> bool:
    """~= — equality on the dimensions shared by both boxes
    (`tpoint_boxops.c:same_stbox_stbox_internal`)."""
    if a.has_x and b.has_x and not (
            a.xmin == b.xmin and a.xmax == b.xmax
            and a.ymin == b.ymin and a.ymax == b.ymax):
        return False
    if _both_z(a, b) and not (a.zmin == b.zmin and a.zmax == b.zmax):
        return False
    if a.has_t and b.has_t and not (a.tmin == b.tmin and a.tmax == b.tmax):
        return False
    return True


# position ops (`tpoint_posops.c:38-44` left_stbox_stbox_internal etc.)

def left(a: STBox, b: STBox) -> bool:       # <<
    return a.xmax < b.xmin


def overleft(a: STBox, b: STBox) -> bool:   # &<
    return a.xmax <= b.xmax


def right(a: STBox, b: STBox) -> bool:      # >>
    return a.xmin > b.xmax


def overright(a: STBox, b: STBox) -> bool:  # &>
    return a.xmin >= b.xmin


def below(a: STBox, b: STBox) -> bool:      # <<|
    return a.ymax < b.ymin


def overbelow(a: STBox, b: STBox) -> bool:  # &<|
    return a.ymax <= b.ymax


def above(a: STBox, b: STBox) -> bool:      # |>>
    return a.ymin > b.ymax


def overabove(a: STBox, b: STBox) -> bool:  # |&>
    return a.ymin >= b.ymin


def front(a: STBox, b: STBox) -> bool:      # <</ (z axis)
    return a.zmax < b.zmin


def overfront(a: STBox, b: STBox) -> bool:  # &</
    return a.zmax <= b.zmax


def back(a: STBox, b: STBox) -> bool:       # />>
    return a.zmin > b.zmax


def overback(a: STBox, b: STBox) -> bool:   # /&>
    return a.zmin >= b.zmin


def before(a: STBox, b: STBox) -> bool:     # <<#
    return a.tmax < b.tmin


def overbefore(a: STBox, b: STBox) -> bool:  # &<#
    return a.tmax <= b.tmax


def after(a: STBox, b: STBox) -> bool:      # #>>
    return a.tmin > b.tmax


def overafter(a: STBox, b: STBox) -> bool:  # #&>
    return a.tmin >= b.tmin


# ---------------------------------------------------------------------------
# Spark Column builders (struct<xmin,xmax,ymin,ymax,tmin,tmax>)
# ---------------------------------------------------------------------------

def stbox_agg_cols() -> list[Column]:
    """Aggregate expressions building a box from (lon, lat, t) rows."""
    return [F.min("lon").alias("xmin"), F.max("lon").alias("xmax"),
            F.min("lat").alias("ymin"), F.max("lat").alias("ymax"),
            F.min("t").alias("tmin"), F.max("t").alias("tmax")]


def overlaps_col(a: Column, b: Column) -> Column:
    return ((a["xmin"] <= b["xmax"]) & (b["xmin"] <= a["xmax"])
            & (a["ymin"] <= b["ymax"]) & (b["ymin"] <= a["ymax"])
            & (a["tmin"] <= b["tmax"]) & (b["tmin"] <= a["tmax"]))


def contains_col(a: Column, b: Column) -> Column:
    return ((a["xmin"] <= b["xmin"]) & (b["xmax"] <= a["xmax"])
            & (a["ymin"] <= b["ymin"]) & (b["ymax"] <= a["ymax"])
            & (a["tmin"] <= b["tmin"]) & (b["tmax"] <= a["tmax"]))


def left_col(a: Column, b: Column) -> Column:
    return a["xmax"] < b["xmin"]


def before_col(a: Column, b: Column) -> Column:
    return a["tmax"] < b["tmin"]


def position_ops_table(points: DataFrame, box: STBox, key: str = "key",
                       t: str = "t", x: str = "x", y: str = "y"
                       ) -> DataFrame:
    """Per-key STBOX position/topology predicates against a fixed box
    (`point/src/tpoint_posops.c:38-1974` + boxops && @> <@): one
    aggregation builds each key's box, an Arrow batch evaluates the
    operator set — no per-row Python, no shuffle beyond the groupBy."""
    import pandas as pd
    agg = points.groupBy(key).agg(
        F.min(x).alias("xmin"), F.max(x).alias("xmax"),
        F.min(y).alias("ymin"), F.max(y).alias("ymax"),
        F.unix_micros(F.min(t).cast("timestamp")).alias("tmin"),
        F.unix_micros(F.max(t).cast("timestamp")).alias("tmax"))
    schema = (f"{key} bigint, b_overlaps boolean, b_contains boolean, "
              "b_contained boolean, b_left boolean, b_right boolean, "
              "b_below boolean, b_above boolean, b_before boolean, "
              "b_after boolean")

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                kb = STBox(float(r.xmin), float(r.xmax), float(r.ymin),
                           float(r.ymax), int(r.tmin), int(r.tmax))
                rows.append({
                    key: getattr(r, key),
                    "b_overlaps": overlaps(kb, box),
                    "b_contains": contains(kb, box),
                    "b_contained": contains(box, kb),
                    "b_left": left(kb, box), "b_right": right(kb, box),
                    "b_below": below(kb, box), "b_above": above(kb, box),
                    "b_before": before(kb, box),
                    "b_after": after(kb, box)})
            yield pd.DataFrame(rows)

    return agg.mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# STBOX literal in/out (`point/src/stbox.c` stbox_in/stbox_out; goldens
# `point/test/expected/50_stbox.test.out`) — error messages verbatim
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Geodetic (GEODSTBOX) boxes — the PostGIS geocentric float4 model
# ---------------------------------------------------------------------------
# A tgeogpoint/geography box lives on the unit sphere
# (x=cos(lat)cos(lon), y=cos(lat)sin(lon), z=sin(lat)); the exact
# bounds replicate PostGIS's serialization/rounding so the suite
# goldens print verbatim (`point/src/tpoint_boxops.c:44-69` copies the
# GBOX from gserialized_get_gbox_p):
#  - POINT geographies carry no cached box; the on-the-fly path rounds
#    x/y outward to float4 and z only when the point has a Z ordinate
#    (PostGIS gbox_float_round checks FLAGS_GET_Z, not GEODETIC).
#  - Sequence boxes come from the trajectory geometry
#    (`src/temporal_boxops.c:297-318` comment); a non-degenerate
#    trajectory is a LINESTRING whose *cached* serialized box rounds
#    all three geocentric dims outward (gserialized_from_gbox geodetic
#    branch). A constant sequence degenerates to a POINT → point rule.
#  - Instant sets union per-instant point boxes.
# Limitation (documented): edge great-circle bulge beyond the vertex
# hull is not modelled; at the float4 ulp it is invisible for the arcs
# the reference suites exercise.

def f4_down(d: float) -> float:
    """PostGIS next_float_down: largest float4 <= d."""
    r = np.float32(d)
    return float(r) if float(r) <= d else float(np.nextafter(r, np.float32(-np.inf)))


def f4_up(d: float) -> float:
    """PostGIS next_float_up: smallest float4 >= d."""
    r = np.float32(d)
    return float(r) if float(r) >= d else float(np.nextafter(r, np.float32(np.inf)))


def _unit_sphere(lon: float, lat: float) -> tuple[float, float, float]:
    lo, la = math.radians(lon), math.radians(lat)
    return (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo),
            math.sin(la))


def _geog_point_bounds(lon: float, lat: float, has_z_ord: bool):
    """(xmin,xmax,ymin,ymax,zmin,zmax) of one geography point."""
    x, y, z = _unit_sphere(lon, lat)
    if has_z_ord:
        return (f4_down(x), f4_up(x), f4_down(y), f4_up(y),
                f4_down(z), f4_up(z))
    return (f4_down(x), f4_up(x), f4_down(y), f4_up(y), z, z)


def _geog_traj_bounds(pts, has_z_ord: bool):
    """Bounds of a sequence trajectory: cached-linestring rounding on
    all dims when >1 distinct vertex, else the point rule."""
    uniq = {(float(p[0]), float(p[1])) for p in pts}
    if len(uniq) == 1:
        lon, lat = next(iter(uniq))
        return _geog_point_bounds(lon, lat, has_z_ord)
    xyz = [_unit_sphere(float(p[0]), float(p[1])) for p in pts]
    xs, ys, zs = zip(*xyz)
    return (f4_down(min(xs)), f4_up(max(xs)), f4_down(min(ys)),
            f4_up(max(ys)), f4_down(min(zs)), f4_up(max(zs)))


def _union_bounds(parts):
    mins_maxs = list(zip(*parts))
    return (min(mins_maxs[0]), max(mins_maxs[1]), min(mins_maxs[2]),
            max(mins_maxs[3]), min(mins_maxs[4]), max(mins_maxs[5]))


def tpoint_stbox(tv: Temporal, geodetic: bool = False) -> STBox:
    """tpoint → STBOX cast with time bounds; geodetic temporal points
    take the geocentric float4 model above."""
    from .types import INSTANT, INSTANTSET, SEQUENCE
    tmin, tmax = tv.start_timestamp(), tv.end_timestamp()
    if not geodetic:
        b = STBox.of(tv)
        return STBox(b.xmin, b.xmax, b.ymin, b.ymax, tmin, tmax,
                     b.zmin, b.zmax)
    has_z_ord = tv.dim > 2
    if tv.duration in (INSTANT, INSTANTSET):
        parts = [_geog_point_bounds(float(v[0]), float(v[1]), has_z_ord)
                 for v in tv.values]
    elif tv.duration == SEQUENCE:
        parts = [_geog_traj_bounds(tv.seqs[0].values, has_z_ord)]
    else:  # sequence set: union of per-sequence trajectory boxes
        parts = [_geog_traj_bounds(s.values, has_z_ord) for s in tv.seqs]
    xmin, xmax, ymin, ymax, zmin, zmax = _union_bounds(parts)
    return STBox(xmin, xmax, ymin, ymax, tmin, tmax, zmin, zmax,
                 geodetic=True, zflag=has_z_ord)


def geo_stbox(coords, dim: int, geodetic: bool) -> STBox | None:
    """geometry/geography (point) → STBOX; None for empty (the
    reference returns SQL NULL, `tpoint_boxops.c:74-86`). The box has
    no T dimension; planar points box in full doubles (PostGIS peeks
    point coords without float4 rounding)."""
    if len(coords) == 0:
        return None
    if geodetic:
        parts = [_geog_point_bounds(float(p[0]), float(p[1]), dim > 2)
                 for p in coords]
        xmin, xmax, ymin, ymax, zmin, zmax = _union_bounds(parts)
        return STBox(xmin, xmax, ymin, ymax, 0, 0, zmin, zmax,
                     has_t=False, geodetic=True, zflag=dim > 2)
    xs = [float(p[0]) for p in coords]
    ys = [float(p[1]) for p in coords]
    zs = [float(p[2]) for p in coords] if dim > 2 else None
    return STBox(min(xs), max(xs), min(ys), max(ys), 0, 0,
                 min(zs) if zs else None, max(zs) if zs else None,
                 has_t=False)


def expand_spatial(b: STBox, d: float) -> STBox:
    """expandSpatial (`tpoint_boxops.c:440-460`): ±d on x/y, and on z
    when the box has Z values or is geodetic."""
    grow_z = b.has_z or b.geodetic
    return STBox(b.xmin - d, b.xmax + d, b.ymin - d, b.ymax + d,
                 b.tmin, b.tmax,
                 b.zmin - d if grow_z else None,
                 b.zmax + d if grow_z else None,
                 has_x=b.has_x, has_t=b.has_t, geodetic=b.geodetic,
                 zflag=b.zflag)


def expand_temporal(b: STBox, dt_us: int) -> STBox:
    """expandTemporal (`tpoint_boxops.c:500-520`)."""
    if not b.has_t:
        raise ValueError("The box must have T dimension")
    return STBox(b.xmin, b.xmax, b.ymin, b.ymax,
                 b.tmin - dt_us, b.tmax + dt_us, b.zmin, b.zmax,
                 has_x=b.has_x, has_t=True, geodetic=b.geodetic,
                 zflag=b.zflag)


def _parse_double(tok: str) -> float:
    try:
        return float(tok)
    except ValueError:
        raise ValueError(
            "Could not parse STBOX: Invalid input syntax for type double")


def _parse_ts_tok(tok: str) -> int:
    from .types import parse_ts
    tok = tok.strip()
    try:
        if not tok:
            raise ValueError(tok)
        v = int(parse_ts(tok))
        if v == -(2**63):  # NaT sentinel from a silent parse
            raise ValueError(tok)
        return v
    except Exception:
        raise ValueError(
            "invalid input syntax for type timestamp with time zone: "
            f'"{tok}"')


def parse_stbox(s: str) -> STBox:
    """Parse an STBOX/GEODSTBOX literal (all Z/T variants, bounds
    auto-sorted; the reference's exact error messages)."""
    import re
    txt = s.strip()
    m = re.match(r"(?i)^(GEODSTBOX|STBOX)\s*(ZT|Z|T)?\s*", txt)
    if not m:
        raise ValueError("Could not parse STBOX")
    geodetic = m.group(1).upper() == "GEODSTBOX"
    flags = (m.group(2) or "").upper()
    hasz = "Z" in flags or geodetic
    hast = "T" in flags
    rest = txt[m.end():]
    if not rest.startswith("(") or not rest[1:].lstrip().startswith("("):
        raise ValueError(
            "Could not parse STBOX: Missing opening parenthesis")
    body = rest[1:].lstrip()

    def read_tuple(src: str):
        assert src.startswith("(")
        end = src.find(")")
        if end < 0:
            raise ValueError(
                "Could not parse STBOX: Missing closing parenthesis")
        fields = src[1:end].split(",")
        return [f.strip() for f in fields], src[end + 1:].lstrip()

    n_coord = 3 if hasz else 2
    n_fields = n_coord + (1 if hast else 0)

    def parse_tuple(fields):
        # the time-only form (,,t) / (,,z?,t) leaves coords empty
        time_only = (hast and len(fields) == n_fields
                     and all(f == "" for f in fields[:-1]))
        if time_only:
            return None, None, None, _parse_ts_tok(fields[-1])
        vals = []
        for i in range(n_coord):
            tok = fields[i] if i < len(fields) else ""
            vals.append(_parse_double(tok))
        t = None
        if hast:
            tok = fields[n_coord] if len(fields) > n_coord else ""
            t = _parse_ts_tok(tok)
        elif len(fields) > n_coord:
            raise ValueError(
                "Could not parse STBOX: Missing closing parenthesis")
        x, y = vals[0], vals[1]
        z = vals[2] if hasz else None
        return x, y, z, t

    f1, body = read_tuple(body)
    x1, y1, z1, t1 = parse_tuple(f1)  # values parsed DURING the scan,
    # like the reference — a bad double inside tuple 1 reports before
    # the missing-second-tuple check
    if not body.startswith(","):
        raise ValueError(
            "Could not parse STBOX: Missing opening parenthesis")
    body = body[1:].lstrip()
    if not body.startswith("("):
        raise ValueError(
            "Could not parse STBOX: Missing opening parenthesis")
    f2, body = read_tuple(body)
    x2, y2, z2, t2 = parse_tuple(f2)
    if not body.startswith(")"):
        raise ValueError(
            "Could not parse STBOX: Missing closing parenthesis")
    # mirror the reference: hasx is fixed by the FIRST tuple and the
    # second is parsed under it (tpoint_parser.c:25-200) — asymmetric
    # tuples error instead of silently demoting the X dimension
    if x1 is not None and x2 is None:
        raise ValueError(
            "Could not parse STBOX: Invalid input syntax for type double")
    if x1 is None and x2 is not None:
        # coords in the 2nd tuple reach the timestamp parser there
        raise ValueError("Could not parse STBOX")
    if (t1 is None) != (t2 is None):
        raise ValueError("Could not parse STBOX")
    has_x = x1 is not None and x2 is not None
    hast_eff = t1 is not None and t2 is not None
    if has_x:
        xmin, xmax = sorted((x1, x2))
        ymin, ymax = sorted((y1, y2))
    else:
        xmin = xmax = ymin = ymax = float("nan")
    if hasz and has_x:
        zmin, zmax = sorted((z1, z2))
    else:
        zmin = zmax = None
    if hast_eff:
        tmin, tmax = sorted((t1, t2))
    else:
        tmin = tmax = 0
    return STBox(xmin, xmax, ymin, ymax, tmin, tmax, zmin, zmax,
                 has_x=has_x, has_t=hast_eff, geodetic=geodetic,
                 zflag=hasz and has_x)


def _num(v: float) -> str:
    # the reference prints box coords with %.8g (stbox.c:95-115,
    # tbox.c:64-72)
    return f"{v:.8g}"


def stbox_out(b: STBox) -> str:
    """Print an STBox in the reference literal format."""
    from .types import fmt_ts
    name = "GEODSTBOX" if b.geodetic else "STBOX"
    flags = ""
    if b.has_z and not b.geodetic:
        flags += "Z"
    if b.has_t:
        flags += "T"
    head = name + (f" {flags}" if flags else "")

    def tup(x, y, z, t):
        parts = []
        if b.has_x:
            parts += [_num(x), _num(y)]
            if b.has_z:
                parts.append(_num(z))
        else:
            parts += ["", ""]
            if b.has_z:
                parts.append("")
        if b.has_t:
            parts.append(fmt_ts(t))
        return "(" + ",".join(parts) + ")"

    return (f"{head}({tup(b.xmin, b.ymin, b.zmin, b.tmin)},"
            f"{tup(b.xmax, b.ymax, b.zmax, b.tmax)})")


# --- 50_stbox constructor / accessor / cast / cmp surface -----------------
# (`point/src/stbox.c:146-394` constructors, `:395-502` accessors,
#  `:503-566` casts, `:576-647` stbox_cmp; goldens in
#  tests/test_timeops_boxops.py from `point/test/expected/50_stbox.test.out`)

def _ts_arg(t) -> int:
    from .types import parse_ts
    return int(t) if isinstance(t, (int, np.integer)) else int(parse_ts(t))


def _sorted2(lo, hi):
    return (hi, lo) if lo > hi else (lo, hi)


def stbox_make(*args) -> STBox:
    """stbox() SQL constructor (`stbox.c:146-247`): 2 args = T-only
    timestamps, 4 = 2D X, 6 = 3D XZ, 8 = XZT.  Each dimension's bounds
    are auto-sorted independently."""
    n = len(args)
    if n == 2:
        t1, t2 = _sorted2(_ts_arg(args[0]), _ts_arg(args[1]))
        return STBox(0.0, 0.0, 0.0, 0.0, t1, t2, has_x=False, has_t=True)
    if n == 4:
        x1, x2 = _sorted2(float(args[0]), float(args[2]))
        y1, y2 = _sorted2(float(args[1]), float(args[3]))
        return STBox(x1, x2, y1, y2, 0, 0, has_t=False)
    if n == 6:
        x1, x2 = _sorted2(float(args[0]), float(args[3]))
        y1, y2 = _sorted2(float(args[1]), float(args[4]))
        z1, z2 = _sorted2(float(args[2]), float(args[5]))
        return STBox(x1, x2, y1, y2, 0, 0, z1, z2, has_t=False)
    if n == 8:
        x1, x2 = _sorted2(float(args[0]), float(args[4]))
        y1, y2 = _sorted2(float(args[1]), float(args[5]))
        z1, z2 = _sorted2(float(args[2]), float(args[6]))
        t1, t2 = _sorted2(_ts_arg(args[3]), _ts_arg(args[7]))
        return STBox(x1, x2, y1, y2, t1, t2, z1, z2)
    raise TypeError(f"stbox() takes 2/4/6/8 arguments ({n} given)")


def stboxt_make(x1, y1, t1, x2, y2, t2) -> STBox:
    """stboxt() SQL constructor (`stbox.c:249-297`): 2D + time."""
    xa, xb = _sorted2(float(x1), float(x2))
    ya, yb = _sorted2(float(y1), float(y2))
    ta, tb = _sorted2(_ts_arg(t1), _ts_arg(t2))
    return STBox(xa, xb, ya, yb, ta, tb)


def geodstbox_make(*args) -> STBox:
    """geodstbox() SQL constructor (`stbox.c:299-394`): 2 args = T-only,
    6 = geocentric XYZ, 8 = XYZT; geodetic flag always set."""
    n = len(args)
    if n == 2:
        t1, t2 = _sorted2(_ts_arg(args[0]), _ts_arg(args[1]))
        return STBox(0.0, 0.0, 0.0, 0.0, t1, t2, has_x=False, has_t=True,
                     geodetic=True)
    if n == 6:
        x1, x2 = _sorted2(float(args[0]), float(args[3]))
        y1, y2 = _sorted2(float(args[1]), float(args[4]))
        z1, z2 = _sorted2(float(args[2]), float(args[5]))
        return STBox(x1, x2, y1, y2, 0, 0, z1, z2, has_t=False,
                     geodetic=True)
    if n == 8:
        x1, x2 = _sorted2(float(args[0]), float(args[4]))
        y1, y2 = _sorted2(float(args[1]), float(args[5]))
        z1, z2 = _sorted2(float(args[2]), float(args[6]))
        t1, t2 = _sorted2(_ts_arg(args[3]), _ts_arg(args[7]))
        return STBox(x1, x2, y1, y2, t1, t2, z1, z2, geodetic=True)
    raise TypeError(f"geodstbox() takes 2/6/8 arguments ({n} given)")


def stbox_xmin(b: STBox):
    return b.xmin if b.has_x else None


def stbox_xmax(b: STBox):
    return b.xmax if b.has_x else None


def stbox_ymin(b: STBox):
    return b.ymin if b.has_x else None


def stbox_ymax(b: STBox):
    return b.ymax if b.has_x else None


def stbox_zmin(b: STBox):
    return b.zmin if b.z_flag else None


def stbox_zmax(b: STBox):
    return b.zmax if b.z_flag else None


def stbox_tmin(b: STBox):
    return b.tmin if b.has_t else None


def stbox_tmax(b: STBox):
    return b.tmax if b.has_t else None


def stbox_to_period(b: STBox):
    """stbox::period cast (`stbox.c:503-515`): NULL when no T."""
    from .types import Period
    return Period(b.tmin, b.tmax, True, True) if b.has_t else None


def _g15(v: float) -> str:
    # PostGIS prints GBOX/BOX3D coords with %.15g
    return f"{v:.15g}"


def stbox_to_box2d(b: STBox):
    """stbox::box2d cast (`stbox.c:517-539`): NULL when no X; Z/M
    stripped.  Returns the PostGIS BOX output text."""
    if not b.has_x:
        return None
    return (f"BOX({_g15(b.xmin)} {_g15(b.ymin)},"
            f"{_g15(b.xmax)} {_g15(b.ymax)})")


def stbox_to_box3d(b: STBox):
    """stbox::box3d cast (`stbox.c:541-566`): NULL when no X; Z
    zero-filled when the box has no Z."""
    if not b.has_x:
        return None
    z1 = b.zmin if b.z_flag else 0.0
    z2 = b.zmax if b.z_flag else 0.0
    return (f"BOX3D({_g15(b.xmin)} {_g15(b.ymin)} {_g15(z1)},"
            f"{_g15(b.xmax)} {_g15(b.ymax)} {_g15(z2)})")


def stbox_flags(b: STBox) -> int:
    """The MOBDB flags byte (`include/temporal.h:79-98`):
    X=0x04, Z=0x08, T=0x10, GEODETIC=0x20 (linear/byval unused)."""
    return ((0x04 if b.has_x else 0) | (0x08 if b.z_flag else 0)
            | (0x10 if b.has_t else 0) | (0x20 if b.geodetic else 0))


def stbox_cmp(a: STBox, b: STBox) -> int:
    """Total order (`stbox.c:576-637`): minima xy, z, t; then maxima
    xy, z, t — each axis compared only when BOTH operands carry the
    flag; flags byte as the final tiebreak."""
    pairs = []
    both_x = a.has_x and b.has_x
    both_z = a.z_flag and b.z_flag
    both_t = a.has_t and b.has_t
    if both_x:
        pairs += [(a.xmin, b.xmin), (a.ymin, b.ymin)]
    if both_z:
        pairs.append((a.zmin, b.zmin))
    if both_t:
        pairs.append((a.tmin, b.tmin))
    if both_x:
        pairs += [(a.xmax, b.xmax), (a.ymax, b.ymax)]
    if both_z:
        pairs.append((a.zmax, b.zmax))
    if both_t:
        pairs.append((a.tmax, b.tmax))
    for va, vb in pairs:
        if va < vb:
            return -1
        if va > vb:
            return 1
    fa, fb = stbox_flags(a), stbox_flags(b)
    return -1 if fa < fb else (1 if fa > fb else 0)
