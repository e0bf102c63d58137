"""Ever/always predicates + projected spatial relationships + CRS.

- ever_eq/always_eq/… (SURVEY §2.2): ∃/∀ instant with value cmp
  (`src/temporal.c:2145-2415`, `point/src/tpoint.c:452-545`; SQL ops
  ``?= %= &<>`` …).  For linear tfloat, ever_eq also detects interior
  crossings (the value is attained between knots).
- projected spatial predicates (§2.9,
  `point/src/tpoint_spatialrels.c:252-283`): apply the plain predicate
  to the trajectory — intersects/within/disjoint/dwithin implemented
  on our exact kernels; empty geometry → None (NULL convention,
  `66_tpoint_spatialrels.test.out:25-28`).
- CRS: EPSG:4326 ⇄ EPSG:3857 web-mercator closed form (`transform`,
  `tpoint_spatialfuncs.c:262-435`; the general PROJ pipeline is out of
  scope in this container — the two CRS the tiling engine needs are
  exact closed forms).
"""

from __future__ import annotations

import numpy as np

from . import geo
from .spatial import at_geometry_periods, nearest_approach_distance
from .types import EPSILON, Temporal

WEB_MERCATOR_R = 6378137.0


# ---------------------------------------------------------------------------
# ever / always
# ---------------------------------------------------------------------------

def _cmp(op: str, vals: np.ndarray, target: np.ndarray) -> np.ndarray:
    if op == "eq":
        return np.all(np.abs(vals - target) <= EPSILON, axis=1)
    if op == "ne":
        return ~np.all(np.abs(vals - target) <= EPSILON, axis=1)
    a = vals[:, 0]
    t = target[0]
    return {"lt": a < t, "le": a <= t, "gt": a > t, "ge": a >= t}[op]


def ever(op: str, tv: Temporal, value) -> bool:
    """∃ instant where value `op` target (ever_eq …, temporal.c:2145).

    Linear inputs also attain every value between consecutive knots,
    so eq/lt/… test segment ranges, not just knots."""
    target = np.atleast_1d(np.asarray(value, dtype=np.float64))
    for s in tv.seqs:
        if _cmp(op, s.values, target).any():
            return True
        if tv.linear and len(s.times) > 1:
            v0, v1 = s.values[:-1], s.values[1:]
            if op == "eq":
                if tv.dim == 1:
                    lo = np.minimum(v0[:, 0], v1[:, 0])
                    hi = np.maximum(v0[:, 0], v1[:, 0])
                    if ((lo - EPSILON <= target[0])
                            & (target[0] <= hi + EPSILON)).any():
                        return True
                else:
                    from .restrict import at_value
                    if at_value(tv, target) is not None:
                        return True
            elif op in ("lt", "le", "gt", "ge"):
                pass  # monotone between knots → knot check suffices
    return False


def always(op: str, tv: Temporal, value) -> bool:
    """∀ instants (always_eq …, temporal.c:2280): complement of ever
    of the negation."""
    neg = {"eq": "ne", "ne": "eq", "lt": "ge", "le": "gt",
           "gt": "le", "ge": "lt"}[op]
    return not ever(neg, tv, value)


# ---------------------------------------------------------------------------
# projected spatial relationships (trajectory-level, → bool/None)
# ---------------------------------------------------------------------------

def intersects(tv: Temporal, g: geo.Geometry) -> bool | None:
    """intersects(tpoint, geom): trajectory ∩ geom ≠ ∅
    (`tpoint_spatialrels.c:300+`); NULL on empty geometry."""
    if g.is_empty:
        return None
    return len(at_geometry_periods(tv, g)) > 0


def disjoint(tv: Temporal, g: geo.Geometry) -> bool | None:
    if g.is_empty:
        return None
    return not intersects(tv, g)


def within(tv: Temporal, g: geo.Geometry) -> bool | None:
    """within: the whole trajectory lies inside the geometry —
    at_geometry covers the full time domain."""
    if g.is_empty:
        return None
    from .types import normalize_periods
    dom = tv.get_time()
    cov = at_geometry_periods(tv, g)
    from .timeops import minus
    return minus(dom, cov) == []


def dwithin(tv: Temporal, other, dist: float) -> bool | None:
    """dwithin: min distance ever ≤ dist (`66_…in.sql:394-445`)."""
    if isinstance(other, geo.Geometry) and other.is_empty:
        return None
    return nearest_approach_distance(tv, other) <= dist + EPSILON


# ---------------------------------------------------------------------------
# CRS transform (closed-form 4326 ⇄ 3857)
# ---------------------------------------------------------------------------

def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    x = WEB_MERCATOR_R * np.radians(lon)
    y = WEB_MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(
        np.asarray(y, dtype=np.float64) / WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def transform(tv: Temporal, srid_to: int) -> Temporal:
    """setSRID/transform between 4326 and 3857."""
    if tv.srid == srid_to:
        return tv
    if {tv.srid, srid_to} != {4326, 3857}:
        raise ValueError(f"unsupported transform {tv.srid}->{srid_to}")
    fn = lonlat_to_mercator if srid_to == 3857 else mercator_to_lonlat
    out = []
    from .types import Seq
    for s in tv.seqs:
        x, y = fn(s.values[:, 0], s.values[:, 1])
        out.append(Seq(s.times.copy(), np.stack([x, y], axis=1),
                       s.lower_inc, s.upper_inc))
    return Temporal(tv.duration, out, tv.linear, srid_to, tv.step_default)


# ---------------------------------------------------------------------------
# tpoint ⇄ geometry-with-M codec (`tpoint_spatialfuncs.c:2766-3118`)
# ---------------------------------------------------------------------------

def tpoint_to_geo_m(tv: Temporal) -> bytes:
    """Encode as WKB LineString ZM-style with t (epoch seconds) in the
    M slot — 3-coord (x, y, m) layout, type 0x40000002 (WKB M flag)."""
    import struct
    pts = np.hstack([tv.values, (tv.times / 1e6)[:, None]])
    body = struct.pack("<I", len(pts)) + pts.astype("<f8").tobytes()
    return b"\x01" + struct.pack("<I", 0x40000002) + body


def geo_m_to_tpoint(wkb: bytes, srid: int = 4326,
                    linear: bool = True) -> Temporal:
    import struct
    assert wkb[0] == 1
    (gtype,) = struct.unpack_from("<I", wkb, 1)
    assert gtype == 0x40000002, "expected LineString M"
    (n,) = struct.unpack_from("<I", wkb, 5)
    arr = np.frombuffer(wkb, dtype="<f8", count=3 * n, offset=9).reshape(n, 3)
    times = (arr[:, 2] * 1e6).round().astype(np.int64)
    return Temporal.sequence(times, arr[:, :2], srid=srid, linear=linear,
                             normalize=False)
