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

import re

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
    so eq tests segment interiors, not just knots.  Bound inclusivity
    is honored (reference ever_eq checks lower_inc/upper_inc): a value
    present ONLY at an exclusive bound is never attained."""
    from .lifting import _crossing_ratio
    target = np.atleast_1d(np.asarray(value, dtype=np.float64))
    for s in tv.seqs:
        hold = _cmp(op, s.values, target)
        n = len(s.times)
        if n > 1:
            if tv.linear:
                # eq (and the equality case of le/ge) at an exclusive
                # bound is not attained; strict ops still hold just
                # inside the bound by continuity
                if op in ("eq", "le", "ge"):
                    if not s.lower_inc and bool(
                            np.all(np.abs(s.values[0] - target) <= EPSILON)):
                        hold[0] = False
                    if not s.upper_inc and bool(
                            np.all(np.abs(s.values[-1] - target) <= EPSILON)):
                        hold[-1] = False
            else:
                # stepwise: the final knot's value is attained only at
                # the final instant itself
                if not s.upper_inc:
                    hold[-1] = False
        if hold.any():
            return True
        if tv.linear and n > 1 and op == "eq":
            # attainment strictly inside a segment (crossing with the
            # constant target); bound knots are handled above
            v0, v1 = s.values[:-1], s.values[1:]
            for i in range(n - 1):
                if _crossing_ratio(v0[i], v1[i], target, target) is not None:
                    return True
                # constant segment equal to target: attained on the
                # open interior even when both bounds are exclusive
                if np.all(np.abs(v0[i] - target) <= EPSILON) and \
                        np.all(np.abs(v1[i] - target) <= EPSILON):
                    return True
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

def _traj_checked(tv: Temporal) -> geo.Geometry:
    """Trajectory for relate: PostGIS errors on mixed point+line
    collections ("Relate Operation called with a LWGEOMCOLLECTION",
    `66_tpoint_spatialrels.test.out:6422`) — replicate."""
    from .spatial import trajectory
    g = trajectory(tv)
    if g.kind == "MultiLineString":
        lens = [len(p) for p in g.parts]
        if any(n == 1 for n in lens) and any(n > 1 for n in lens):
            raise ValueError(
                "Relate Operation called with a LWGEOMCOLLECTION type.  "
                "This is unsupported.")
        if all(n == 1 for n in lens):
            g = geo.Geometry("MultiPoint", g.parts, g.srid)
    return g


def _sync_pair(a: Temporal, b: Temporal) -> tuple[Temporal, Temporal] | None:
    """Restrict two temporal points to their synchronized instants
    (``intersection_temporal_temporal`` before the trajectory relate,
    `tpoint_spatialrels.c:1326-1345`)."""
    from .lifting import synchronize, _result_dur
    from .types import Seq
    pieces = synchronize(a, b)
    if not pieces:
        return None
    sa = [Seq(ts, va, lo, hi) for ts, va, _vb, lo, hi in pieces]
    sb = [Seq(ts, vb, lo, hi) for ts, _va, vb, lo, hi in pieces]
    dur = _result_dur(a, b, len(sa))
    return (Temporal(dur, sa, a.linear, a.srid),
            Temporal(dur, sb, b.linear, b.srid))


def relate(a, b) -> str | None:
    """DE-9IM matrix (text) — relate(geo, tpoint) / relate(tpoint, geo)
    / relate(tpoint, tpoint) (`tpoint_spatialrels.c:1276-1345`).  The
    reference passes the trajectory as the FIRST relate operand for
    both mixed argument orders (dispatcher `:252-283` with
    invert=false), so both orders yield the same matrix."""
    from .de9im import relate_geoms
    if isinstance(a, Temporal) and isinstance(b, Temporal):
        got = _sync_pair(a, b)
        if got is None:
            return None
        return relate_geoms(_traj_checked(got[0]), _traj_checked(got[1]))
    tv, g = (a, b) if isinstance(a, Temporal) else (b, a)
    if g.is_empty:
        return None
    if not g.is_empty and g.parts[0].shape[1] != tv.dim:
        raise ValueError("The temporal point and the geometry must be "
                         "of the same dimensionality")
    return relate_geoms(_traj_checked(tv), g)


def relate_pattern(a, b, pattern: str) -> bool | None:
    """relate_pattern(…, text) → bool
    (`tpoint_spatialrels.c:1348-1423`)."""
    from .de9im import matches_pattern
    m = relate(a, b)
    return None if m is None else matches_pattern(m, pattern)


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


def _remap_xy(tv: Temporal, fn, srid_to: int) -> Temporal:
    """Apply an (n,2)→(n,2) coordinate map to x/y, keeping any z."""
    from .types import Seq
    out = []
    for s in tv.seqs:
        xy = fn(s.values[:, :2])
        vals = (np.hstack([xy, s.values[:, 2:]])
                if s.values.shape[1] > 2 else xy)
        out.append(Seq(s.times.copy(), vals, s.lower_inc, s.upper_inc))
    return Temporal(tv.duration, out, tv.linear, srid_to, tv.step_default)


def transform(tv: Temporal, srid_to: int) -> Temporal:
    """setSRID/transform between the closed-form CRS pairs this
    engine ships: 4326⇄3857 (web mercator) and 4326⇄5676
    (Gauss-Krüger zone 2, the reference's projection_gk.c datum —
    the general-PROJ surface is a documented environment limit)."""
    if tv.srid == srid_to:
        return tv
    pair = {tv.srid, srid_to}
    if pair == {4326, 3857}:
        fn = lonlat_to_mercator if srid_to == 3857 else mercator_to_lonlat

        def xy(v):
            x, y = fn(v[:, 0], v[:, 1])
            return np.stack([x, y], axis=1)
        return _remap_xy(tv, xy, srid_to)
    if pair == {4326, 5676}:
        return _remap_xy(
            tv, _gk_np if srid_to == 5676 else gk_inverse_np, srid_to)
    raise ValueError(f"unsupported transform {tv.srid}->{srid_to}")


# -- Gauss-Krüger (Secondo/Hagen variant, `point/src/projection_gk.c`) ------
# WGS84 geodetic → geocentric → 7-param Helmert to Bessel/Potsdam →
# geodetic (fixed-point iteration) → Gauss-Krüger zone-2 easting/
# northing.  Closed-form, no proj lib needed; vectorized re-expression
# of the reference's per-point algorithm, constants `projection_gk.c:
# 25-40`, goldens `56_tpoint_spatialfuncs.test.out:39-45`.
_GK_AWGS, _GK_BWGS = 6378137.0, 6356752.314
_GK_ABES, _GK_BBES = 6377397.155, 6356078.962
_GK_CBES = 111120.6196
_GK_DX, _GK_DY, _GK_DZ = -585.7, -87.0, -409.2
_GK_ROTX, _GK_ROTY, _GK_ROTZ = 2.540423689e-6, 7.514612057e-7, -1.368144208e-5
_GK_SC = 0.99999122
_GK_MDC = 2.0  # zone 2 (Hagen)


def _gk_np(vals: np.ndarray) -> np.ndarray:
    lon = np.radians(vals[:, 0])
    lat = np.radians(vals[:, 1])
    eqwgs = (_GK_AWGS ** 2 - _GK_BWGS ** 2) / _GK_AWGS ** 2
    eqbes = (_GK_ABES ** 2 - _GK_BBES ** 2) / _GK_ABES ** 2
    # geodetic → geocentric on WGS84
    N = _GK_AWGS / np.sqrt(1.0 - eqwgs * np.sin(lat) ** 2)
    xq = N * np.cos(lat) * np.cos(lon)
    yq = N * np.cos(lat) * np.sin(lon)
    zq = (1.0 - eqwgs) * N * np.sin(lat)
    # Helmert 7-parameter (small-angle) into the Bessel datum
    x = _GK_DX + _GK_SC * (xq + _GK_ROTZ * yq - _GK_ROTY * zq)
    y = _GK_DY + _GK_SC * (-_GK_ROTZ * xq + yq + _GK_ROTX * zq)
    z = _GK_DZ + _GK_SC * (_GK_ROTY * xq - _GK_ROTX * yq + zq)
    # geocentric → Bessel geodetic: fixed point on latitude
    # (BLRauenberg, projection_gk.c:96-115; tolerance 1e-9)
    rxy = np.sqrt(x * x + y * y)
    p = z / rxy
    f = np.full(len(vals), np.pi * 50.0 / 180.0)
    # iteration cap + per-row NaN mask: a degenerate coordinate
    # (rxy == 0 at a geocentric pole) yields NaN and would make a
    # whole-batch convergence test permanently False (hang) — while a
    # whole-batch bail would freeze every OTHER row at its current
    # iterate (batch-composition-dependent output).  Degenerate rows
    # go NaN and stay NaN; finite rows iterate to convergence.
    for _ in range(100):
        with np.errstate(invalid="ignore", divide="ignore"):
            zw = _GK_ABES / np.sqrt(1.0 - eqbes * np.sin(f) ** 2)
            nnq = 1.0 - (eqbes * zw / (rxy / np.cos(f)))
            f1 = np.arctan(p / nnq)
        bad = np.isnan(f1)
        if np.abs(np.where(bad, 0.0, f - f1)).max() < 10e-10:
            f = f1
            break
        f = f1
    b, ll = f, np.arctan(y / x)
    # Bessel geodetic → Gauss-Krüger (BesselBLToGaussKrueger, :43-71)
    l0 = np.pi * (3.0 * _GK_MDC) / 180.0
    dl = ll - l0
    k = np.cos(b)
    t = np.sin(b) / k
    vq = 1.0 + eqbes * k * k
    ng = _GK_ABES ** 2 / (_GK_BBES * np.sqrt(vq))
    nk = (_GK_ABES - _GK_BBES) / (_GK_ABES + _GK_BBES)
    xx = (ng * t * k ** 2 * dl ** 2) / 2.0 \
        + (ng * t * (9.0 * vq - t * t - 4.0) * k ** 4 * dl ** 4) / 24.0
    gg = b + ((-3.0 * nk / 2.0 + 9.0 * nk ** 3 / 16.0) * np.sin(2.0 * b)
              + 15.0 * nk ** 2 * np.sin(4.0 * b) / 16.0
              - 35.0 * nk ** 3 * np.sin(6.0 * b) / 48.0)
    ss = gg * 180.0 * _GK_CBES / np.pi
    northing = ss + xx
    yy = ng * k * dl + ng * (vq - t * t) * k ** 3 * dl ** 3 / 6.0 \
        + ng * (5.0 - 18.0 * t * t + t ** 4) * k ** 5 * dl ** 5 / 120.0
    easting = _GK_MDC * 1_000_000.0 + 500_000.0 + yy
    return np.stack([easting, northing], axis=1)


def transform_gk(tv: Temporal) -> Temporal:
    """transform_gk(tgeompoint): WGS84 → Gauss-Krüger zone 2
    (`projection_gk.c`, SQL `56_tpoint_spatialfuncs.in.sql`)."""
    from .types import Seq
    seqs = [Seq(s.times.copy(), _gk_np(s.values), s.lower_inc, s.upper_inc)
            for s in tv.seqs]
    return Temporal(tv.duration, seqs, tv.linear, 4326, tv.step_default)


def transform_gk_geom(g: geo.Geometry) -> geo.Geometry:
    """transform_gk(geometry) for Point/LineString operands
    (`geometry_transform_gk_internal`)."""
    if g.is_empty:
        return g
    if g.kind not in ("Point", "LineString"):
        raise ValueError("Component geometry/geography must be of "
                         "type Point(Z)M or LineString")
    return geo.Geometry(g.kind, [_gk_np(np.atleast_2d(p)) for p in g.parts],
                        4326)


def gk_inverse_np(vals: np.ndarray) -> np.ndarray:
    """Inverse of ``_gk_np``: Gauss-Krüger zone-2 easting/northing →
    WGS84 lon/lat.  The reference reaches SRID 5676 through PROJ;
    this closed-form inverse of the same Secondo/Hagen pipeline is
    the engine's stand-in: 2D Newton on the analytic Bessel→GK
    forward, Bessel geodetic → geocentric, exact inverse of the
    small-angle Helmert matrix, then the BLRauenberg fixed point on
    the WGS84 ellipsoid.  Forward∘inverse roundtrips to ~1e-9° for
    in-zone coordinates (pytest-gated)."""
    e = np.asarray(vals[:, 0], dtype=np.float64)
    n = np.asarray(vals[:, 1], dtype=np.float64)
    eqbes = (_GK_ABES ** 2 - _GK_BBES ** 2) / _GK_ABES ** 2
    nk = (_GK_ABES - _GK_BBES) / (_GK_ABES + _GK_BBES)
    yy = e - _GK_MDC * 1_000_000.0 - 500_000.0

    def fwd(b, dl):
        k = np.cos(b)
        t = np.sin(b) / k
        vq = 1.0 + eqbes * k * k
        ng = _GK_ABES ** 2 / (_GK_BBES * np.sqrt(vq))
        xx = (ng * t * k ** 2 * dl ** 2) / 2.0 \
            + (ng * t * (9.0 * vq - t * t - 4.0) * k ** 4 * dl ** 4) / 24.0
        gg = b + ((-3.0 * nk / 2.0 + 9.0 * nk ** 3 / 16.0)
                  * np.sin(2.0 * b)
                  + 15.0 * nk ** 2 * np.sin(4.0 * b) / 16.0
                  - 35.0 * nk ** 3 * np.sin(6.0 * b) / 48.0)
        north = gg * 180.0 * _GK_CBES / np.pi + xx
        east = ng * k * dl + ng * (vq - t * t) * k ** 3 * dl ** 3 / 6.0 \
            + ng * (5.0 - 18.0 * t * t + t ** 4) * k ** 5 * dl ** 5 / 120.0
        return east, north

    # 2D Newton in Bessel space with finite-difference jacobian;
    # fixed iteration budget keeps the map total and deterministic
    b = np.clip(n * np.pi / (180.0 * _GK_CBES), -1.4, 1.4)
    ng0 = _GK_ABES ** 2 / (_GK_BBES * np.sqrt(1.0 + eqbes))
    dl = yy / (ng0 * np.maximum(np.cos(b), 1e-6))
    h = 1e-8
    for _ in range(25):
        fe, fn_ = fwd(b, dl)
        rx, ry = fe - yy, fn_ - n
        if max(np.abs(rx).max(initial=0.0),
               np.abs(ry).max(initial=0.0)) < 1e-10:
            break
        feb, fnb = fwd(b + h, dl)
        fed, fnd = fwd(b, dl + h)
        j11, j12 = (feb - fe) / h, (fed - fe) / h   # ∂e/∂b, ∂e/∂dl
        j21, j22 = (fnb - fn_) / h, (fnd - fn_) / h
        det = j11 * j22 - j12 * j21
        b = b - (rx * j22 - ry * j12) / det
        dl = dl - (ry * j11 - rx * j21) / det
        b = np.clip(b, -1.5, 1.5)
    ll = dl + np.pi * (3.0 * _GK_MDC) / 180.0
    # Bessel geodetic → Bessel-datum geocentric
    nbes = _GK_ABES / np.sqrt(1.0 - eqbes * np.sin(b) ** 2)
    x = nbes * np.cos(b) * np.cos(ll)
    y = nbes * np.cos(b) * np.sin(ll)
    z = (1.0 - eqbes) * nbes * np.sin(b)
    # exact inverse of the forward Helmert (small-angle matrix)
    rot = np.array([[1.0, _GK_ROTZ, -_GK_ROTY],
                    [-_GK_ROTZ, 1.0, _GK_ROTX],
                    [_GK_ROTY, -_GK_ROTX, 1.0]])
    rhs = np.stack([(x - _GK_DX) / _GK_SC, (y - _GK_DY) / _GK_SC,
                    (z - _GK_DZ) / _GK_SC])
    xq, yq, zq = np.linalg.solve(rot, rhs)
    # WGS84 geocentric → geodetic (BLRauenberg fixed point, eqwgs)
    eqwgs = (_GK_AWGS ** 2 - _GK_BWGS ** 2) / _GK_AWGS ** 2
    rxy = np.sqrt(xq * xq + yq * yq)
    p = zq / rxy
    f = np.arctan(p / (1.0 - eqwgs))
    for _ in range(100):
        with np.errstate(invalid="ignore", divide="ignore"):
            zw = _GK_AWGS / np.sqrt(1.0 - eqwgs * np.sin(f) ** 2)
            nnq = 1.0 - (eqwgs * zw / (rxy / np.cos(f)))
            f1 = np.arctan(p / nnq)
        bad = np.isnan(f1)
        if np.abs(np.where(bad, 0.0, f - f1)).max(initial=0.0) < 1e-12:
            f = f1
            break
        f = f1
    lon = np.degrees(np.arctan2(yq, xq))
    lat = np.degrees(f)
    return np.stack([lon, lat], axis=1)


def set_precision(tv: Temporal, digits: int) -> Temporal:
    """setprecision(tpoint, n): round every coordinate to ``digits``
    decimals (`tpoint_spatialfuncs.c tpoint_set_precision`)."""
    from .types import Seq
    seqs = [Seq(s.times.copy(), np.round(s.values, digits),
                s.lower_inc, s.upper_inc) for s in tv.seqs]
    return Temporal(tv.duration, seqs, tv.linear, tv.srid, tv.step_default)


# -- tpoint ⇄ geometry-with-M, WKT text form (`tpoint_spatialfuncs.c:
# 2766-3118` geo_to_tpoint/tpoint_to_geo; the WKB pair lives below) --

def _wkt_num(v: float) -> str:
    return f"{float(v):.15g}"


def tpoint_to_geo_m_wkt(tv: Temporal) -> str:
    """ST_AsText(tpoint::geometry): POINT M / MULTIPOINT M /
    LINESTRING M / MULTILINESTRING M with unix-epoch seconds in M."""
    from .types import INSTANT, INSTANTSET, SEQUENCE
    zdim = tv.dim > 2

    def row(vals, t):
        coords = " ".join(_wkt_num(c) for c in vals)
        return f"{coords} {_wkt_num(t / 1e6)}"

    tag = "ZM" if zdim else "M"
    if tv.duration == INSTANT:
        s = tv.seqs[0]
        return f"POINT {tag} ({row(s.values[0], s.times[0])})"
    if tv.duration == INSTANTSET:
        body = ",".join(row(s.values[0], s.times[0]) for s in tv.seqs)
        return f"MULTIPOINT {tag} ({body})"
    if tv.duration == SEQUENCE:
        s = tv.seqs[0]
        body = ",".join(row(s.values[i], s.times[i])
                        for i in range(len(s.times)))
        return f"LINESTRING {tag} ({body})"
    parts = ",".join(
        "(" + ",".join(row(s.values[i], s.times[i])
                       for i in range(len(s.times))) + ")"
        for s in tv.seqs)
    return f"MULTILINESTRING {tag} ({parts})"


_WKT_M_RE = re.compile(
    r"(?i)^\s*(POINT|LINESTRING|MULTIPOINT|MULTILINESTRING|POLYGON|"
    r"GEOMETRYCOLLECTION)\s*(ZM|Z|M)?\s*(EMPTY|\(.*\))\s*$", re.S)


def geo_m_wkt_to_tpoint(wkt: str, srid: int = 0,
                        linear: bool = True) -> Temporal:
    """geometry-with-M → tpoint with the reference's validation
    errors (`tpoint_spatialfuncs.c geo_to_tpoint`)."""
    m = _WKT_M_RE.match(wkt)
    if not m:
        raise ValueError(f"unparsed WKT {wkt!r}")
    kind, flags, body = (m.group(1).upper(), (m.group(2) or "").upper(),
                        m.group(3))
    if body.upper() == "EMPTY":
        raise ValueError("Only non-empty geometries accepted")
    if kind == "GEOMETRYCOLLECTION":
        raise ValueError("Component geometry/geography must be of "
                         "type Point(Z)M or Linestring(Z)M")
    if "M" not in flags:
        raise ValueError("Only geometries with M dimension accepted")
    if kind not in ("POINT", "MULTIPOINT", "LINESTRING",
                    "MULTILINESTRING"):
        raise ValueError("Invalid geometry type for trajectory")

    def rows(txt):
        out = []
        for tok in txt.split(","):
            c = [float(v) for v in tok.split()]
            out.append((np.array(c[:-1]), int(round(c[-1] * 1e6))))
        return out

    def seq_of(txt):
        pts = rows(txt)
        times = np.array([t for _, t in pts], dtype=np.int64)
        vals = np.stack([v for v, _ in pts])
        if len(times) > 1 and not np.all(np.diff(times) > 0):
            raise ValueError("Trajectory must be valid")
        return times, vals

    inner = body.strip()[1:-1]
    if kind == "MULTILINESTRING":
        from .types import SEQUENCESET, Seq
        seqs = []
        for part in re.findall(r"\(([^()]*)\)", inner):
            times, vals = seq_of(part)
            seqs.append(Seq(times, vals))
        return Temporal(SEQUENCESET, seqs, linear, srid)
    times, vals = seq_of(inner.replace("(", " ").replace(")", " "))
    if kind == "POINT":
        return Temporal.instant(int(times[0]), vals[0], srid=srid,
                                linear=linear)
    if kind == "MULTIPOINT":
        return Temporal.instant_set(times, vals, srid=srid, linear=linear)
    return Temporal.sequence(times, vals, srid=srid, linear=linear,
                             normalize=False)


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


# ---------------------------------------------------------------------------
# DE-9IM-style predicates on the trajectory (§2.9 remainder;
# `tpoint_spatialrels.c:300-1423` — the reference applies the plain
# GEOS predicate to the trajectory geometry; here on our exact kernels)
# ---------------------------------------------------------------------------

def _strictly_inside_frac(tv: Temporal, g: geo.Geometry) -> tuple[bool, bool]:
    """(some position strictly inside interior, some position outside).

    Probes the at_geometry pieces' midpoints + points outside the
    covered time domain — exact for polygonal geometries because
    interior membership is constant between boundary crossings."""
    from .restrict import at_periodset, complement_periods
    ps = at_geometry_periods(tv, g)
    some_inside = False
    if ps:
        inside_part = at_periodset(tv, ps, force_set=True)
        for s in inside_part.seqs:
            # midpoint of each piece: strictly inside unless the piece
            # runs along the boundary
            if len(s.times) == 1:
                pts = s.values
            else:
                pts = (s.values[:-1] + s.values[1:]) / 2.0
            d = geo.point_polygon_dist(pts[:, 0], pts[:, 1], g)
            inside = geo.points_in_polygon(pts[:, 0], pts[:, 1], g)
            if bool(np.any(inside & (d == 0.0) & ~_on_boundary(pts, g))):
                some_inside = True
                break
    comp = complement_periods(ps) if ps else None
    if ps:
        outside_part = at_periodset(tv, comp, force_set=True)
        some_outside = outside_part is not None
    else:
        some_outside = True
    return some_inside, some_outside


def _on_boundary(pts: np.ndarray, g: geo.Geometry,
                 eps: float = geo.EPSILON) -> np.ndarray:
    out = np.zeros(len(pts), dtype=bool)
    for ring, _ in g.rings():
        if len(ring) < 2:
            continue
        d, _ = geo.point_segment_dist(pts[:, 0:1], pts[:, 1:2],
                                      ring[:-1, 0], ring[:-1, 1],
                                      ring[1:, 0], ring[1:, 1])
        out |= (d.min(axis=1) <= eps)
    return out


def contains(g: geo.Geometry, tv: Temporal) -> bool | None:
    """contains(geom, tpoint): trajectory in interior+boundary with at
    least one interior position (GEOS contains semantics)."""
    if g.is_empty:
        return None
    some_in, some_out = _strictly_inside_frac(tv, g)
    return (not some_out) and some_in


def covers(g: geo.Geometry, tv: Temporal) -> bool | None:
    """covers(geom, tpoint): no position outside."""
    if g.is_empty:
        return None
    return within(tv, g)


def coveredby(tv: Temporal, g: geo.Geometry) -> bool | None:
    return covers(g, tv)


def touches(tv: Temporal, g: geo.Geometry) -> bool | None:
    """touches: boundary contact only — intersects but never enters
    the interior."""
    if g.is_empty:
        return None
    if not intersects(tv, g):
        return False
    some_in, _ = _strictly_inside_frac(tv, g)
    return not some_in


def crosses(tv: Temporal, g: geo.Geometry) -> bool | None:
    """crosses(line, area): interiors intersect AND the trajectory is
    not contained (enters and leaves)."""
    if g.is_empty:
        return None
    some_in, some_out = _strictly_inside_frac(tv, g)
    return some_in and some_out


def overlaps_rel(tv: Temporal, g: geo.Geometry) -> bool | None:
    """overlaps is dimensionally impossible for line×area (GEOS
    returns false); kept for surface parity."""
    if g.is_empty:
        return None
    return False


# -- temporal variants (→ tbool; tpoint_tempspatialrels.c:1456+) -------------

def tdisjoint(tv: Temporal, g: geo.Geometry) -> Temporal | None:
    from .lifting import tnot
    from .spatial import tintersects
    ti = tintersects(tv, g)
    return None if ti is None else tnot(ti)


def tequals(tv: Temporal, point) -> Temporal | None:
    """tequals(tpoint, point) → tbool: true exactly while positioned at
    the point (exact crossing instants via atValue)."""
    from .restrict import at_value
    from .spatial import _tbool_from_periods
    pt = np.atleast_1d(np.asarray(point, dtype=np.float64))
    hit = at_value(tv, pt)
    true_ps = hit.get_time() if hit is not None else []
    return _tbool_from_periods(tv, true_ps)


# -- total order + hash (§2.5; temporal.c:3344-3601) --------------------------

def temporal_cmp(a: Temporal, b: Temporal) -> int:
    """B-tree comparator: bounding period, then bbox, then values —
    a total order consistent with `temporal_cmp`."""
    ka = (a.start_timestamp(), a.end_timestamp(),
          tuple(a.values.min(axis=0)), tuple(a.values.max(axis=0)))
    kb = (b.start_timestamp(), b.end_timestamp(),
          tuple(b.values.min(axis=0)), tuple(b.values.max(axis=0)))
    if ka != kb:
        return -1 if ka < kb else 1
    sa, sb = str(a), str(b)
    return 0 if sa == sb else (-1 if sa < sb else 1)


def temporal_hash(a: Temporal) -> int:
    """Canonical 64-bit hash (temporal_hash, `temporal.c:3601`)."""
    import hashlib
    h = hashlib.blake2b(str(a).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big", signed=True)


def _boundary_periods(tv: Temporal, g: geo.Geometry) -> list:
    """Time periods/instants where the position lies ON the boundary
    of g: segment×ring crossing instants + collinear along-edge runs
    (endpoint+midpoint-on-boundary test — exact for piecewise-linear
    motion against polygon rings)."""
    from .spatial import _segment_polygon_entries
    from .types import Period, normalize_periods
    out: list[Period] = []
    for s in tv.seqs:
        n = len(s.times)
        pts_on = _on_boundary(s.values, g)
        if n == 1 or tv.duration in (1, 2) or not tv.linear:
            for i in range(n):
                if pts_on[i]:
                    t = int(s.times[i])
                    out.append(Period(t, t))
            if not tv.linear and n > 1:
                # stepwise: constant position holds over [t_i, t_{i+1})
                for i in range(n - 1):
                    if pts_on[i]:
                        out.append(Period(int(s.times[i]),
                                          int(s.times[i + 1]), True, False))
            continue
        for i in range(n - 1):
            p0, p1 = s.values[i], s.values[i + 1]
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            mid = (p0 + p1) / 2.0
            if pts_on[i] and pts_on[i + 1] and \
                    bool(_on_boundary(mid[None, :], g)[0]):
                out.append(Period(t0, t1))
                continue
            if pts_on[i]:
                out.append(Period(t0, t0))
            if pts_on[i + 1]:
                out.append(Period(t1, t1))
            for r in _segment_polygon_entries(p0, p1, g):
                tc = int(round(t0 + (t1 - t0) * r))
                if t0 < tc < t1:
                    out.append(Period(tc, tc))
    return normalize_periods(out)


def ttouches(tv: Temporal, g: geo.Geometry) -> Temporal | None:
    """ttouches → tbool: true exactly while on the boundary
    (`tpoint_tempspatialrels.c` ttouches semantics)."""
    if g.is_empty:
        return None
    from .spatial import _tbool_from_periods
    return _tbool_from_periods(tv, _boundary_periods(tv, g))


def tcontains(g: geo.Geometry, tv: Temporal) -> Temporal | None:
    """tcontains(geom, tpoint) → tbool: true while strictly in the
    interior (at_geometry periods minus boundary contact)."""
    if g.is_empty:
        return None
    from .spatial import _tbool_from_periods, at_geometry_periods
    from .timeops import minus
    inside = at_geometry_periods(tv, g)
    interior = minus(inside, _boundary_periods(tv, g))
    return _tbool_from_periods(tv, interior)


def tcovers(g: geo.Geometry, tv: Temporal) -> Temporal | None:
    """tcovers(geom, tpoint) ≡ tintersects for point arguments (the
    closure contains the point iff they intersect)."""
    if g.is_empty:
        return None
    from .spatial import tintersects
    return tintersects(tv, g)
