"""Geography (tgeogpoint) operator subset — SURVEY §2.8/§2.9.

Reference: `point/src/tpoint_spatialrels.c:144-175` (geog covers /
coveredby / intersects / dwithin), `tpoint_spatialfuncs.c:902-904`
(geodetic length).  PostGIS measures on the spheroid; this engine
uses the deterministic great-circle haversine (documented divergence,
SURVEY §7) with the reference's own tolerance conventions:
``geog_intersects`` is distance < 1e-5 m, exactly like the
reference's `geog_intersects` (`tpoint_spatialrels.c:156-161`).

Temporal interpolation stays planar on (lon, lat) — the same
convention the reference inherits from its trajectory model — so
turning points come from the planar solver and the *measure* is
haversine meters.

The SQL snippet `haversine_sql` is shared text that runs unchanged in
Spark SQL and DuckDB (the engine's established cross-engine oracle
pattern); trig differs across libms only in the last ulp, which
rounding to millimeters absorbs.
"""

from __future__ import annotations

import numpy as np

from . import geo
from .cells import EARTH_RADIUS_M
from .lifting import const_temporal, lift_binary, turn_distance
from .types import EPSILON, Temporal

INTERSECT_TOL_M = 1e-5  # reference geog_intersects threshold


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Great-circle meters as a SQL expression (Spark SQL ≡ DuckDB)."""
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt(least(1.0, greatest(0.0, "
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2)))))")


def geog_length(tv: Temporal) -> float:
    """Geodetic length in meters (`tpoint_spatialfuncs.c:902-904`);
    0 for discrete/stepwise, like the planar length."""
    from .types import INSTANT, INSTANTSET
    if tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
        return 0.0
    total = 0.0
    for s in tv.seqs:
        v = s.values
        if len(v) < 2:
            continue
        total += float(geo.haversine_m(v[:-1, 0], v[:-1, 1],
                                       v[1:, 0], v[1:, 1]).sum())
    return total


def geog_distance(a: Temporal, b) -> Temporal | None:
    """Temporal great-circle distance in meters (tpoint <-> tpoint or
    tpoint <-> (lon, lat)).  Turning points from the planar closest-
    approach solver; values measured with haversine."""
    if not isinstance(b, Temporal):
        b = const_temporal(np.asarray(b, dtype=np.float64), a)
    return lift_binary(
        lambda x, y: geo.haversine_m(x[:, 0], x[:, 1], y[:, 0], y[:, 1]),
        a, b, turnfn=turn_distance)


def geog_nad(a: Temporal, b) -> float | None:
    """Nearest-approach distance in meters."""
    d = geog_distance(a, b)
    return None if d is None else float(d.min_value()[0])


def geog_dwithin(a: Temporal, b, dist_m: float) -> bool | None:
    """Ever within ``dist_m`` meters (`tpoint_spatialrels.c:166-170`)."""
    nad = geog_nad(a, b)
    return None if nad is None else bool(nad <= dist_m + EPSILON)


def geog_intersects(a: Temporal, b) -> bool | None:
    """Reference convention: spherical distance < 1e-5 m
    (`tpoint_spatialrels.c:156-161`)."""
    nad = geog_nad(a, b)
    return None if nad is None else bool(nad < INTERSECT_TOL_M)


def geog_covers(g: geo.Geometry, tv: Temporal) -> bool | None:
    """covers(geography, tgeogpoint): every position lies on/in the
    geography (`tpoint_spatialrels.c:144-154`).

    Operand classes: Point/MultiPoint use the reference's 1e-5 m
    spherical tolerance; Polygon/MultiPolygon and Line geographies
    use the module's documented planar-topology convention (planar
    containment / DE-9IM on (lon, lat), haversine only for measures) —
    the same convention the trajectory model itself interpolates
    under.  GeometryCollection operands remain excluded."""
    if g.is_empty:
        return None
    if g.kind in ("Polygon", "MultiPolygon"):
        from .everops import within
        return within(tv, g)
    if g.kind in ("LineString", "MultiLineString"):
        from .de9im import relate_geoms
        from .spatial import trajectory
        m = relate_geoms(g, trajectory(tv))
        if m is None:
            return None
        # OGC covers(A, B): something of B meets A's interior or
        # boundary, and nothing of B meets A's exterior
        touches_a = any(m[i] != "F" for i in (0, 1, 3, 4))
        return touches_a and m[6] == "F" and m[7] == "F"
    if g.kind not in ("Point", "MultiPoint"):
        raise NotImplementedError(
            "geog covers: GeometryCollection operands not supported")
    pts = np.vstack(g.parts)
    for s in tv.seqs:
        for v in s.values:
            d = geo.haversine_m(pts[:, 0], pts[:, 1],
                                np.full(len(pts), v[0]),
                                np.full(len(pts), v[1]))
            if not (d < INTERSECT_TOL_M).any():
                return False
        if tv.linear and len(s.times) > 1:
            # linear motion between distinct knots leaves the point set
            v = s.values
            moved = (np.abs(np.diff(v, axis=0)) > EPSILON).any()
            if moved:
                return False
    return True


def geog_coveredby(tv: Temporal, g: geo.Geometry) -> bool | None:
    return geog_covers(g, tv)


def geog_distance_spheroid(a: Temporal, b) -> Temporal | None:
    """Reference-parity temporal distance for geographies: WGS84
    spheroid meters (Vincenty ≡ PostGIS `geog_distance`,
    `point/src/tpoint_distance.c:43-51, 245-340`), turning instants
    from the planar lon/lat closest-approach solver
    (`tpointseq_min_dist_at_timestamp`, tpoint_distance.c:165-235 —
    the reference, too, derives the fraction from planar coordinate
    algebra for tpoint↔tpoint).  PostGIS geography ignores Z, so 3D
    operands measure on their lon/lat alone.  `geog_distance`
    (haversine) stays the table-op/oracle path."""
    if not isinstance(b, Temporal):
        b = const_temporal(np.asarray(b, dtype=np.float64), a)
    return lift_binary(
        lambda x, y: geo.vincenty_m(x[:, 0], x[:, 1], y[:, 0], y[:, 1]),
        a, b, turnfn=turn_distance)


def vincenty_azimuth_deg(lon1, lat1, lon2, lat2) -> np.ndarray:
    """WGS84 forward azimuth α₁ in SIGNED degrees (-180, 180] — the
    byproduct of the Vincenty inverse; the reference's tgeogpoint
    azimuth prints the raw spheroid_direction without the ST_Azimuth
    [0, 2π) normalization (56-suite goldens show -134.80673),
    `point/src/tpoint_spatialfuncs.c` azimuth geog branch."""
    lon1, lat1, lon2, lat2 = (np.atleast_1d(
        np.radians(np.asarray(a, dtype=np.float64)))
        for a in (lon1, lat1, lon2, lat2))
    f = geo.WGS84_F
    L = lon2 - lon1
    U1 = np.arctan((1.0 - f) * np.tan(lat1))
    U2 = np.arctan((1.0 - f) * np.tan(lat2))
    sU1, cU1 = np.sin(U1), np.cos(U1)
    sU2, cU2 = np.sin(U2), np.cos(U2)
    lam = L.copy()
    for _ in range(100):
        sl, cl = np.sin(lam), np.cos(lam)
        ss = np.hypot(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl)
        cs = sU1 * sU2 + cU1 * cU2 * cl
        zero = ss == 0.0
        sig = np.arctan2(ss, cs)
        sa = np.where(zero, 0.0, cU1 * cU2 * sl / np.where(zero, 1.0, ss))
        c2a = 1.0 - sa * sa
        polar = c2a == 0.0
        c2m = np.where(polar, 0.0,
                       cs - 2.0 * sU1 * sU2 / np.where(polar, 1.0, c2a))
        C = f / 16.0 * c2a * (4.0 + f * (4.0 - 3.0 * c2a))
        lam_new = L + (1.0 - C) * f * sa * (
            sig + C * ss * (c2m + C * cs * (-1.0 + 2.0 * c2m * c2m)))
        if np.all(np.abs(lam_new - lam) < 1e-14):
            lam = lam_new
            break
        lam = lam_new
    sl, cl = np.sin(lam), np.cos(lam)
    return np.degrees(np.arctan2(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl))


def geog_azimuth(tv: Temporal) -> Temporal | None:
    """Stepwise tfloat of spheroid segment bearings in RADIANS
    (mirror of spatial.azimuth with the Vincenty α₁ bearing); NULL
    for discrete and stepwise inputs, like the planar azimuth."""
    from .types import INSTANT, INSTANTSET, SEQUENCESET, Seq

    if tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
        return None
    out = []
    for s in tv.seqs:
        n = len(s.times)
        if n == 1:
            continue
        v = s.values
        az = np.radians(vincenty_azimuth_deg(v[:-1, 0], v[:-1, 1],
                                             v[1:, 0], v[1:, 1]))
        d = np.diff(v[:, :2], axis=0)
        moving = (np.abs(d) > 0).any(axis=1)
        i = 0
        while i < n - 1:
            if not moving[i]:
                i += 1
                continue
            j = i
            while j < n - 1 and moving[j]:
                j += 1
            ts = s.times[i:j + 1]
            vals = np.concatenate([az[i:j], az[j - 1:j]])[:, None]
            lo_inc = s.lower_inc if i == 0 else True
            hi_inc = s.upper_inc if j == n - 1 else True  # run-end closes
            out.append(Seq(ts, vals, lo_inc, hi_inc))
            i = j
    if not out:
        return None
    return Temporal(SEQUENCESET, out, False, tv.srid)


def _unit_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lo, la = np.radians(lon), np.radians(lat)
    return np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                     np.sin(la)], axis=-1)


def point_edge_distance_spheroid(plon: float, plat: float,
                                 a: np.ndarray, b: np.ndarray) -> float:
    """Spheroid distance from a point to ONE geodesic edge a→b: the
    closest point is located on the great-circle arc (unit sphere),
    the measure to it is Vincenty — exactly PostGIS's geography
    model (lwgeodetic.c edge_distance_to_point + spheroid_distance),
    verified to 1e-6 m against the 56-suite geography goldens."""
    A = _unit_xyz(a[0], a[1])
    B = _unit_xyz(b[0], b[1])
    P = _unit_xyz(plon, plat)
    n = np.cross(A, B)
    norm = np.linalg.norm(n)
    if norm == 0.0:  # degenerate edge
        return float(geo.vincenty_m(plon, plat, a[0], a[1])[0])
    n = n / norm
    C = P - np.dot(P, n) * n
    cn = np.linalg.norm(C)
    cands = [a, b]
    if cn > 0.0:
        C = C / cn
        # C must lie on the ARC a..b: angles A-C + C-B == A-B
        angAB = np.arccos(np.clip(np.dot(A, B), -1, 1))
        angAC = np.arccos(np.clip(np.dot(A, C), -1, 1))
        angCB = np.arccos(np.clip(np.dot(C, B), -1, 1))
        if angAC + angCB <= angAB + 1e-12:
            lon = float(np.degrees(np.arctan2(C[1], C[0])))
            lat = float(np.degrees(np.arcsin(np.clip(C[2], -1, 1))))
            cands.append(np.array([lon, lat]))
    return float(min(geo.vincenty_m(plon, plat, c[0], c[1])[0]
                     for c in cands))


def point_line_distance_spheroid(plon: float, plat: float,
                                 coords: np.ndarray) -> float:
    """Min over the polyline's geodesic edges (single point → 0-length
    handled by the edge kernel)."""
    if len(coords) == 1:
        return float(geo.vincenty_m(plon, plat,
                                    coords[0][0], coords[0][1])[0])
    return min(point_edge_distance_spheroid(plon, plat,
                                            coords[k], coords[k + 1])
               for k in range(len(coords) - 1))


# ---------------------------------------------------------------------------
# _ST_BestSRID UTM projection — the reference's geography NAI /
# value-at-timestamp pipeline (`src/temporalseq.c:3157-3177`,
# `point/src/tpoint_spatialfuncs.c:2152-2215`): geography segments are
# transformed to the best UTM zone, handled planar there, and carried
# back to 4326.  Krüger series to n⁴ (≈nm agreement with PROJ tmerc
# inside a zone — far below the suites' 1e-6° print precision).
# ---------------------------------------------------------------------------

_WGS_A = 6378137.0
_WGS_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_UTM_E0 = 500000.0


def _kruger_coeffs():
    n = _WGS_F / (2.0 - _WGS_F)
    A = _WGS_A / (1.0 + n) * (1.0 + n ** 2 / 4.0 + n ** 4 / 64.0)
    alpha = (n / 2.0 - 2.0 * n ** 2 / 3.0 + 5.0 * n ** 3 / 16.0
             + 41.0 * n ** 4 / 180.0,
             13.0 * n ** 2 / 48.0 - 3.0 * n ** 3 / 5.0
             + 557.0 * n ** 4 / 1440.0,
             61.0 * n ** 3 / 240.0 - 103.0 * n ** 4 / 140.0,
             49561.0 * n ** 4 / 161280.0)
    beta = (n / 2.0 - 2.0 * n ** 2 / 3.0 + 37.0 * n ** 3 / 96.0
            - n ** 4 / 360.0,
            n ** 2 / 48.0 + n ** 3 / 15.0 - 437.0 * n ** 4 / 1440.0,
            17.0 * n ** 3 / 480.0 - 37.0 * n ** 4 / 840.0,
            4397.0 * n ** 4 / 161280.0)
    delta = (2.0 * n - 2.0 * n ** 2 / 3.0 - 2.0 * n ** 3
             + 116.0 * n ** 4 / 45.0,
             7.0 * n ** 2 / 3.0 - 8.0 * n ** 3 / 5.0
             - 227.0 * n ** 4 / 45.0,
             56.0 * n ** 3 / 15.0 - 136.0 * n ** 4 / 35.0,
             4279.0 * n ** 4 / 630.0)
    return n, A, alpha, beta, delta


_KN, _KA, _KALPHA, _KBETA, _KDELTA = _kruger_coeffs()


def best_utm_lon0(lons: np.ndarray) -> float:
    """Central meridian of the PostGIS _ST_BestSRID UTM zone for the
    operands' combined extent (geography_measurement.c zone pick)."""
    cx = (float(np.min(lons)) + float(np.max(lons))) / 2.0
    zone = int(np.floor((cx + 180.0) / 6.0))
    zone = min(max(zone, 0), 59)
    return zone * 6.0 - 180.0 + 3.0


def utm_forward_np(lonlat: np.ndarray, lon0: float) -> np.ndarray:
    lon = np.radians(np.asarray(lonlat[:, 0], dtype=np.float64) - lon0)
    lat = np.radians(np.asarray(lonlat[:, 1], dtype=np.float64))
    es = 2.0 * np.sqrt(_KN) / (1.0 + _KN)
    t = np.sinh(np.arctanh(np.sin(lat))
                - es * np.arctanh(es * np.sin(lat)))
    xi = np.arctan2(t, np.cos(lon))
    eta = np.arcsinh(np.sin(lon) / np.sqrt(t * t + np.cos(lon) ** 2))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(_KALPHA, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    return np.stack([_UTM_E0 + _UTM_K0 * _KA * x,
                     _UTM_K0 * _KA * y], axis=1)


def utm_inverse_np(en: np.ndarray, lon0: float) -> np.ndarray:
    xi = np.asarray(en[:, 1], dtype=np.float64) / (_UTM_K0 * _KA)
    eta = (np.asarray(en[:, 0], dtype=np.float64) - _UTM_E0) \
        / (_UTM_K0 * _KA)
    xin, etan = xi.copy(), eta.copy()
    for j, b in enumerate(_KBETA, start=1):
        xin -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etan -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xin) / np.cosh(etan))
    lat = chi.copy()
    for j, d in enumerate(_KDELTA, start=1):
        lat += d * np.sin(2 * j * chi)
    lon = np.arctan2(np.sinh(etan), np.cos(xin))
    return np.stack([np.degrees(lon) + lon0, np.degrees(lat)], axis=1)


def geog_interpolate_point(p1: np.ndarray, p2: np.ndarray,
                           ratio: float) -> np.ndarray:
    """tgeogpoint value-at-timestamp: linear interpolation of the
    BestSRID-projected chord carried back to 4326; any z ordinate
    interpolates linearly (temporalseq.c:3157-3177)."""
    p1 = np.asarray(p1, dtype=np.float64)
    p2 = np.asarray(p2, dtype=np.float64)
    lon0 = best_utm_lon0(np.array([p1[0], p2[0]]))
    seg = utm_forward_np(np.stack([p1[:2], p2[:2]]), lon0)
    mid = seg[0] + (seg[1] - seg[0]) * ratio
    out = utm_inverse_np(mid[None, :], lon0)[0]
    if len(p1) > 2:
        out = np.append(out, p1[2] + (p2[2] - p1[2]) * ratio)
    return out


def _seg_len_spheroid(p0: np.ndarray, p1: np.ndarray) -> float:
    """Per-segment tgeogpoint metric length: spheroid ground distance
    with any z delta composed by hypot (the reference's 3D geography
    length goldens, 56-suite: 313711.325320 = hypot(2×Vincenty, 2m))."""
    d = float(geo.vincenty_m(p0[0], p0[1], p1[0], p1[1])[0])
    if len(p0) > 2:
        d = float(np.hypot(d, p1[2] - p0[2]))
    return d


def geog_length_spheroid(tv: Temporal) -> float:
    """length(tgeogpoint) on the WGS84 spheroid
    (`point/src/tpoint_spatialfuncs.c:902-904` with
    use_spheroid=true); discrete/stepwise durations measure 0."""
    from .types import INSTANT, INSTANTSET
    if tv.duration in (INSTANT, INSTANTSET) or not tv.linear:
        return 0.0
    total = 0.0
    for s in tv.seqs:
        for i in range(len(s.times) - 1):
            total += _seg_len_spheroid(s.values[i], s.values[i + 1])
    return total


def geog_speed_spheroid(tv: Temporal) -> Temporal | None:
    """speed(tgeogpoint): stepwise m/s profile from spheroid segment
    lengths (mirrors spatial.speed's structure — stepwise motion is 0
    everywhere, consecutive equal speeds normalize away)."""
    from .types import INSTANT, INSTANTSET, Seq, normalize_instants
    if tv.duration in (INSTANT, INSTANTSET):
        return None
    seqs = []
    for s in tv.seqs:
        n = len(s.times)
        if n < 2:
            seqs.append(Seq(s.times.copy(), np.zeros((1, 1)),
                            s.lower_inc, s.upper_inc))
            continue
        if not tv.linear:
            sp = np.zeros(n - 1)
        else:
            sp = np.array([
                _seg_len_spheroid(s.values[i], s.values[i + 1])
                / ((int(s.times[i + 1]) - int(s.times[i])) / 1e6)
                for i in range(n - 1)])
        vals = np.concatenate([sp, sp[-1:]])[:, None]
        ts2, v2 = normalize_instants(s.times, vals, linear=False)
        seqs.append(Seq(ts2, v2, s.lower_inc, s.upper_inc))
    return Temporal(tv.duration, seqs, False, 0)  # tfloat: no srid


def geog_value_at(tv: Temporal, t: int) -> np.ndarray | None:
    """tgeogpoint valueAtTimestamp: exact vertex at knots, the
    BestSRID chord interpolation inside linear segments
    (`src/temporalseq.c:3111-3177` geography branch).  The planar
    ``Temporal.value_at`` remains the tgeompoint path."""
    for s in tv.seqs:
        n = len(s.times)
        for i in range(n):
            if int(s.times[i]) == t:
                return s.values[i]
        if not tv.linear:
            continue
        for i in range(n - 1):
            t0, t1 = int(s.times[i]), int(s.times[i + 1])
            if t0 < t < t1:
                if np.array_equal(s.values[i], s.values[i + 1]):
                    return s.values[i]
                return geog_interpolate_point(
                    s.values[i], s.values[i + 1], (t - t0) / (t1 - t0))
    return tv.value_at(t)


# ---------------------------------------------------------------------------
# PostGIS lwgeom_distance_spheroid model: the closest pair is located
# with SPHERE math (edge_distance_to_edge / edge_distance_to_point,
# lwgeodetic.c — per-endpoint great-circle feet clamped to the arc,
# plus arc-crossing → 0) and the winning pair is then measured on the
# WGS84 spheroid.  This is what NAD(tgeogpoint, geography) reduces to
# (`point/src/tpoint_spatialfuncs.c` NAD_tpoint_geo: distance between
# the trajectory geography and the operand).
# ---------------------------------------------------------------------------

def _u3(p) -> np.ndarray:
    lo, la = np.radians(float(p[0])), np.radians(float(p[1]))
    return np.array([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                     np.sin(la)])


def _u3_ll(v: np.ndarray) -> tuple[float, float]:
    v = v / np.linalg.norm(v)
    return (float(np.degrees(np.arctan2(v[1], v[0]))),
            float(np.degrees(np.arcsin(np.clip(v[2], -1, 1)))))


def _ang(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.arccos(np.clip(np.dot(a, b), -1.0, 1.0)))


def _sphere_closest_on_arc(p: np.ndarray, a: np.ndarray,
                           b: np.ndarray) -> np.ndarray:
    """Closest unit-sphere point on arc a-b to p (perpendicular foot
    when inside the arc, else the nearer endpoint)."""
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn < 1e-15:
        return a
    n = n / nn
    q = p - np.dot(p, n) * n
    qn = np.linalg.norm(q)
    if qn < 1e-15:
        return a
    q = q / qn
    if _ang(a, q) + _ang(q, b) <= _ang(a, b) + 1e-12:
        return q
    return a if _ang(p, a) <= _ang(p, b) else b


def _arcs_cross(a, b, c, d) -> bool:
    n1, n2 = np.cross(a, b), np.cross(c, d)
    x = np.cross(n1, n2)
    xn = np.linalg.norm(x)
    if xn < 1e-15:
        return False
    for cand in (x / xn, -x / xn):
        if (_ang(a, cand) + _ang(cand, b) <= _ang(a, b) + 1e-12
                and _ang(c, cand) + _ang(cand, d)
                <= _ang(c, d) + 1e-12):
            return True
    return False


def geog_polyline_geom_nad_spheroid(coords: np.ndarray,
                                    g: geo.Geometry,
                                    has_edges: bool = True) -> float:
    """NAD between a lon/lat polyline (a trajectory) and a Point /
    LineString geography: sphere-witness pair, spheroid measure."""
    pts_a = [np.asarray(p[:2], dtype=np.float64) for p in coords]
    ua = [_u3(p) for p in pts_a]
    parts_b = [np.atleast_2d(p) for p in g.parts]
    pts_b = [np.asarray(q[:2], dtype=np.float64)
             for part in parts_b for q in part]
    ub = [_u3(p) for p in pts_b]
    edges_a = ([(ua[i], ua[i + 1]) for i in range(len(ua) - 1)]
               if has_edges else [])
    edges_b = []
    for part in parts_b:
        uu = [_u3(q[:2]) for q in part]
        edges_b += [(uu[i], uu[i + 1]) for i in range(len(uu) - 1)]
    for ea in edges_a:
        for eb in edges_b:
            if _arcs_cross(*ea, *eb):
                return 0.0
    best = (np.inf, None, None)
    for p in ua:
        for eb in edges_b:
            q = _sphere_closest_on_arc(p, *eb)
            d = _ang(p, q)
            if d < best[0]:
                best = (d, p, q)
    for p in ub:
        for ea in edges_a:
            q = _sphere_closest_on_arc(p, *ea)
            d = _ang(p, q)
            if d < best[0]:
                best = (d, p, q)
    if best[1] is None:  # point×point fallbacks
        for p in ua:
            for q in ub:
                d = _ang(p, q)
                if d < best[0]:
                    best = (d, p, q)
    w1, w2 = _u3_ll(best[1]), _u3_ll(best[2])
    return float(geo.vincenty_m(w1[0], w1[1], w2[0], w2[1])[0])


def geog_nad_geom_spheroid(tv: Temporal, g: geo.Geometry) -> float:
    """NAD(tgeogpoint, geography geometry operand): spheroid distance
    of the trajectory to the operand (NAD_tpoint_geo)."""
    from .types import INSTANT, INSTANTSET
    discrete = tv.duration in (INSTANT, INSTANTSET) or not tv.linear
    best = np.inf
    for s in tv.seqs:
        d = geog_polyline_geom_nad_spheroid(
            s.values, g, has_edges=not discrete and len(s.times) > 1)
        best = min(best, d)
        if best == 0.0:
            break
    return best
