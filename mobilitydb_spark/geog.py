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
