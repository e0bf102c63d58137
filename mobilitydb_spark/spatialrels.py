"""MobilityDB spatial-relationship dispatch for temporal points.

Re-expresses the reference's spatial-relationship SQL surface
(`point/src/tpoint_spatialrels.c`): contains / containsproperly /
covers / coveredby / crosses / disjoint / equals / intersects /
overlaps / touches / within / dwithin / relate over every operand
order (geometry x tpoint, tpoint x geometry, tpoint x tpoint) plus the
geography subset (covers / coveredby / intersects / dwithin).

Semantics (`tpoint_spatialrels.c:252-295`): every predicate except
``dwithin`` on two *moving* points is evaluated STATICALLY on the
trajectory geometry of the temporal operand(s); two temporal operands
are first synchronized to their common time
(``intersection_temporal_temporal``) and yield SQL NULL when they do
not overlap in time.  ``dwithin(tpoint, tpoint)`` is the temporal
closest-approach test (`:177-245`).

Operand-order quirks replicated from the reference dispatch table
(the ``invert`` flags in `tpoint_spatialrels.c:297-1423`):

- ``coveredby(geo, tpoint)`` evaluates coveredby(trajectory, geo) —
  i.e. BOTH argument orders ask "is the temporal point covered by the
  geometry" (`:533-560`, invert=false on the geo-first variant);
- ``within`` maps to PostGIS ``geom_within(g1, g2) =
  ST_Contains(g2, g1)`` (`:139-143`);
- the relate MATRIX is computed trajectory-first for both mixed
  orders (`:1276-1321`), but relate-with-PATTERN is geometry-first
  for the geo-first variant (`:1351-1372`, invert=true).

PostGIS evaluation model (the reference delegates to PostGIS 2.5):
bounding-box short-circuits run BEFORE GEOS relate — contains /
containsproperly / covers require box(B) inside box(A) (else false),
coveredby the reverse, equals identical boxes, touches / crosses /
overlaps overlapping boxes (else false), disjoint returns TRUE on
non-overlapping boxes, intersects FALSE; only cases surviving the box
check reach relate, which raises PostGIS's LWGEOMCOLLECTION error on
mixed point+line trajectory collections.  ``intersects`` and
``dwithin`` use collection-tolerant paths (ST_Intersects recursion /
native distance), as PostGIS does.

Geography covers is PostGIS's restricted spherical implementation:
the covered operand must be a single-component geometry (Point /
LineString) — any multi-part covered side returns false
(`geography_covers`; observed truth table
`66_tpoint_spatialrels.test.out` geography blocks).
"""

from __future__ import annotations

import numpy as np

from . import geo
from .de9im import _transpose, matches_pattern, relate_geoms
from .types import Temporal

__all__ = ["spatial_rel", "SPATIAL_RELS"]

LWCOLL_MSG = ("Relate Operation called with a LWGEOMCOLLECTION type.  "
              "This is unsupported.")

# OGC DE-9IM patterns, matrix taken in computed-operand order (A, B)
_PATTERNS = {
    "contains": ("T*****FF*",),
    "containsproperly": ("T**FF*FF*",),
    "covers": ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*"),
    "coveredby": ("T*F**F***", "*TF**F***", "**FT*F***", "**F*TF***"),
    "equals": ("T*F**FFF*",),
    "disjoint": ("FF*FF****",),
    "touches": ("FT*******", "F**T*****", "F***T****"),
}

SPATIAL_RELS = ("contains", "containsproperly", "covers", "coveredby",
                "crosses", "disjoint", "equals", "intersects",
                "overlaps", "touches", "within", "dwithin", "relate")

_POINTY = ("Point", "MultiPoint")
_LINEY = ("LineString", "MultiLineString")


def _topo_dim(g: geo.Geometry) -> int:
    if g.kind in _POINTY:
        return 0
    if g.kind in _LINEY:
        if all(len(p) == 1 for p in g.parts):
            return 0
        return 1
    return 2


def _coord_dim(g: geo.Geometry, declared: int | None) -> int:
    if g.is_empty:
        return declared if declared is not None else 2
    return int(g.parts[0].shape[1])


def _traj(tv: Temporal) -> geo.Geometry:
    from .spatial import trajectory
    return trajectory(tv)


def _reject_mixed(g: geo.Geometry) -> geo.Geometry:
    """PostGIS hands non-box-short-circuited operands to GEOS relate,
    which rejects mixed point+line collections; all-stationary
    multi-seq trajectories degrade to MultiPoint (as in
    everops._traj_checked)."""
    if g.kind == "MultiLineString":
        lens = [len(p) for p in g.parts]
        if any(n == 1 for n in lens) and any(n > 1 for n in lens):
            raise ValueError(LWCOLL_MSG)
        if all(n == 1 for n in lens):
            return geo.Geometry("MultiPoint", g.parts, g.srid)
    return g


def _is_multipart(g: geo.Geometry) -> bool:
    if g.kind == "MultiPoint":
        return len(g.parts) > 1
    if g.kind == "MultiLineString":
        return len(g.parts) > 1
    return g.kind == "MultiPolygon" and len(g.parts) > 1


def _simple_parts(g: geo.Geometry):
    """Decompose any geometry into simple Point/LineString/Polygon
    pieces (PostGIS ST_Intersects recurses into collections instead of
    handing them to GEOS relate)."""
    if g.kind == "MultiPoint":
        return [geo.Geometry("Point", [p], g.srid) for p in g.parts]
    if g.kind == "MultiLineString":
        return [geo.Geometry("Point", [p], g.srid) if len(p) == 1
                else geo.Geometry("LineString", [p], g.srid)
                for p in g.parts]
    if g.kind == "MultiPolygon":
        return [geo.Geometry("Polygon", rings, g.srid) for rings in g.parts]
    if g.kind == "LineString" and len(g.parts[0]) == 1:
        return [geo.Geometry("Point", g.parts, g.srid)]
    return [g]


def _box2d(g: geo.Geometry):
    return g.bounds()


def _box_in(inner, outer) -> bool:
    return (inner[0] >= outer[0] and inner[1] >= outer[1]
            and inner[2] <= outer[2] and inner[3] <= outer[3])


def _box_overlap(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _st(fn: str, a: geo.Geometry, b: geo.Geometry) -> bool:
    """PostGIS 2.5 geometry predicate on plain geometries: bounding
    box short-circuit, then GEOS-relate DE-9IM evaluation."""
    ba, bb = _box2d(a), _box2d(b)
    if fn in ("contains", "containsproperly", "covers"):
        if not _box_in(bb, ba):
            return False
    # NB: coveredby has no box short-circuit — PostGIS 2.5 hands it
    # straight to GEOS (observed: collection operands error even when
    # the box test would fail, `66_…test.out` coveredby block)
    elif fn == "equals":
        if tuple(ba) != tuple(bb):
            return False
    elif fn in ("touches", "crosses", "overlaps"):
        if not _box_overlap(ba, bb):
            return False
    elif fn == "disjoint":
        if not _box_overlap(ba, bb):
            return True
    ra, rb = _reject_mixed(a), _reject_mixed(b)
    m = relate_geoms(ra, rb)
    return _eval_matrix(fn, m, _topo_dim(ra), _topo_dim(rb))


def _st_intersects(a: geo.Geometry, b: geo.Geometry) -> bool:
    if not _box_overlap(_box2d(a), _box2d(b)):
        return False
    for pa in _simple_parts(a):
        for pb in _simple_parts(b):
            m = relate_geoms(pa, pb)
            if m is not None and not matches_pattern(m, "FF*FF****"):
                return True
    return False


def _eval_matrix(fn: str, m: str, da: int, db: int) -> bool:
    if fn in _PATTERNS:
        return any(matches_pattern(m, p) for p in _PATTERNS[fn])
    if fn == "crosses":
        # OGC: dim-dependent (GEOSCrosses semantics)
        if da < db:
            return matches_pattern(m, "T*T******")
        if da > db:
            return matches_pattern(m, "T*****T**")
        if da == 1:
            return matches_pattern(m, "0********")
        return False
    if fn == "overlaps":
        if da != db:
            return False
        pat = "1*T***T**" if da == 1 else "T*T***T**"
        return matches_pattern(m, pat)
    raise ValueError(f"unknown spatial relationship {fn!r}")


# ---------------------------------------------------------------------------
# SQL-wrapper stbox prefilter (66_tpoint_spatialrels.in.sql:83-420)
# ---------------------------------------------------------------------------
# The reference's user-facing mixed-operand functions are SQL wrappers
# that run an stbox-operator index prefilter BEFORE the C function:
#   contains/containsproperly/covers ->  $1 @> $2 AND _fn($1,$2)
#   coveredby/within                 ->  $1 <@ $2 AND _fn($1,$2)
#   crosses/touches/overlaps/intersects -> $1 && $2 AND _fn($1,$2)
#   equals                           ->  $1 ~= $2 AND _fn($1,$2)
#   dwithin(g,tp,d) -> ST_Expand(g,d) && tp; dwithin(tp,g,d) mirrored
# A false prefilter short-circuits to false without the C validation
# or GEOS call (observed: coveredby(geo, seqset) errors while
# coveredby(seqset, geo) returns f).  The tpoint x tpoint variants
# call the C functions directly (no prefilter).  Mixed geometry/tpoint
# stboxes share only the spatial dimensions, so the comparison is
# spatial-only (z only when both are 3D), per the reference's
# flag-aware stbox operators (`point/src/tpoint_boxops.c:51-135`).

_PREFILTER_OP = {
    "contains": "@>", "containsproperly": "@>", "covers": "@>",
    "coveredby": "<@", "within": "<@",
    "crosses": "&&", "touches": "&&", "overlaps": "&&",
    "intersects": "&&", "equals": "~=",
}


def _sbox(v, expand: float = 0.0):
    """Spatial bbox (xmin, ymin, xmax, ymax, zmin|None, zmax|None)."""
    if isinstance(v, Temporal):
        vals = v.values
        zmin = zmax = None
        if v.dim > 2:
            zmin = float(vals[:, 2].min()) - expand
            zmax = float(vals[:, 2].max()) + expand
        return (float(vals[:, 0].min()) - expand,
                float(vals[:, 1].min()) - expand,
                float(vals[:, 0].max()) + expand,
                float(vals[:, 1].max()) + expand, zmin, zmax)
    bx = v.bounds()
    zmin = zmax = None
    if not v.is_empty and v.parts[0].shape[1] > 2:
        allz = np.concatenate([np.atleast_2d(p)[:, 2] for p in
                               (v.parts if v.kind != "MultiPolygon"
                                else [r for rs in v.parts for r in rs])])
        zmin, zmax = float(allz.min()) - expand, float(allz.max()) + expand
    return (bx[0] - expand, bx[1] - expand, bx[2] + expand,
            bx[3] + expand, zmin, zmax)


def _sbox_cmp(op: str, a, b) -> bool:
    both_z = a[4] is not None and b[4] is not None
    if op == "@>":
        ok = (a[0] <= b[0] and a[1] <= b[1]
              and b[2] <= a[2] and b[3] <= a[3])
        if both_z:
            ok = ok and a[4] <= b[4] and b[5] <= a[5]
        return ok
    if op == "<@":
        return _sbox_cmp("@>", b, a)
    if op == "&&":
        ok = not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])
        if both_z:
            ok = ok and not (a[5] < b[4] or b[5] < a[4])
        return ok
    if op == "~=":
        ok = a[:4] == b[:4]
        if both_z:
            ok = ok and a[4] == b[4] and a[5] == b[5]
        return ok
    raise ValueError(op)


def _sql_prefilter(fn: str, first, second, param) -> bool:
    """True when the SQL wrapper's stbox prefilter passes (operands in
    SQL-argument order)."""
    if fn == "dwithin":
        d = float(param)
        if isinstance(first, Temporal):
            return _sbox_cmp("&&", _sbox(first), _sbox(second, d))
        return _sbox_cmp("&&", _sbox(first, d), _sbox(second))
    op = _PREFILTER_OP.get(fn)
    if op is None:
        return True
    return _sbox_cmp(op, _sbox(first), _sbox(second))


def _validate_pair_tt(a: Temporal, b: Temporal) -> None:
    if a.srid != b.srid:
        raise ValueError("The temporal points must be in the same SRID")
    if a.dim != b.dim:
        raise ValueError(
            "The temporal points must be of the same dimensionality")


def _validate_pair_tg(tv: Temporal, g: geo.Geometry,
                      g_dim: int | None) -> None:
    if tv.srid != g.srid:
        raise ValueError(
            "The temporal point and the geometry must be in the same SRID")
    if tv.dim != _coord_dim(g, g_dim):
        raise ValueError("The temporal point and the geometry "
                         "must be of the same dimensionality")


def _sync(a: Temporal, b: Temporal):
    from .everops import _sync_pair
    return _sync_pair(a, b)


# ---------------------------------------------------------------------------
# geography covers (PostGIS restricted spherical implementation)
# ---------------------------------------------------------------------------

def _geog_covers_geoms(x: geo.Geometry, y: geo.Geometry) -> bool:
    """geography_covers(X, Y): false whenever Y is multi-part (the
    restricted covered-side rule); X may be any collection
    (decomposed).  Evaluated under the module's documented planar
    (lon, lat) topology convention."""
    if _is_multipart(y):
        return False
    parts = _simple_parts(x)
    if len(parts) > 1:
        return any(_geog_covers_geoms(p, y) for p in parts)
    m = relate_geoms(x, y)
    if m is None:
        return False
    return _eval_matrix("covers", m, _topo_dim(x), _topo_dim(y))


def _geog_rel(fn: str, a, b, param, a_dim, b_dim):
    """Geography subset: covers / coveredby / intersects / dwithin
    (`tpoint_spatialrels.c:144-170` geog_* callbacks)."""
    from .geog import (geog_covers, geog_dwithin, geog_intersects,
                      geog_nad)
    from .geog import INTERSECT_TOL_M
    a_t, b_t = isinstance(a, Temporal), isinstance(b, Temporal)
    if a_t and b_t:
        _validate_pair_tt(a, b)
        got = _sync(a, b)
        if got is None:
            return None
        sa, sb = got
        if fn == "dwithin":
            return geog_dwithin(sa, sb, float(param))
        if fn == "intersects":
            return geog_intersects(sa, sb)
        t1, t2 = _traj(sa), _traj(sb)
        if fn == "covers":
            return _geog_covers_geoms(t1, t2)
        if fn == "coveredby":
            # geog_coveredby(X, Y) = geography_covers(Y, X)
            return _geog_covers_geoms(t2, t1)
        raise ValueError(
            f"spatial relationship {fn!r} not defined for geography")
    tv, g, gdim = (a, b, b_dim) if a_t else (b, a, a_dim)
    # the wrapper's stbox operator validates SRID/dimensionality
    # itself before comparing (`tpoint_boxops.c:537-545`)
    _validate_pair_tg(tv, g, gdim)
    if not g.is_empty and not _sql_prefilter(fn, a, b, param):
        return False
    if g.is_empty:
        return None
    if fn in ("dwithin", "intersects"):
        if g.kind not in _POINTY:
            raise NotImplementedError(
                f"geog {fn}: non-point geography operands not supported")
        pts = [np.asarray(p[0][:tv.dim], dtype=np.float64)
               for p in g.parts]
        if fn == "dwithin":
            return any(geog_dwithin(tv, p, float(param)) for p in pts)
        return any(geog_intersects(tv, p) for p in pts)
    if fn == "covers" and a_t:
        # covers(tgeogpoint, geog) = geography_covers(traj, g):
        # every component point of g lies on the trajectory
        # (spherical 1e-5 m tolerance, `tpoint_spatialrels.c:144-154`)
        if g.kind not in _POINTY:
            raise NotImplementedError(
                "geog covers: non-point geography operands not supported")
        return all(
            geog_nad(tv, np.asarray(p[0], dtype=np.float64))
            < INTERSECT_TOL_M for p in g.parts)
    if fn in ("covers", "coveredby"):
        # covers(geog, tgeogpoint) / coveredby in BOTH orders all
        # reduce to geography_covers(g, traj) — the geo-first
        # coveredby variant is invert=false (`:533-560`)
        return geog_covers(g, tv)
    raise ValueError(
        f"spatial relationship {fn!r} not defined for geography")


def spatial_rel(fn: str, a, b, param=None, *, geodetic: bool = False,
                a_dim: int | None = None, b_dim: int | None = None):
    """Evaluate reference spatial relationship ``fn`` over operands in
    SQL-argument order.  ``a``/``b`` are Temporal or geo.Geometry;
    ``a_dim``/``b_dim`` declare the coordinate dimension of empty
    geometry literals ('Point Z empty' -> 3).  ``param`` is the
    distance for dwithin / the DE-9IM pattern for relate.  Returns
    bool, matrix str (relate without pattern), or None for SQL NULL.
    """
    if geodetic:
        if fn == "relate":
            raise ValueError(
                "relate is not defined for geography operands")
        return _geog_rel(fn, a, b, param, a_dim, b_dim)

    a_t, b_t = isinstance(a, Temporal), isinstance(b, Temporal)

    if fn == "relate":
        from .everops import relate
        if a_t and b_t:
            _validate_pair_tt(a, b)
        else:
            tv, g, gdim = (a, b, b_dim) if a_t else (b, a, a_dim)
            _validate_pair_tg(tv, g, gdim)
        m = relate(a, b)  # trajectory-first matrix for mixed orders
        if param is None:
            return m
        if m is None:
            return None
        # relate-with-pattern is geometry-first on the geo-first
        # variant (`tpoint_spatialrels.c:1351-1372`, invert=true)
        if not a_t:
            m = _transpose(m)
        return matches_pattern(m, str(param))

    if a_t and b_t:
        _validate_pair_tt(a, b)
        got = _sync(a, b)
        if got is None:
            return None
        sa, sb = got
        if fn == "dwithin":
            from .everops import EPSILON
            from .spatial import nearest_approach_distance
            return bool(nearest_approach_distance(sa, sb)
                        <= float(param) + EPSILON)
        t1, t2 = _traj(sa), _traj(sb)
        if fn == "intersects":
            return _st_intersects(t1, t2)
        if fn == "within":
            return _st("contains", t2, t1)
        return _st(fn, t1, t2)

    tv, g, gdim = (a, b, b_dim) if a_t else (b, a, a_dim)
    # the wrapper's stbox operator validates SRID/dimensionality
    # itself before comparing (`tpoint_boxops.c:537-545`)
    _validate_pair_tg(tv, g, gdim)
    if not g.is_empty and not _sql_prefilter(fn, a, b, param):
        return False
    if g.is_empty:
        return None
    if fn == "dwithin":
        from .everops import dwithin
        return dwithin(tv, g, float(param))
    t = _traj(tv)
    if fn == "intersects":
        return _st_intersects(t, g)
    if fn == "coveredby":
        # both argument orders evaluate coveredby(trajectory, geo)
        return _st("coveredby", t, g)
    if fn == "within":
        # geom_within(g1, g2) = ST_Contains(g2, g1)
        return _st("contains", t, g) if not a_t else _st("contains", g, t)
    if a_t:
        return _st(fn, t, g)
    return _st(fn, g, t)


# ---------------------------------------------------------------------------
# temporal spatial relationships (68_tpoint_tempspatialrels)
# ---------------------------------------------------------------------------

TEMP_SPATIAL_RELS = ("tcontains", "tcovers", "tcoveredby", "tdisjoint",
                     "tequals", "tintersects", "ttouches", "twithin",
                     "tdwithin", "trelate")


def _tdwithin_spherical_instants(sa: Temporal, sb, d_m: float):
    """Per-instant spherical dwithin profile for INST/ISET geography
    operands (haversine meters; `tpoint_spatialrels.c:163-170`)."""
    from . import geo as _geo
    from .spatial import _tbool_from_periods
    from .types import Period
    true_ps = []
    for s in sa.seqs:
        for k, t in enumerate(s.times):
            pa = s.values[k]
            pb = sb.value_at(int(t)) if isinstance(sb, Temporal) else sb
            d = float(_geo.haversine_m(
                np.array([pa[0]]), np.array([pa[1]]),
                np.array([pb[0]]), np.array([pb[1]]))[0])
            if d <= d_m:
                true_ps.append(Period(int(t), int(t)))
    return _tbool_from_periods(sa, true_ps)


def temp_spatial_rel(fn: str, a, b, param=None, *, geodetic: bool = False,
                     a_dim: int | None = None, b_dim: int | None = None):
    """Temporal spatial relationship ``fn`` -> tbool / ttext Temporal
    (`point/src/tpoint_tempspatialrels.c:1456-2290`), operands in
    SQL-argument order.

    The per-instant predicate of a moving POINT against a point
    geometry degenerates for every containment-family relationship
    (tcontains / tcovers / tcoveredby / twithin / tequals /
    tintersects, both operand orders) to the position-equality
    profile; ttouches is constantly false (points have no boundary)
    and tdisjoint is the negated equality profile.  Line/polygon
    geometry operands route to the at_geometry / boundary-period
    kernels (spatial.tintersects, everops.ttouches/tcontains/
    tcovers).  tdwithin solves the planar quadratic crossing in
    coordinate units for geographies too — replicating the
    reference, whose tdwithin_tpointseq_tpointseq turning-point
    machinery is planar regardless of base type
    (`tpoint_tempspatialrels.c:952-1098`; golden fractional
    crossings 68_…out tdwithin geography block)."""
    from .everops import _sync_pair, tcontains, tcovers, tdisjoint, tequals, ttouches
    from .lifting import lift_comparison, tnot
    from .spatial import tdwithin, tintersects, trelate

    res = _temp_spatial_rel(fn, a, b, param, geodetic, a_dim, b_dim)
    # a tbool/ttext result carries no SRID (reference temporal_out)
    if isinstance(res, Temporal):
        res.srid = 0
    return res


def _temp_spatial_rel(fn, a, b, param, geodetic, a_dim, b_dim):
    from .everops import _sync_pair, tcontains, tcovers, tdisjoint, tequals, ttouches
    from .lifting import lift_comparison, tnot
    from .spatial import tdwithin, tintersects, trelate

    a_t, b_t = isinstance(a, Temporal), isinstance(b, Temporal)

    if a_t and b_t:
        _validate_pair_tt(a, b)
        if fn == "tdwithin" and not geodetic:
            return tdwithin(a, b, float(param))
        if fn == "trelate":
            return trelate(a, b, None if param is None else str(param))
        got = _sync_pair(a, b)
        if got is None:
            return None
        sa, sb = got
        if fn == "tdwithin":
            # geography: INST/ISET durations evaluate the per-instant
            # SPHERICAL geog_dwithin; SEQ/SS durations run the PLANAR
            # quadratic machinery (reference dispatch
            # `tpoint_tempspatialrels.c:2100-2180` routes only
            # instant durations through spatialrel3 with geog_dwithin)
            from .types import INSTANT, INSTANTSET
            if sa.duration in (INSTANT, INSTANTSET):
                return _tdwithin_spherical_instants(sa, sb, float(param))
            return tdwithin(a, b, float(param))
        eq = lift_comparison("eq", sa, sb)
        if eq is None:
            return None
        if fn == "ttouches":
            # two moving points never touch (no boundary): all-false
            # with the synchronized result's duration/shape
            from .lifting import tand
            return tand(eq, tnot(eq))
        if fn == "tdisjoint":
            return tnot(eq)
        # tcontains/tcovers/tcoveredby/twithin/tequals/tintersects of
        # two moving points: the equality profile
        return eq

    tv, g, gdim = (a, b, b_dim) if a_t else (b, a, a_dim)
    _validate_pair_tg(tv, g, gdim)
    if g.is_empty:
        return None
    if fn == "tdwithin":
        if g.kind not in _POINTY:
            raise NotImplementedError(
                "tdwithin: non-point geometry operands not supported")
        pt = np.asarray(g.parts[0][0][:tv.dim], dtype=np.float64)
        from .types import INSTANT, INSTANTSET
        if geodetic and tv.duration in (INSTANT, INSTANTSET):
            return _tdwithin_spherical_instants(tv, pt, float(param))
        if geodetic and tv.dim == 3:
            # the reference converts geography→geometry and clips
            # against the planar 2D buffer even for 3D operands
            # (`tpoint_tempspatialrels.c:836-845` via
            # tdwithin_tpointseq_geo, which ignores Z): golden 68
            # expects the 2D answer for 3D geography tdwithin
            from .types import Seq as _Seq
            tv = Temporal(tv.duration,
                          [_Seq(s.times.copy(), s.values[:, :2].copy(),
                                s.lower_inc, s.upper_inc)
                           for s in tv.seqs], tv.linear, tv.srid)
            pt = pt[:2]
        return tdwithin(tv, pt, float(param))
    if fn == "trelate":
        return trelate(a, b, None if param is None else str(param))
    if g.kind in _POINTY:
        if fn == "ttouches":
            return ttouches(tv, g)
        # a moving point vs a point geometry: every containment-family
        # relationship (and tintersects) is the position-equality
        # profile; tdisjoint its negation
        eq = tequals(tv, np.asarray(g.parts[0][0][:tv.dim],
                                    dtype=np.float64))
        if fn == "tdisjoint":
            return None if eq is None else tnot(eq)
        return eq
    if fn == "tintersects":
        return tintersects(tv, g)
    if fn == "tdisjoint":
        return tdisjoint(tv, g)
    if fn == "ttouches":
        return ttouches(tv, g)
    if fn == "tcontains" and not a_t:
        return tcontains(g, tv)
    if fn == "tcovers" and not a_t:
        return tcovers(g, tv)
    raise NotImplementedError(
        f"{fn} over {g.kind} geometry in this operand order")
