"""More property-based invariants (hypothesis): algebraic laws of the
codec, lifted arithmetic, cell index, and box families that must hold
for ANY input — complements tests/test_properties.py.

- EWKB codec: from_ewkb(as_ewkb(T)) is identical (text form, flags,
  total order, hash)
- lifted + − ×: sampled at any input knot, equals the scalar op of the
  operands' exact values there (turning points never disturb knots)
- (a − b) + b == a at the knots of the common domain
- cells: coarsening commutes (cell at parent res == parent of cell at
  finer res); a point lies inside its own cell's bounds; grid_disk
  always contains the center cell
- STBox: expand ⊇ original, @> implies &&, && is symmetric, @>/<@
  duality
- temporal_cmp is antisymmetric and cmp==0 implies hash equality
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from mobilitydb_spark import cells
from mobilitydb_spark.boxops import STBox, contained, contains, overlaps
from mobilitydb_spark.everops import temporal_cmp, temporal_hash
from mobilitydb_spark.lifting import tadd, tmult, tsub
from mobilitydb_spark.mfjson import as_ewkb, from_ewkb
from mobilitydb_spark.types import Temporal

HOUR = 3_600_000_000
BASE = 1_704_067_200_000_000  # 2024-01-01

times_strategy = st.lists(
    st.integers(0, 500).map(lambda h: BASE + h * HOUR),
    min_size=2, max_size=10, unique=True)
vals_strategy = st.lists(
    st.floats(-100.0, 100.0, allow_nan=False, width=32),
    min_size=10, max_size=10)


def _mk(times, values, dim=1, linear=True, srid=0):
    t = np.array(sorted(set(times)), dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)[: len(t) * dim]
    v = v.reshape(len(t), dim)
    return Temporal.sequence(t, v, srid=srid, linear=linear)


# ---------------------------------------------------------------------------
# EWKB codec roundtrip
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(times_strategy,
       st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32),
                min_size=30, max_size=30),
       st.integers(1, 3), st.booleans(),
       st.sampled_from([0, 4326, 3857]), st.booleans())
def test_ewkb_roundtrip_identity(times, values, dim, linear, srid,
                                 as_bool):
    tv = _mk(times, values, dim=dim, linear=linear, srid=srid)
    if as_bool and dim == 1:
        # a plausible tbool: step, 0/1 values
        tv = _mk(times, [float(v > 0) for v in values], dim=1,
                 linear=False, srid=0)
        tv.is_bool = True
    back = from_ewkb(as_ewkb(tv))
    assert str(back) == str(tv)
    assert (back.duration, back.linear, back.srid,
            back.step_default, back.is_bool) == \
           (tv.duration, tv.linear, tv.srid,
            tv.step_default, tv.is_bool)
    assert temporal_cmp(back, tv) == 0
    assert temporal_hash(back) == temporal_hash(tv)


# ---------------------------------------------------------------------------
# Lifted arithmetic sampled at knots
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(times_strategy, vals_strategy, times_strategy, vals_strategy)
def test_arith_exact_at_knots(ta, va, tb, vb):
    a, b = _mk(ta, va), _mk(tb, vb)
    for op, f in ((tadd, lambda x, y: x + y),
                  (tsub, lambda x, y: x - y),
                  (tmult, lambda x, y: x * y)):
        out = op(a, b)
        if out is None:  # disjoint domains
            continue
        for t in sorted(set(ta) | set(tb)):
            xa, xb, xo = a.value_at(t), b.value_at(t), out.value_at(t)
            if xa is None or xb is None:
                continue
            assert xo is not None
            want = f(float(xa[0]), float(xb[0]))
            # knot values survive the sequence normalization only to
            # EPSILON (collinear middle knots within EPSILON are
            # dropped, `temporalinstarr_normalize`) — the bound is
            # EPSILON-shaped, scaled by the operand magnitude for ×
            mag = max(1.0, abs(float(xa[0])), abs(float(xb[0])))
            assert abs(float(xo[0]) - want) <= 8e-6 * mag + 1e-9 * abs(want)


@settings(max_examples=50, deadline=None)
@given(times_strategy, vals_strategy, times_strategy, vals_strategy)
def test_sub_then_add_restores(ta, va, tb, vb):
    a, b = _mk(ta, va), _mk(tb, vb)
    diff = tsub(a, b)
    if diff is None:
        return
    back = tadd(diff, b)
    assert back is not None
    for t in ta:
        xa, xo = a.value_at(t), back.value_at(t)
        if xo is None or xa is None:
            continue
        # EPSILON-shaped bound: see test_arith_exact_at_knots
        assert abs(float(xo[0]) - float(xa[0])) <= 4e-6 * \
            max(1.0, abs(float(xa[0])))


# ---------------------------------------------------------------------------
# Cell index laws
# ---------------------------------------------------------------------------

lon_strategy = st.lists(st.floats(-179.999, 179.999, allow_nan=False),
                        min_size=1, max_size=32)
lat_strategy = st.lists(st.floats(-89.999, 89.999, allow_nan=False),
                        min_size=32, max_size=32)


@settings(max_examples=60, deadline=None)
@given(lon_strategy, lat_strategy, st.integers(1, 14), st.integers(0, 13))
def test_cell_parent_commutes(lons, lats, res, parent_res):
    if parent_res > res:
        res, parent_res = parent_res, res
    lon = np.asarray(lons)
    lat = np.asarray(lats)[: len(lon)]
    fine = cells.cell_np(lon, lat, res)
    direct = cells.cell_np(lon, lat, parent_res)
    via_parent = cells.cell_parent_np(fine, parent_res)
    assert np.array_equal(direct, via_parent)


@settings(max_examples=60, deadline=None)
@given(lon_strategy, lat_strategy, st.integers(0, 14))
def test_point_inside_own_cell_bounds(lons, lats, res):
    lon = np.asarray(lons)
    lat = np.asarray(lats)[: len(lon)]
    c = cells.cell_np(lon, lat, res)
    lo_x, lo_y, hi_x, hi_y = cells.cell_bounds(c)
    # a point within one float ulp of a cell seam may land on either
    # side (the cover/refine join is exact regardless); allow the seam
    eps = 1e-9
    assert np.all((lon >= lo_x - eps) & (lon <= hi_x + eps))
    assert np.all((lat >= lo_y - eps) & (lat <= hi_y + eps))


@settings(max_examples=40, deadline=None)
@given(lon_strategy, lat_strategy, st.integers(2, 12), st.integers(0, 3))
def test_grid_disk_contains_center(lons, lats, res, k):
    lon = np.asarray(lons)
    lat = np.asarray(lats)[: len(lon)]
    c = cells.cell_np(lon, lat, res)
    disk = cells.grid_disk_np(c, k)
    assert np.all((disk == c[:, None]).any(axis=1))


# ---------------------------------------------------------------------------
# STBox algebra
# ---------------------------------------------------------------------------

box_strategy = st.tuples(
    st.floats(-180, 180, allow_nan=False), st.floats(0, 10, allow_nan=False),
    st.floats(-90, 90, allow_nan=False), st.floats(0, 10, allow_nan=False),
    st.integers(0, 100), st.integers(0, 100)).map(
    lambda t: STBox(t[0], t[0] + t[1], t[2], t[2] + t[3],
                    BASE + t[4] * HOUR, BASE + (t[4] + t[5]) * HOUR))


@settings(max_examples=80, deadline=None)
@given(box_strategy, box_strategy,
       st.floats(0, 5, allow_nan=False), st.integers(0, 10))
def test_stbox_laws(a, b, d, dt_h):
    grown = a.expand(d, dt_h * HOUR)
    assert contains(grown, a)
    assert overlaps(a, b) == overlaps(b, a)
    if contains(a, b):
        assert overlaps(a, b)
        assert contained(b, a)


# ---------------------------------------------------------------------------
# Total order consistency
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(times_strategy, vals_strategy, times_strategy, vals_strategy)
def test_cmp_antisymmetric_hash_consistent(ta, va, tb, vb):
    a, b = _mk(ta, va), _mk(tb, vb)
    assert temporal_cmp(a, b) == -temporal_cmp(b, a)
    assert temporal_cmp(a, a) == 0
    if temporal_cmp(a, b) == 0:
        assert temporal_hash(a) == temporal_hash(b)
