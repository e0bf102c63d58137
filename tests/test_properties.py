"""Property-based invariants (hypothesis) for the restriction /
timeops / aggregation kernels — the reference's algebraic laws that
must hold for ANY input, not just goldens:

- at_period + minus_period partition the domain (exact µs)
- at_range + minus_range partition the domain
- timeops inclusion-exclusion: |A∩B| + |A−B| = |A|,
  |A∪B| = |A| + |B| − |A∩B|
- tagg("count") sampled at any instant equals the number of members
  defined there
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from mobilitydb_spark import restrict as R
from mobilitydb_spark import timeops
from mobilitydb_spark.aggs import tagg, _values_at_many
from mobilitydb_spark.types import Period, Temporal

HOUR = 3_600_000_000
BASE = 1_704_067_200_000_000  # 2024-01-01


def _mk_seq(times, values):
    t = np.array(sorted(set(times)), dtype=np.int64)
    v = np.asarray(values[: len(t)], dtype=np.float64)[:, None]
    return Temporal.sequence(t, v)


times_strategy = st.lists(
    st.integers(0, 500).map(lambda h: BASE + h * HOUR),
    min_size=2, max_size=12, unique=True)
values_strategy = st.lists(
    st.floats(0.0, 100.0, allow_nan=False, width=32),
    min_size=12, max_size=12)


def _total_us(tv):
    if tv is None:
        return 0
    return sum(p.upper - p.lower for p in tv.get_time())


@settings(max_examples=40, deadline=None)
@given(times_strategy, values_strategy,
       st.integers(0, 500), st.integers(1, 200))
def test_at_minus_period_partition(times, values, start_h, len_h):
    tv = _mk_seq(times, values)
    p = Period(BASE + start_h * HOUR, BASE + (start_h + len_h) * HOUR,
               True, True)
    at = R.at_period(tv, p)
    mi = R.minus_period(tv, p)
    assert _total_us(at) + _total_us(mi) == tv.duration_us()
    # value agreement on whichever side contains a probe
    probe = int((tv.start_timestamp() + tv.end_timestamp()) // 2)
    v = tv.value_at(probe)
    side = at if p.contains_ts(probe) else mi
    if v is not None and side is not None:
        sv = side.value_at(probe)
        if sv is not None:
            assert abs(float(sv[0]) - float(v[0])) < 1e-9


@settings(max_examples=40, deadline=None)
@given(times_strategy, values_strategy,
       st.floats(0.0, 90.0, allow_nan=False),
       st.floats(1.0, 50.0, allow_nan=False))
def test_at_minus_range_partition(times, values, lo, width):
    tv = _mk_seq(times, values)
    hi = lo + width
    at = R.at_range(tv, lo, hi)
    mi = R.minus_range(tv, lo, hi)
    # µs partition holds to the µs-rounded crossing boundary (each
    # crossing is rounded once on each side, so totals are exact)
    assert _total_us(at) + _total_us(mi) == tv.duration_us()


def _ps(windows):
    return [Period(BASE + a * HOUR, BASE + b * HOUR, True, False)
            for a, b in windows]


def _us(ps):
    return sum(p.upper - p.lower for p in ps)


wins_strategy = st.lists(
    st.tuples(st.integers(0, 400), st.integers(1, 60))
    .map(lambda ab: (ab[0], ab[0] + ab[1])),
    min_size=1, max_size=6)


@settings(max_examples=60, deadline=None)
@given(wins_strategy, wins_strategy)
def test_timeops_inclusion_exclusion(wa, wb):
    A, B = _ps(wa), _ps(wb)
    nA = timeops.union(A, [])
    inter = timeops.intersection(A, B)
    minus = timeops.minus(A, B)
    union = timeops.union(A, B)
    assert _us(inter) + _us(minus) == _us(nA)
    assert _us(union) == _us(nA) + _us(timeops.union(B, [])) - _us(inter)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(times_strategy, values_strategy),
                min_size=1, max_size=5),
       st.integers(0, 500))
def test_tagg_count_matches_membership(members_raw, probe_h):
    members = [_mk_seq(t, v) for t, v in members_raw]
    cnt = tagg(members, "count")
    probe = np.array([BASE + probe_h * HOUR], dtype=np.int64)
    vals, mask = _values_at_many(cnt, probe)
    n_def = sum(1 for m in members
                if m.start_timestamp() <= probe[0] <= m.end_timestamp())
    if n_def == 0:
        assert not mask[0]
    else:
        assert mask[0] and int(vals[0, 0]) == n_def
