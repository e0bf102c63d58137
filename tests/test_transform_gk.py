"""Gauss-Krüger transform goldens
(`point/test/expected/56_tpoint_spatialfuncs.test.out:39-45`)."""

import numpy as np
import pytest

from mobilitydb_spark import geo
from mobilitydb_spark.everops import transform_gk, transform_gk_geom
from mobilitydb_spark.types import parse_temporal


def test_gk_instant_golden():
    tv = parse_temporal("Point(13.43593 52.41721)@2018-12-20")
    v = transform_gk(tv).seqs[0].values[0]
    assert v[0] == pytest.approx(3005602.0012352, abs=1e-6)
    assert v[1] == pytest.approx(5835394.36208979, abs=1e-6)


def test_gk_instantset_golden():
    tv = parse_temporal("{Point(13.43593 52.41721)@2018-12-20 10:00:00, "
                        "Point(13.43605 52.41723)@2018-12-20 10:01:00}")
    out = transform_gk(tv)
    v0 = out.seqs[0].values[0]
    v1 = out.seqs[1].values[0]
    assert v0[0] == pytest.approx(3005602.0012352, abs=1e-6)
    assert v1[0] == pytest.approx(3005609.91825264, abs=1e-6)
    assert v1[1] == pytest.approx(5835397.42546224, abs=1e-6)
    # duration class and timestamps are preserved
    assert out.duration == tv.duration
    assert (out.times == tv.times).all()


def test_gk_seq_and_seqset_shapes():
    seq = parse_temporal("[Point(13.43593 52.41721)@2018-12-20 10:00:00, "
                         "Point(13.43605 52.41723)@2018-12-20 10:01:00]")
    out = transform_gk(seq)
    assert out.duration == seq.duration and out.num_instants() == 2
    sset = parse_temporal(
        "{[Point(13.43593 52.41721)@2018-12-20 10:00:00, "
        "Point(13.43605 52.41723)@2018-12-20 10:01:00],"
        "[Point(13.43705 52.41724)@2018-12-20 10:02:00,"
        "Point(13.43805 52.41730)@2018-12-20 10:03:00]}")
    out = transform_gk(sset)
    assert out.num_sequences() == 2


def test_gk_geometry_operand():
    p = geo.from_wkb(geo.point_wkb(13.43593, 52.41721))
    out = transform_gk_geom(p)
    assert out.parts[0][0, 0] == pytest.approx(3005602.0012352, abs=1e-6)
    empty = geo.Geometry("Point", [])
    assert transform_gk_geom(empty).is_empty
    line = geo.Geometry("LineString", [np.array(
        [[13.43593, 52.41721], [13.43605, 52.41723]])])
    lout = transform_gk_geom(line)
    assert lout.parts[0].shape == (2, 2)
    assert lout.parts[0][1, 1] == pytest.approx(5835397.42546224, abs=1e-6)


def test_gk_iteration_terminates_on_nan():
    """ADVICE r2: the Bessel fixed-point loop must not hang when a
    coordinate produces NaN — capped iterations + NaN bail."""
    import numpy as np
    from mobilitydb_spark.everops import _gk_np
    out = _gk_np(np.array([[np.nan, np.nan], [7.5, 51.5]]))
    assert out.shape == (2, 2)
    assert np.isfinite(out[1]).all()


def test_gk_nan_row_does_not_perturb_batch():
    """ADVICE r3 (high): the NaN bail must be per-row — one degenerate
    row in a batch previously froze every other row at its
    iteration-1 value (~678 m northing error at (7.5, 51.5))."""
    import numpy as np
    from mobilitydb_spark.everops import _gk_np
    alone = _gk_np(np.array([[7.5, 51.5], [13.4, 52.52]]))
    batched = _gk_np(np.array([[7.5, 51.5], [np.nan, np.nan],
                               [13.4, 52.52]]))
    assert np.allclose(alone[0], batched[0], atol=1e-6)
    assert np.allclose(alone[1], batched[2], atol=1e-6)
    assert np.isnan(batched[1]).all()
