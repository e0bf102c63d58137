"""Struct codec + accessor expression tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobilitydb_spark import fixtures, structcodec
from mobilitydb_spark import types as T


@pytest.fixture(scope="module")
def traj(spark):
    pages = fixtures.pages(spark, 150)
    df = structcodec.trajectories(pages).cache()
    df.count()
    return df


def test_roundtrip_through_struct(spark, traj):
    rows = traj.limit(20).collect()
    for r in rows:
        tv = structcodec.from_row(r["tpoint"])
        back = structcodec.to_row(tv)
        tv2 = structcodec.from_row(back)
        assert str(tv) == str(tv2)
        assert tv.duration == r["tpoint"]["duration"]


def test_duration_mix(traj):
    mix = dict(traj.select(
        structcodec.duration_name(F.col("tpoint")).alias("d"))
        .groupBy("d").count().collect())
    # 1:2:4:3 hash mix — all four classes should appear
    assert set(mix) == {"Instant", "InstantSet", "Sequence", "SequenceSet"}


def test_accessor_expressions_match_python(spark, traj):
    got = traj.select(
        "key",
        structcodec.num_instants(F.col("tpoint")).alias("ni"),
        structcodec.num_sequences(F.col("tpoint")).alias("ns"),
        structcodec.start_timestamp(F.col("tpoint")).alias("st"),
        structcodec.end_value(F.col("tpoint")).alias("ev"),
        structcodec.stbox(F.col("tpoint")).alias("box"),
        "tpoint").limit(30).collect()
    for r in got:
        tv = structcodec.from_row(r["tpoint"])
        assert r["ni"] == tv.num_instants()
        assert r["ns"] == tv.num_sequences()
        st_us = np.datetime64(r["st"], "us").astype(np.int64)
        assert st_us == tv.start_timestamp()
        np.testing.assert_allclose(
            [r["ev"]["x"], r["ev"]["y"]], tv.end_value())
        assert r["box"]["xmin"] == float(tv.values[:, 0].min())
        assert r["box"]["ymax"] == float(tv.values[:, 1].max())


def test_explode_instants_count(traj):
    exploded = structcodec.explode_instants(traj)
    total = exploded.count()
    ni = traj.select(structcodec.num_instants(F.col("tpoint")).alias("n")) \
        .agg(F.sum("n")).first()[0]
    assert total == ni


def test_accessors_are_jvm_side(traj):
    plan = traj.select(
        structcodec.num_instants(F.col("tpoint")).alias("ni"),
        structcodec.stbox(F.col("tpoint")).alias("b")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
