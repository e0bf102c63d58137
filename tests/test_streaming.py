"""Streaming tile ingest: availableNow run over a parquet landing dir
must equal the batch result on the same data."""

import pytest
from pyspark.sql import functions as F

from mobilitydb_spark import fixtures, pipeline, tiles
from mobilitydb_spark.streaming import stream_tile_counts
from mobilitydb_spark.streaming.tile_ingest import PAGES_SCHEMA


def test_stream_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    fixtures.pages(spark, 300).write.parquet(landing)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing)
    # complete mode: append would withhold windows still inside the
    # watermark at end-of-stream (availableNow never finalizes them)
    q = (stream_tile_counts(stream, zoom=6)
         .writeStream.outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("memory").queryName("tile_counts").start())
    q.awaitTermination(120)

    got = spark.table("tile_counts") \
        .groupBy("zoom", "tile_x", "tile_y") \
        .agg(F.sum("n_points").alias("n")).collect()
    batch = tiles.assign_tiles(
        pipeline.extract_points(spark.read.parquet(landing)), zoom=6) \
        .groupBy("zoom", "tile_x", "tile_y") \
        .agg(F.count(F.lit(1)).alias("n")).collect()
    to_set = lambda rows: {(r["zoom"], r["tile_x"], r["tile_y"], r["n"])
                           for r in rows}
    assert to_set(got) == to_set(batch)
    assert len(got) > 0


def test_stateful_sessionize_stream_consistent_with_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: every emitted CLOSED session
    must exactly match a session computed by the batch gaps-and-islands
    logic over the same data; sessions ending well before the final
    watermark must all have been emitted."""
    import numpy as np
    import pandas as pd
    from mobilitydb_spark.streaming.sessionize_stream import (
        EVENTS_SCHEMA, stream_sessions)

    landing = str(tmp_path / "ev_landing")
    ckpt = str(tmp_path / "ev_ckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two time-ordered files so availableNow runs >= 2 micro-batches
    # and the watermark advances between them (firing timeouts)
    mid = "2024-01-15 00:00:00"
    ev.where(F.col("ts") < mid).coalesce(1).write.parquet(
        landing + "/p1")
    ev.where(F.col("ts") >= mid).coalesce(1).write.parquet(
        landing + "/p2")

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(landing + "/p*"))
    q = (stream_sessions(stream, gap_min=30, watermark="1 hour")
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("memory").queryName("sessions").start())
    q.awaitTermination(180)
    got = spark.table("sessions").toPandas()

    # batch truth: gaps-and-islands per user
    pdf = ev.select("user_id", "ts").toPandas()
    want = {}
    gap = np.timedelta64(30 * 60, "s")
    for uid, g in pdf.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]"))
        start = ts[0]
        prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap:
                want[(uid, start, prev)] = n
                start, n = t, 0
            prev = t
            n += 1
        want[(uid, start, prev)] = n  # final open session

    emitted = {(r.user_id, np.datetime64(r.session_start, "us"),
                np.datetime64(r.session_end, "us")): r.n_events
               for r in got.itertuples(index=False)}
    # every emitted session is a real batch session with the same count
    for key, n in emitted.items():
        assert key in want and want[key] == n, key
    assert len(emitted) > 0
    # sessions that ended before the first file's watermark must have
    # been closed by timeout or gap split
    wm1 = pdf[pdf["ts"] < np.datetime64(mid)]["ts"].max().to_datetime64().astype("datetime64[us]") - np.timedelta64(3600, "s")
    must_emit = {k for k in want
                 if k[2] < wm1 - np.timedelta64(30 * 60, "s")}
    assert must_emit <= set(emitted.keys())


def test_stream_dedup_first_occurrence(spark, tmp_path):
    """Watermarked streaming exact dedup: one row per distinct text
    fingerprint, matching the batch distinct set."""
    landing = str(tmp_path / "dd_landing")
    ckpt = str(tmp_path / "dd_ckpt")
    from mobilitydb_spark.streaming.dedup_stream import stream_dedup
    pages = fixtures.pages(spark, 200)
    # plant duplicates: every page twice under a second url
    dup = pages.withColumn("url", F.concat(F.col("url"), F.lit("#dup")))
    pages.unionByName(dup).write.parquet(landing)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing)
    q = (stream_dedup(stream)
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("memory").queryName("dedup_out").start())
    q.awaitTermination(120)
    got = spark.table("dedup_out").toPandas()
    n_distinct = spark.read.parquet(landing) \
        .select(F.md5("text")).distinct().count()
    assert len(got) == n_distinct
    assert not got.duplicated("fp").any()


def test_stream_temporal_agg_equals_batch(spark, tmp_path):
    """Watermarked windowed tagg over a stream must equal the batch
    window aggregate on the same instants (availableNow, complete
    mode so windows inside the final watermark are not withheld)."""
    from mobilitydb_spark.streaming.tagg_stream import (
        EVENTS_SCHEMA, stream_temporal_agg)

    landing = str(tmp_path / "tagg_landing")
    ckpt = str(tmp_path / "tagg_ckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.coalesce(2).write.parquet(landing)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(landing)
    q = (stream_temporal_agg(stream)
         .writeStream.outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("memory").queryName("tagg_stream").start())
    q.awaitTermination(120)

    def canon(rows):
        return sorted(
            (r["window_start"], r["n_def"], round(r["vmin"], 6),
             round(r["vmax"], 6), round(r["vsum"], 6), round(r["vavg"], 6))
            for r in rows)

    got = canon(spark.table("tagg_stream").collect())
    batch = canon(
        ev.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_def"),
             F.min("value").alias("vmin"), F.max("value").alias("vmax"),
             F.sum("value").alias("vsum"), F.avg("value").alias("vavg"))
        .select(F.col("win.start").alias("window_start"), "n_def",
                "vmin", "vmax", "vsum", "vavg").collect())
    assert got == batch
    assert len(got) > 10
