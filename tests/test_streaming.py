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
