"""Structured-Streaming tile ingest: pages stream → geotag points →
tile counts per event-time window.

The batch operators reused verbatim (`pipeline.extract_points`,
`tiles.assign_tiles` are plain Column transformations, legal on
streaming DataFrames).  Late data handled with a watermark on
``warc_ts``; state is bounded by (window × tile) keys.

Usage (file source, e.g. a landing directory of crawled parquet):

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing_dir)
    q = (stream_tile_counts(stream)
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start(out_dir))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import pipeline, tiles

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_tile_counts(pages_stream: DataFrame, zoom: int = 8,
                       window: str = "1 hour",
                       watermark: str = "2 hours") -> DataFrame:
    """(window, zoom, tile_x, tile_y, n_points) append-mode aggregate.

    All transformations are the batch engine's own Column expressions;
    the watermark bounds state for late crawl records."""
    pts = pipeline.extract_points(pages_stream)
    tiled = tiles.assign_tiles(pts, zoom=zoom)
    return (tiled
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"),
                     "zoom", "tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .select(F.col("win.start").alias("window_start"),
                    "zoom", "tile_x", "tile_y", "n_points"))
