"""Streaming exact deduplication: keep the FIRST occurrence of each
text fingerprint, with watermark-bounded state — the streaming form
of the batch ``dedup.exact_dedup`` pass a crawl-ingest pipeline runs
before anything else.

State is the set of fingerprints seen within the watermark horizon
(`dropDuplicatesWithinWatermark`): a fingerprint older than the
watermark is dropped from state, so memory is bounded by the crawl
rate × horizon, not by corpus size.

Usage:

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing)
    q = (stream_dedup(stream)
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start(out_dir))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tile_ingest import PAGES_SCHEMA  # noqa: F401  (re-export)


def stream_dedup(pages_stream: DataFrame, watermark: str = "2 hours",
                 ts: str = "warc_ts", text: str = "text") -> DataFrame:
    """(url, warc_ts, fp, text) — first occurrence per text
    fingerprint within the watermark horizon."""
    fp = pages_stream.select(
        "url", F.col(ts), F.md5(F.col(text)).alias("fp"), F.col(text))
    return (fp.withWatermark(ts, watermark)
            .dropDuplicatesWithinWatermark(["fp"]))
