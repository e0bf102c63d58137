"""Structured-Streaming temporal aggregate: the §2.4 tagg family
(tcount/tmin/tmax/tsum/tavg) over a continuously-arriving instant
stream — the streaming analog of ``spark_temporal.temporal_agg_profile``
(which samples the batch profile at probe instants; here the probe
grid is the event-time window grid).

Engine extension: the reference is strictly batch (SURVEY §2.11).
Late instants are handled by the watermark; state is bounded by the
number of open windows, and every aggregate is map-side-combinable so
the shape survives any input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")


def stream_temporal_agg(events_stream: DataFrame, window: str = "1 hour",
                        watermark: str = "2 hours",
                        t: str = "ts", v: str = "value") -> DataFrame:
    """(window_start, n_def, vmin, vmax, vsum, vavg) per event-time
    window — the same output contract as the batch
    ``temporal_agg_profile`` rollup, computed incrementally."""
    return (events_stream
            .withWatermark(t, watermark)
            .groupBy(F.window(F.col(t), window).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_def"),
                 F.min(v).alias("vmin"), F.max(v).alias("vmax"),
                 F.sum(v).alias("vsum"), F.avg(v).alias("vavg"))
            .select(F.col("win.start").alias("window_start"),
                    "n_def", "vmin", "vmax", "vsum", "vavg"))
