"""Streaming tile ingest (engine extension — the reference is strictly
batch, SURVEY §2.11; this demonstrates the same operator surface over
Structured Streaming for continuously-arriving crawl data)."""

from .sessionize_stream import stream_sessions  # noqa: F401
from .tagg_stream import stream_temporal_agg  # noqa: F401
from .tile_ingest import stream_tile_counts  # noqa: F401
