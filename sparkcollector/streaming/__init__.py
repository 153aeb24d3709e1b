"""Structured Streaming variant of the parse→enrich→route→aggregate
pipeline (the reference's native always-on dataflow mode)."""

from .pipeline import (  # noqa: F401
    conversation_sessions,
    stream_interval_join,
    stream_routed,
    stream_tail_sample,
    stream_transcripts,
    windowed_counts,
    write_stream_sinks,
)
