"""Structured Streaming operators: event-stream ingest, watermark dedup,
tumbling-window aggregation, foreachBatch upsert sink, streaming corpus
dedup against the durable LSH band store."""

from .corpus_dedup import streaming_corpus_dedup
from .envelope_sink import write_envelope_stream
from .semantic_dedup import streaming_semantic_dedup
from .joins import attribute_purchases_to_clicks, enrich_stream_with_dim
from .ingest import (
    dedup_stream,
    foreach_batch_pipeline,
    read_event_stream,
    upsert_stream_sink,
    windowed_event_counts,
)
from .sessionize import running_counts_stateful, sessionize

__all__ = [
    "attribute_purchases_to_clicks",
    "dedup_stream",
    "enrich_stream_with_dim",
    "streaming_corpus_dedup",
    "streaming_semantic_dedup",
    "write_envelope_stream",
    "foreach_batch_pipeline",
    "read_event_stream",
    "running_counts_stateful",
    "sessionize",
    "upsert_stream_sink",
    "windowed_event_counts",
]
