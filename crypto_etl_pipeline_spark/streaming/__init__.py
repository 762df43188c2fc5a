"""Structured Streaming surface (SURVEY.md §2.10 extension)."""

from crypto_etl_pipeline_spark.streaming.incremental import (  # noqa: F401
    dedup_stream_within_watermark,
    hourly_rollup_stream,
    read_event_stream,
    run_available_now,
    sessionize_stream,
)
