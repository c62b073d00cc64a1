"""Structured Streaming execution paths."""

from syncmaven_spark.streaming.incremental import (  # noqa: F401
    compact_state,
    dedup_within_watermark,
    prepare_decontamination_state,
    read_pairs,
    run_streaming_decontamination_sync,
    run_streaming_near_dup_sync,
    run_streaming_sync,
    windowed_event_counts,
)
