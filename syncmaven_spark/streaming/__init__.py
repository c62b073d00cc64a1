"""Structured Streaming execution paths."""

from syncmaven_spark.streaming.ann import (  # noqa: F401
    DRIFT_TAIL_EPOCHS,
    prepare_ann_state,
    probe_ann_store,
    read_ann_drift,
    read_ann_store,
    recommend_retrain,
    reindex_ann_state,
    run_streaming_ann_sync,
)
from syncmaven_spark.streaming.incremental import (  # noqa: F401
    compact_state,
    maybe_compact,
    dedup_within_watermark,
    prepare_decontamination_state,
    read_pairs,
    run_streaming_decontamination_sync,
    run_streaming_near_dup_sync,
    run_streaming_sync,
    windowed_event_counts,
)
