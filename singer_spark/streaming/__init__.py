"""Stateful Structured Streaming operators.

The reference has no event-time semantics (its "watermark" is a resume
offset — SURVEY.md §2.7); these are the extended-engine streaming operators
the batch queries twin against: session windows, watermarked tumbling
rollups, and a custom applyInPandasWithState accumulator.
"""

from singer_spark.streaming.stateful import (
    checkpointed_state_fold,
    hourly_rollup_stream,
    read_fold_state,
    running_user_stats,
    source_kl_from_state,
    source_kl_report,
    streaming_debounce,
    streaming_dedup_exact,
    streaming_dedup_ttl,
    streaming_heavy_hitters,
    streaming_interval_join,
    streaming_sessionize,
    streaming_source_kl,
)

__all__ = ["streaming_sessionize", "hourly_rollup_stream", "running_user_stats",
           "streaming_dedup_exact", "streaming_dedup_ttl",
           "streaming_interval_join", "streaming_heavy_hitters",
           "streaming_debounce", "streaming_source_kl",
           "source_kl_from_state", "source_kl_report",
           "checkpointed_state_fold", "read_fold_state"]
