"""Structured Streaming pipelines — SURVEY §2.9 (T1-T7).

The reference's collector is an imperative websocket/poll loop with one
Postgres transaction per block (src/collector/block/block.ts:142-197);
here ingestion is Structured Streaming with event-time windows, a
watermark for late data (T5's trailing-3-day recompute window), and
idempotent MERGE in foreachBatch (T1's exactly-once commit semantics,
keyed on the natural key, replayable from the checkpoint — T2).
"""

from classic_fcd_spark.streaming.minute_pipeline import (  # noqa: F401
    merge_upsert,
    minute_rollup_stream,
    run_minute_rollup_available_now,
)
