"""Streaming inventory entry: the minute rollup executed through
Structured Streaming (availableNow) and MERGE-upserted into a table.

The oracle is the plain batch SQL over the same events — streaming with
watermark + idempotent merge MUST converge to the batch answer (the
reference's own validation model: recompute scripts == collector output,
SURVEY §5).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.streaming.minute_pipeline import (
    run_minute_rollup_available_now,
)


@register(
    "streaming_minute_rollup",
    """
    SELECT strftime(date_trunc('minute', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS minute,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="T1-T3/T5: Structured Streaming 1-minute tumbling window with "
    "10-minute watermark, foreachBatch MERGE keyed (minute, event_type), "
    "availableNow trigger; checked for exact convergence to the batch "
    "aggregate (reference validation model, SURVEY §5). Reference: "
    "src/collector/block/block.ts:142-197 (T1), 168-176 (T3).",
)
def streaming_minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_path = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="fcd_stream_")
    try:
        # file-stream sources need a directory; the driver's tables are
        # single parquet files → stage via symlink (no data copy)
        if os.path.isfile(events_path):
            src_dir = os.path.join(work, "src")
            os.makedirs(src_dir)
            os.symlink(events_path, os.path.join(src_dir, "events.parquet"))
            events_path = src_dir
        out = run_minute_rollup_available_now(
            spark,
            events_path,
            checkpoint_dir=os.path.join(work, "ckpt"),
            out_dir=os.path.join(work, "out"),
        )
        # materialize before the temp dir disappears
        out = spark.createDataFrame(out.collect(), schema=out.schema)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
