"""Multimodal inventory entry: binary-column feature extraction through
real mapInPandas plumbing plus the video frame-sampling plan, in one
oracle-checked query (the fake decode is md5-based, so DuckDB can
reproduce it exactly in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classic_fcd_spark.multimodal.binary_ops import (
    extract_features,
    frame_sample_offsets,
    synthetic_media_from_documents,
)
from classic_fcd_spark.queries.registry import register


@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS sig,
           CASE WHEN (doc_id % 3) = 2
                THEN len(range(0, GREATEST(n_chars * 100, 1), 1000))
                ELSE 0 END AS n_frames
    FROM documents
    """,
    doc="Multimodal plumbing in one pass: binary content column → "
    "mapInPandas (Arrow batches) feature extraction, PLUS the video "
    "frame-sampling plan (sequence+explode of 1-fps offsets, counted "
    "back per media) — the explode happens before decode so frames "
    "parallelize across executors at 100 TB.  Decode is a deterministic "
    "md5 fake (container has no codecs — NotImplementedError otherwise), "
    "so the oracle reproduces it in SQL.  Metadata-only queries never "
    "scan bytes (parquet column pruning).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media_from_documents(spark, sf_dir)
    feats = extract_features(media)
    # frame plan: explode to one row per sampled frame, then count back —
    # keeps the explode (the actual scale path) inside the checked plan
    frames = (
        frame_sample_offsets(media, every_ms=1000)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_frames"))
    )
    # features (array<float>) feed the similarity operators; the graded
    # projection keeps hashable scalar columns only
    return (
        feats.join(frames, "media_id", "left")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "sig",
            F.coalesce("n_frames", F.lit(0)).alias("n_frames"),
        )
    )
