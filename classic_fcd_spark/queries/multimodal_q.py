"""Multimodal inventory entries: binary-column feature extraction through
real mapInPandas plumbing, oracle-checked (the fake decode is md5-based,
so DuckDB can reproduce it exactly in SQL).
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
           md5(text) AS sig
    FROM documents
    """,
    doc="Multimodal plumbing: binary content column → mapInPandas (Arrow "
    "batches) feature extraction; decode is a deterministic md5 fake "
    "(container has no codecs — NotImplementedError otherwise), so the "
    "oracle reproduces it in SQL. Metadata-only queries never scan bytes "
    "(parquet column pruning).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media_from_documents(spark, sf_dir)
    feats = extract_features(media)
    # features (array<float>) feed the similarity operators; the graded
    # projection keeps hashable scalar columns only
    return feats.select("media_id", "kind", "n_bytes", "sig")


@register(
    "video_frame_sample_plan",
    """
    SELECT doc_id AS media_id,
           unnest(range(0, GREATEST(n_chars * 100, 1), 1000)) AS frame_offset_ms
    FROM documents
    WHERE (doc_id % 3) = 2
    """,
    doc="Multimodal frame-sampling plan: sequence+explode of frame "
    "offsets per video (1 fps) — pure Column algebra ahead of the codec "
    "boundary; at 100 TB the explode happens before decode so frames "
    "parallelize across executors.",
)
def video_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media_from_documents(spark, sf_dir)
    return frame_sample_offsets(media, every_ms=1000)
