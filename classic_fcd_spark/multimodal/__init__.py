"""Multimodal column support — image/audio/video as opaque binary columns.

Brief §extensions: media travels as `binary` + typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (mapInPandas) so the heavy bytes never leave the executor and
never materialize as Python row objects.

The actual codec step is STUBBED (this container ships no image/audio
libraries): `decode_stub` raises NotImplementedError unless
`deterministic_fake=True`, in which case it derives stable pseudo-content
from the md5 of the bytes — making the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) fully real and testable.
"""

from classic_fcd_spark.multimodal.binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_stub,
    extract_features,
    frame_sample_offsets,
    synthetic_media_from_documents,
)
