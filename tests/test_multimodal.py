"""Multimodal plumbing tests: schema, Arrow batch shape, stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from classic_fcd_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    decode_stub,
    extract_features,
    frame_sample_offsets,
    synthetic_media_from_documents,
)
from tests.conftest import SF_SMALL


class TestDecodeStub:
    def test_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            decode_stub(b"bytes", "image")

    def test_fake_is_deterministic(self):
        a = decode_stub(b"bytes", "image", deterministic_fake=True)
        b = decode_stub(b"bytes", "image", deterministic_fake=True)
        assert a == b and set(a) == {"luma_mean", "luma_std", "entropy"}


class TestMediaPipeline:
    def test_features_schema_and_dim(self, spark):
        media = synthetic_media_from_documents(spark, SF_SMALL)
        feats = extract_features(media)
        rows = feats.limit(5).collect()
        assert rows and all(len(r["features"]) == FEATURE_DIM for r in rows)
        assert all(0.0 <= x <= 1.0 for r in rows for x in r["features"])

    def test_metadata_query_prunes_content(self, spark, tmp_path):
        # write media to parquet, query metadata only, assert the scan's
        # ReadSchema excludes the heavy binary column (column pruning)
        media = synthetic_media_from_documents(spark, SF_SMALL)
        path = str(tmp_path / "media")
        media.write.parquet(path)
        q = spark.read.parquet(path).filter(F.col("kind") == "video").select(
            "media_id", "meta.duration_ms"
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan

    def test_frame_sampling(self, spark):
        media = synthetic_media_from_documents(spark, SF_SMALL)
        frames = frame_sample_offsets(media, every_ms=1000)
        one = (
            frames.groupBy("media_id")
            .agg(F.count("*").alias("n"), F.max("frame_offset_ms").alias("mx"))
            .join(media.filter(F.col("kind") == "video"), "media_id")
            .select("n", "mx", "meta.duration_ms")
            .limit(10)
            .collect()
        )
        assert one
        for r in one:
            assert r["mx"] < r["duration_ms"]
            assert r["n"] == (r["duration_ms"] + 999) // 1000


class TestResize:
    def test_resize_rewrites_images_only(self, spark):
        from classic_fcd_spark.multimodal.binary_ops import (
            resize_images,
            resize_stub,
            synthetic_media_from_documents,
        )
        from tests.conftest import SF_SMALL

        media = synthetic_media_from_documents(spark, SF_SMALL).limit(30)
        out = resize_images(media, 64, 32).collect()
        src = {r["media_id"]: r for r in media.collect()}
        assert out
        for r in out:
            if r["kind"] == "image":
                # bytes rewritten deterministically, meta pinned to target
                assert bytes(r["content"]) == resize_stub(
                    bytes(src[r["media_id"]]["content"]), 64, 32, True
                )
                assert (r["meta"]["width"], r["meta"]["height"]) == (64, 32)
                assert len(bytes(r["content"])) == (64 * 32) // 64
            else:
                # non-image rows pass through untouched
                assert bytes(r["content"]) == bytes(src[r["media_id"]]["content"])

    def test_resize_stub_raises_without_fake(self):
        import pytest

        from classic_fcd_spark.multimodal.binary_ops import resize_stub

        with pytest.raises(NotImplementedError):
            resize_stub(b"xx", 8, 8, deterministic_fake=False)

    def test_resize_composes(self, spark):
        """Output schema == input schema: chained resizes must run."""
        from classic_fcd_spark.multimodal.binary_ops import (
            resize_images,
            synthetic_media_from_documents,
        )
        from tests.conftest import SF_SMALL

        media = synthetic_media_from_documents(spark, SF_SMALL).limit(10)
        out = resize_images(resize_images(media, 128, 64), 64, 32)
        imgs = [r for r in out.collect() if r["kind"] == "image"]
        assert imgs and all(
            (r["meta"]["width"], r["meta"]["height"]) == (64, 32) for r in imgs
        )
