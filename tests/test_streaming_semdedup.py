"""Streaming incremental SemDeDup (streaming/semantic_dedup.py):
batch/stream duality against incremental_semantic_pairs, restart
idempotency, and the growing-index contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

CENT_N = 8
EPS = 0.55


def _centroids(spark):
    from classic_fcd_spark.session import load_tables

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    return [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < CENT_N).orderBy("vec_id").collect()
    ]


class TestStreamingSemanticDedup:
    def test_stream_matches_batch_cross_split_pairs(self, spark, tmp_path):
        """Draining the corpus as two file drops must emit exactly the
        (drop2 x drop1) subset of the batch operator's pair graph —
        intra-drop pairs are invisible by construction on both paths."""
        from classic_fcd_spark.operators.similarity import (
            assign_cells,
            incremental_semantic_pairs,
        )
        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.streaming.semantic_dedup import (
            run_streaming_semantic_dedup_available_now,
        )

        emb = load_tables(spark, SF_SMALL)["embeddings"].select(
            "vec_id", "embedding"
        )
        cents = _centroids(spark)
        split = emb.agg(F.expr("max(vec_id) div 2")).collect()[0][0]
        emb_dir = str(tmp_path / "emb")
        old = emb.filter(F.col("vec_id") < split)
        new = emb.filter(F.col("vec_id") >= split)
        old.coalesce(1).write.parquet(emb_dir)
        new.coalesce(1).write.mode("append").parquet(emb_dir)

        got = {
            (r["new_id"], r["dup_of"]): r["cos_e6"]
            for r in run_streaming_semantic_dedup_available_now(
                spark, emb_dir, str(tmp_path / "idx"), str(tmp_path / "ckpt"),
                cents, eps=EPS,
            )
        }
        index = assign_cells(old, cents)
        expected = {
            (r["new_id"], r["dup_of"]): r["cos_e6"]
            for r in incremental_semantic_pairs(new, index, cents, eps=EPS).collect()
        }
        assert got == expected
        assert len(got) > 0

    def test_restart_emits_nothing_and_index_is_idempotent(self, spark, tmp_path):
        """A second availableNow run on the same checkpoint must emit no
        pairs and leave the index row-for-row identical (the batch_pt
        partition overwrite discipline)."""
        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.streaming.semantic_dedup import (
            run_streaming_semantic_dedup_available_now,
        )

        emb = load_tables(spark, SF_SMALL)["embeddings"].select(
            "vec_id", "embedding"
        )
        cents = _centroids(spark)
        emb_dir = str(tmp_path / "emb")
        split = emb.agg(F.expr("max(vec_id) div 2")).collect()[0][0]
        emb.filter(F.col("vec_id") < split).coalesce(1).write.parquet(emb_dir)
        emb.filter(F.col("vec_id") >= split).coalesce(1).write.mode(
            "append"
        ).parquet(emb_dir)
        idx_dir = str(tmp_path / "idx")
        ckpt = str(tmp_path / "ckpt")

        first = run_streaming_semantic_dedup_available_now(
            spark, emb_dir, idx_dir, ckpt, cents, eps=EPS
        )
        rows_before = spark.read.parquet(idx_dir).count()
        second = run_streaming_semantic_dedup_available_now(
            spark, emb_dir, idx_dir, ckpt, cents, eps=EPS
        )
        assert second == []
        assert spark.read.parquet(idx_dir).count() == rows_before
        # the index covers the whole corpus after the drain
        assert rows_before == emb.count()
        assert len(first) > 0
