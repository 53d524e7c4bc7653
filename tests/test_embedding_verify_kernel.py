"""embedding_similar_pairs' volume-gated verify (r16, VERDICT r15 item
5): the numpy mapInArrow kernel and the SQL HOF fold must emit
BIT-IDENTICAL (i, j, cos_e6) rows — the gate threshold only moves the
crossover, never the result."""

from __future__ import annotations

import pytest

from classic_fcd_spark.queries import similarity as S
from tests.conftest import SF_MEDIUM, SF_SMALL


def _rows(df):
    return sorted((r["i"], r["j"], r["cos_e6"]) for r in df.collect())


class TestArrowVerifyKernel:
    @pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MEDIUM])
    def test_kernel_arm_equals_fold_arm(self, spark, sf_dir, monkeypatch):
        # fold arm (gate never fires)
        monkeypatch.setattr(S, "_ARROW_VERIFY_MIN_CANDIDATES", 2**62)
        fold = _rows(S.embedding_similar_pairs(spark, sf_dir))
        # kernel arm (gate always fires)
        monkeypatch.setattr(S, "_ARROW_VERIFY_MIN_CANDIDATES", 0)
        kern = _rows(S.embedding_similar_pairs(spark, sf_dir))
        assert fold == kern
        assert len(fold) > 0

    def test_candidate_volume_is_exact(self, spark):
        """The gate statistic must equal the true candidate-row count
        the verify join produces (i < j per (band, signature) bucket)."""
        from pyspark.sql import functions as F

        from classic_fcd_spark.session import (
            _SESSION_MEMO,
            embedding_stats,
            load_tables,
        )

        emb = load_tables(spark, SF_SMALL)["embeddings"]
        bands = F.array(
            *[
                F.struct(
                    F.lit(i).alias("b"),
                    F.expr(S.bucket_sql("embedding", w, "spark")).alias("v"),
                )
                for i, w in enumerate(S._PAIR_BANDS)
            ]
        )
        n, n_distinct, max_m = embedding_stats(spark, SF_SMALL)
        if max_m == 1:
            reps = emb.select("vec_id", "embedding")
        else:
            reps = emb.groupBy("embedding").agg(
                F.min("vec_id").alias("vec_id")
            ).select("vec_id", "embedding")
        got = S._emb_candidate_volume(spark, SF_SMALL, reps, bands)
        tagged = reps.select("vec_id", F.explode(bands).alias("bd")).select(
            "vec_id", F.col("bd.b").alias("b"), F.col("bd.v").alias("v")
        )
        a = tagged.select("b", "v", F.col("vec_id").alias("i"))
        b = tagged.select("b", "v", F.col("vec_id").alias("j"))
        want = (
            a.join(b, ["b", "v"]).filter(F.col("i") < F.col("j")).count()
        )
        assert got == want > 0
