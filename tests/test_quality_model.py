"""Hashed linear quality classifier training (operators/quality_model.py):
featurizer/scorer duality, MLlib fidelity, and planted separation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

GOOD = [
    "the measured results confirm the documented hypothesis clearly",
    "we present a careful analysis of the system design",
    "the method generalizes across the evaluated benchmark suites",
    "results are reproducible and the code is documented",
]
BAD = [
    "click here buy now free free free winner winner",
    "cheap deals click subscribe now buy buy buy",
    "winner click free prize now now now subscribe",
    "buy cheap free click here prize deals winner",
]


def _docs(spark, rows, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


class TestQualityModelTraining:
    def test_features_are_mean_pooled_bucket_freqs(self, spark):
        from classic_fcd_spark.functions.text import hashed_bucket_sql
        from classic_fcd_spark.operators.quality_model import hashed_freq_features

        docs = _docs(spark, ["alpha beta alpha", "gamma"])
        feats = {
            r["doc_id"]: r["features"]
            for r in hashed_freq_features(docs, n_buckets=64).collect()
        }
        # independent bucket computation through the scorer's own SQL
        b = {
            t: spark.sql(
                f"SELECT {hashed_bucket_sql(repr(t), 64)} AS b"
            ).collect()[0]["b"]
            for t in ("alpha", "beta", "gamma")
        }
        v0 = feats[0]
        assert abs(v0[int(b["alpha"])] - 2 / 3) < 1e-12
        assert abs(v0[int(b["beta"])] - 1 / 3) < 1e-12
        assert abs(feats[1][int(b["gamma"])] - 1.0) < 1e-12
        # frequencies sum to 1 (mean pooling)
        assert abs(sum(v0.toArray()) - 1.0) < 1e-12

    def test_trained_weights_separate_and_match_scorer(self, spark):
        """The end-to-end contract: train on planted good/bad corpora,
        score with the COLUMN-ALGEBRA scorer using the returned weights
        — good docs score high, bad docs low, and the scorer's sigmoid
        equals the MLlib model's probability on held-in docs."""
        from classic_fcd_spark.functions.text import linear_quality_score
        from classic_fcd_spark.operators.quality_model import (
            hashed_freq_features,
            train_linear_quality,
        )

        pos, neg = _docs(spark, GOOD), _docs(spark, BAD, start=100)
        weights = train_linear_quality(pos, neg, n_buckets=64)
        assert len(weights) == 64

        both = pos.unionByName(neg)
        scores = {
            r["doc_id"]: r["s"]
            for r in both.select(
                "doc_id", linear_quality_score("text", weights).alias("s")
            ).collect()
        }
        for i in range(len(GOOD)):
            assert scores[i] > 0.9, (i, scores[i])
        for i in range(len(BAD)):
            assert scores[100 + i] < 0.1, (i, scores[100 + i])

        # fidelity: sigmoid(<w, features>) == the scorer's output
        feats = {
            r["doc_id"]: r["features"]
            for r in hashed_freq_features(both, n_buckets=64).collect()
        }
        for did, vec in feats.items():
            z = sum(w * v for w, v in zip(weights, vec.toArray()))
            assert abs(1 / (1 + math.exp(-z)) - scores[did]) < 1e-9, did

    def test_unseen_vocab_scores_neutral_band(self, spark):
        from classic_fcd_spark.functions.text import linear_quality_score
        from classic_fcd_spark.operators.quality_model import train_linear_quality

        pos, neg = _docs(spark, GOOD), _docs(spark, BAD, start=100)
        weights = train_linear_quality(pos, neg, n_buckets=64, reg_param=0.1)
        probe = _docs(spark, ["zzzq xxyw qqrs"], start=500)
        s = probe.select(
            linear_quality_score("text", weights).alias("s")
        ).collect()[0]["s"]
        # unseen tokens land in arbitrary buckets: regularization keeps
        # their score away from the saturated extremes
        assert 0.05 < s < 0.95
