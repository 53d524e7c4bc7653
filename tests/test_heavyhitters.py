"""Misra-Gries heavy-hitter contracts: exact agreement with the full
groupBy top-k when the completeness bound holds, and the candidate set
staying bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM


class TestHeavyHitters:
    def _bigrams(self, spark):
        from classic_fcd_spark.operators.dedup import word_shingles
        from classic_fcd_spark.session import load_tables

        docs = load_tables(spark, SF_MEDIUM)["documents"]
        return docs.select(
            F.explode(word_shingles("text", 2)).alias("gram")
        )

    def test_matches_exact_topk_when_bound_holds(self, spark):
        from classic_fcd_spark.operators.heavyhitters import approx_top_items

        grams = self._bigrams(spark)
        n = grams.count()
        k, capacity = 20, 1024
        exact = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("gram").asc())
            .limit(k)
            .collect()
        )
        # the small-vocab synthetic corpus makes the k-th count clear
        # N/capacity by orders of magnitude — the regime the operator
        # guarantees exactness in
        assert exact[-1]["cnt"] > n / capacity
        got = approx_top_items(grams, "gram", k=k, capacity=capacity).collect()
        assert [(r["item"], r["cnt"]) for r in got] == [
            (r["gram"], r["cnt"]) for r in exact
        ]

    def test_candidate_set_bounded_by_capacity_times_partitions(self, spark):
        from classic_fcd_spark.operators.heavyhitters import _mg_partition

        grams = self._bigrams(spark)
        capacity = 64
        ex = grams.select(F.col("gram").cast("string").alias("item"))
        cands = ex.mapInPandas(_mg_partition(capacity), "item string")
        per_part = (
            cands.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert all(r["n"] <= capacity for r in per_part)
