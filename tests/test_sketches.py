"""Sketch-stat error contracts: the approximate answers must sit within
their documented bounds of the exact ones (computed the slow way on the
small corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM

_RSD = 0.02


class TestSketchStats:
    def _exact(self, spark):
        from classic_fcd_spark.operators.dedup import ws_tokens
        from classic_fcd_spark.session import load_tables

        docs = load_tables(spark, SF_MEDIUM)["documents"]
        fp = F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens("text"))))
        )
        rows = (
            docs.select(
                "source", fp.alias("fp"), F.size(ws_tokens("text")).alias("n")
            )
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.countDistinct("fp").alias("exact_distinct"),
                F.sort_array(F.collect_list("n")).alias("lens"),
            )
            .collect()
        )
        return {r["source"]: r for r in rows}

    def test_hll_within_3_rsd_and_quantiles_within_rank_error(self, spark):
        from classic_fcd_spark.operators.sketches import source_sketch_stats
        from classic_fcd_spark.session import load_tables

        docs = load_tables(spark, SF_MEDIUM)["documents"]
        got = {
            r["source"]: r
            for r in source_sketch_stats(docs, rsd=_RSD).collect()
        }
        exact = self._exact(spark)
        assert set(got) == set(exact)
        for src, e in exact.items():
            g = got[src]
            assert g["n_docs"] == e["n_docs"]
            # HLL++: relative error within 3 standard deviations
            assert (
                abs(g["approx_distinct_docs"] - e["exact_distinct"])
                <= max(3, 3 * _RSD * e["exact_distinct"])
            ), (src, g["approx_distinct_docs"], e["exact_distinct"])
            # percentile_approx: rank error <= 1/accuracy => with
            # accuracy=1000 and n<<1000 per group the answer must be an
            # element at a rank within 1 of the exact percentile rank
            lens = e["lens"]
            n = len(lens)
            for q, col in ((0.5, "p50_tokens"), (0.95, "p95_tokens"), (0.99, "p99_tokens")):
                import math

                rank = min(n - 1, max(0, math.ceil(q * n) - 1))
                lo = lens[max(0, rank - 1)]
                hi = lens[min(n - 1, rank + 1)]
                assert lo <= g[col] <= hi, (src, col, g[col], lo, hi)

    def test_single_aggregation_no_extra_pass(self, spark):
        """The whole summary must be ONE aggregation over ONE scan —
        sketches exist so the dashboard costs a single pass."""
        from classic_fcd_spark.operators.sketches import source_sketch_stats
        from classic_fcd_spark.session import load_tables

        docs = load_tables(spark, SF_MEDIUM)["documents"]
        plan = (
            source_sketch_stats(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("FileScan") <= 1
        assert "Exchange" in plan  # exactly the one group-key shuffle
        assert plan.count("Exchange hashpartitioning") == 1
