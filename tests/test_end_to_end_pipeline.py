"""End-to-end training-data pipeline: one run composing the whole
extension surface — span-cut surgery, quality/lang/repetition filters,
the CCNet perplexity gate, benchmark decontamination, exact + near +
semantic dedup, selection, packing, and the loader-ready shard write —
with global conservation invariants checked at every seam.

This is the "a user of the reference could run their whole pipeline
here" test: every stage is an operator this repo gates individually;
here they run as ONE composition on the driver's synthetic corpus.
"""

from __future__ import annotations

import pytest

# slow tier (r16, VERDICT r15 item 7): full funnel-to-shards e2e — run with --runslow
pytestmark = pytest.mark.slow

import glob
import os

from pyspark.sql import functions as F

from classic_fcd_spark.pipeline.curation import _with_stages, curation_stats
from classic_fcd_spark.session import load_tables
from tests.conftest import SF_SMALL


class TestEndToEndPipeline:
    def _staged(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        model = docs.filter(F.col("source") == "src1")
        bench = docs.filter(F.col("source") == "src0")
        return docs, _with_stages(
            docs,
            0.0,
            ("en", "de", "fr"),
            1,
            None,
            bench=bench,
            cut_spans_min_len=10,
            lm_model_docs=model,
            max_mean_nll_e6=None,  # threshold set below from the data
        )

    def test_full_funnel_to_shards(self, spark, tmp_path):
        from classic_fcd_spark.operators.dedup import ws_tokens
        from classic_fcd_spark.sources.layout import (
            read_training_shards,
            write_training_shards,
        )

        docs, staged = self._staged(spark)
        n_docs = docs.count()

        # 1) the funnel partitions the corpus: every doc lands in
        #    exactly one stage
        stages = staged.groupBy("__stage").count().collect()
        assert sum(r["count"] for r in stages) == n_docs
        by_stage = {r["__stage"]: r["count"] for r in stages}
        assert by_stage.get("kept", 0) > 0
        assert by_stage.get("drop:contaminated", 0) > 0  # src0 overlap fires
        assert (
            by_stage.get("drop:exact_dup", 0) + by_stage.get("drop:near_dup", 0) > 0
        )

        # 2) the span surgery ran FIRST: kept docs' text is the cleaned
        #    text (no doc still contains a >=10-token duplicated span
        #    that the cut would have removed)
        kept = staged.filter(F.col("__stage") == "kept").select(
            "doc_id", "text", "source"
        )
        from classic_fcd_spark.operators.spans import duplicated_spans

        residual = duplicated_spans(kept, k=8).filter(F.col("span_len") >= 10)
        # re-running the cut on cleaned text can reveal NEW >=10 spans
        # only if cutting created fresh duplicate adjacencies — on this
        # corpus the cleaned text must be span-stable
        assert residual.count() == 0

        # 3) shard write: loader files conserve the kept corpus exactly
        out = str(tmp_path / "shards")
        write_training_shards(kept, out, budget=64, bins_per_shard=4)
        back = read_training_shards(spark, out)
        assert back.count() == kept.count()
        kept_tok = kept.select(
            F.sum(F.size(ws_tokens("text"))).alias("t")
        ).collect()[0]["t"]
        shard_tok = back.agg(F.sum("n_tokens")).collect()[0][0]
        assert shard_tok == kept_tok  # token conservation through packing
        for d in glob.glob(os.path.join(out, "source_pt=*", "shard_pt=*")):
            assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1

    def test_perplexity_gate_composes_with_the_rest(self, spark):
        from classic_fcd_spark.operators.lm import unigram_nll_scores

        docs = load_tables(spark, SF_SMALL)["documents"]
        model = docs.filter(F.col("source") == "src1")
        thresh = int(
            unigram_nll_scores(docs, model).approxQuantile(
                "mean_nll_e6", [0.8], 0.0
            )[0]
        )
        stats = {
            r["stage"]: r["n_docs"]
            for r in curation_stats(
                docs,
                0.0,
                ("en", "de", "fr"),
                1,
                None,
                cut_spans_min_len=10,
                lm_model_docs=model,
                max_mean_nll_e6=thresh,
            ).collect()
        }
        assert stats.get("drop:perplexity", 0) > 0
        assert stats.get("kept", 0) > 0
        assert sum(stats.values()) == docs.count()
