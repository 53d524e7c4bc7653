"""End-to-end corpus curation pipeline (pipeline/curation.py): the
composition of quality/lang/repetition filters, exact + near dedup,
stratified sampling, and packing must behave as a funnel with exactly-one
keeper semantics.
"""

from __future__ import annotations

import pytest

# slow tier (r16, VERDICT r15 item 7): multi-stage funnel pipeline runs — run with --runslow
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from classic_fcd_spark.pipeline.curation import (
    _with_stages,
    curate_corpus,
    curation_stats,
)
from classic_fcd_spark.session import load_tables
from tests.conftest import SF_SMALL


def _docs(spark):
    return load_tables(spark, SF_SMALL)["documents"]


class TestCurationPipeline:
    def test_funnel_partitions_the_corpus(self, spark):
        docs = _docs(spark)
        stats = {r["stage"]: r["n_docs"] for r in curation_stats(docs).collect()}
        assert sum(stats.values()) == docs.count()  # every doc lands somewhere
        assert stats.get("kept", 0) > 0
        # the synthetic corpus plants dup groups -> dedup stages must fire
        assert stats.get("drop:exact_dup", 0) + stats.get("drop:near_dup", 0) > 0

    def test_exact_dups_keep_exactly_one(self, spark):
        docs = _docs(spark)
        staged = _with_stages(docs, 0.0, ("en", "de", "fr"), 1, None)
        from classic_fcd_spark.operators.dedup import ws_tokens

        bow = F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens("text"))))
        )
        kept = staged.filter(F.col("__stage") == "kept").select(
            "doc_id", bow.alias("fp")
        )
        per_fp = kept.groupBy("fp").count().agg(F.max("count")).collect()[0][0]
        assert per_fp == 1  # no fingerprint survives twice

    def test_no_quality_drops_when_threshold_zero(self, spark):
        docs = _docs(spark)
        stats = {
            r["stage"]: r["n_docs"]
            for r in curation_stats(docs, min_quality=0.0).collect()
        }
        assert "drop:quality" not in stats

    def test_packed_output_contract(self, spark):
        docs = _docs(spark)
        packed = curate_corpus(docs, pack_budget=128)
        rows = packed.collect()
        assert rows
        for r in rows:
            assert r["bin_id"] >= 0 and 0 <= r["offset"] < 128
        # packed docs are exactly the kept set
        staged = _with_stages(docs, 0.5, ("en",), 1, None)
        n_kept = staged.filter("__stage = 'kept'").count()
        assert len(rows) == n_kept

    def test_sampling_stage_drops_unlisted_sources(self, spark):
        docs = _docs(spark)
        src = docs.select("source").distinct().collect()[0]["source"]
        stats = {
            r["stage"]: r["n_docs"]
            for r in curation_stats(docs, sample_rates={src: 1.0}).collect()
        }
        assert stats.get("drop:sampled_out", 0) > 0

    def test_decontamination_stage_fires_with_bench_set(self, spark):
        from pyspark.sql import functions as F

        docs = _docs(spark)
        bench = docs.filter(F.col("doc_id") % 20 == 0)
        stats = {
            r["stage"]: r["n_docs"]
            for r in curation_stats(
                docs, min_quality=0.0, keep_langs=("en", "de", "fr"),
                bench=bench, decon_ngram=5,
            ).collect()
        }
        assert stats.get("drop:contaminated", 0) > 0
        assert sum(stats.values()) == docs.count()
        # without a bench set the stage never fires
        no_bench = {
            r["stage"]
            for r in curation_stats(
                docs, min_quality=0.0, keep_langs=("en", "de", "fr")
            ).collect()
        }
        assert "drop:contaminated" not in no_bench

    def test_index_dedup_stage_drops_corpus_duplicates(self, spark):
        """Incremental-ingest shape: a batch containing copies of
        already-ingested docs drops exactly those copies at the
        drop:index_dup stage, before intra-batch dedup."""
        docs = _docs(spark)
        # index = first half of the corpus; batch = second half PLUS
        # re-ingested copies of five indexed docs under fresh ids
        split = 250
        index = docs.filter(F.col("doc_id") < split)
        fresh = docs.filter(F.col("doc_id") >= split)
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        reingested = index.limit(5).withColumn(
            "doc_id", F.col("doc_id") + F.lit(max_id + 1)
        )
        batch = fresh.unionByName(reingested)
        staged = _with_stages(
            batch, 0.0, ("en", "de", "fr", "es", "zh"), 1, None,
            index_docs=index,
        )
        stages = {
            r["doc_id"]: r["__stage"] for r in staged.select("doc_id", "__stage").collect()
        }
        re_ids = [r["doc_id"] for r in reingested.select("doc_id").collect()]
        # every re-ingested copy is an exact (hence near) duplicate of an
        # indexed doc -> must be dropped by the index stage specifically
        for rid in re_ids:
            assert stages[rid] == "drop:index_dup", (rid, stages[rid])
        # and the stage fires ONLY on genuine index near-dups: docs whose
        # text never appeared in the index must not be flagged by it
        # (fresh docs may still drop at other stages)
        fresh_flagged = [
            d for d, s in stages.items() if s == "drop:index_dup" and d not in re_ids
        ]
        # allowed: fresh docs that genuinely near-dup an indexed doc
        # (planted cross-split dups exist in the corpus); verify each via
        # the incremental operator itself rather than assuming none
        if fresh_flagged:
            from classic_fcd_spark.operators.dedup import (
                banded_signatures,
                incremental_near_dups,
                word_shingles,
                ws_tokens,
            )

            sh = lambda df: df.filter(F.size(ws_tokens("text")) >= 3).select(  # noqa: E731
                "doc_id", word_shingles("text").alias("shingles")
            )
            verified = {
                r["new_id"]
                for r in incremental_near_dups(
                    sh(fresh), banded_signatures(sh(index), "doc_id", "shingles"),
                    sh(index), "doc_id", "shingles",
                ).collect()
            }
            assert set(fresh_flagged) <= verified


class TestTrainedQualityStage:
    def test_train_then_gate_drops_planted_junk(self, spark):
        """End-to-end: train the hashed classifier on planted good/bad
        corpora (operators/quality_model), feed the weights into the
        funnel — the junk-vocabulary docs drop as drop:model_quality and
        the clean ones survive that stage."""
        from classic_fcd_spark.operators.quality_model import train_linear_quality

        good = ["the documented analysis presents measured results clearly"] * 4
        bad = ["click buy free winner prize now subscribe cheap"] * 4
        pos = spark.createDataFrame(
            [(i, t) for i, t in enumerate(good)], "doc_id long, text string"
        )
        neg = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(bad)], "doc_id long, text string"
        )
        weights = train_linear_quality(pos, neg, n_buckets=64)

        probe = spark.createDataFrame(
            [
                (0, "the documented analysis presents measured results", "en", "s0", 10),
                (1, "click buy free winner prize now now", "en", "s0", 10),
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        staged = _with_stages(
            probe, 0.0, ("en",), 1, None,
            quality_weights=weights, min_model_quality=0.5,
        )
        stages = {r["doc_id"]: r["__stage"] for r in staged.collect()}
        assert stages[1] == "drop:model_quality"
        assert stages[0] != "drop:model_quality"

    def test_no_weights_means_no_model_stage(self, spark):
        stats = {
            r["stage"]: r["n_docs"]
            for r in curation_stats(_docs(spark)).collect()
        }
        assert "drop:model_quality" not in stats


class TestSemanticStage:
    def test_semantic_stage_drops_paraphrases_keeps_edge_member(self, spark):
        """With embeddings supplied, paraphrase groups (near-identical
        vectors) that survive token-level dedup lose every member except
        the one farthest from its cluster centroid."""
        from pyspark.sql import functions as F

        from classic_fcd_spark.pipeline.curation import curation_stats

        docs = spark.createDataFrame(
            [
                # distinct token content (survives exact/near token dedup)
                # but planted near-identical embeddings for 1, 2
                # long enough that the top-2-gram fraction clears the
                # repetition filter (every 2-gram unique -> 2/n <= 0.2)
                (1, "alpha beta gamma delta epsilon zeta eta theta iota "
                    "kappa lam mu nu xi omicron pi rho sigma tau upsilon", "en", "src0", 35),
                (2, "one two three four five six seven eight nine ten "
                    "eleven twelve thirteen fourteen fifteen sixteen "
                    "seventeen eighteen nineteen twenty", "en", "src0", 33),
                (3, "red orange yellow green blue indigo violet crimson "
                    "maroon teal cyan magenta olive navy coral amber "
                    "ivory jade pearl slate", "en", "src0", 35),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.02, 0.0, 0.0]),
                (2, [1.0, 0.05, 0.0, 0.0]),  # paraphrase of 1, more edge-y
                (3, [0.0, 0.0, 1.0, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
        stats = {
            r["stage"]: r["n_docs"]
            for r in curation_stats(
                docs,
                min_quality=0.0,
                embeddings=emb,
                emb_centroids=cents,
                semantic_eps=0.01,
            ).collect()
        }
        assert stats.get("drop:semantic_dup") == 1
        # and the dropped one is doc 1 (closer to centroid than 2)
        from classic_fcd_spark.pipeline.curation import _with_stages

        staged = _with_stages(
            docs, 0.0, ("en",), 1, None,
            embeddings=emb, emb_centroids=cents, semantic_eps=0.01,
        )
        tags = {r["doc_id"]: r["__stage"] for r in staged.collect()}
        assert tags[1] == "drop:semantic_dup"
        assert tags[2] == "kept"
        assert tags[3] == "kept"


class TestIndexDupKeeperElection:
    def test_index_dup_cannot_drop_its_whole_family(self, spark):
        """r5 regression gate: an index-dup doc must NOT participate in
        intra-batch keeper election.  Before the fix, an index dup
        elected keeper made its non-index-dup sibling lose the election
        (drop:near_dup) while itself being dropped as drop:index_dup —
        the whole family vanished."""
        from classic_fcd_spark.pipeline.curation import _with_stages

        base_text = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon"
        )
        # doc 10 is identical to index doc 1 (an index dup, J=1.0); doc
        # 11 is a SIMHASH near-dup of 10 (hamming=1 over word 3-shingle
        # fingerprints) but NOT an index dup itself (Jaccard 0.5 < 0.8
        # vs index doc 1) — the sibling text was searched offline for
        # exactly this (hamming<=1, J<0.8) regime.  doc 10 < doc 11, so
        # pre-fix it would win the min-id keeper election.
        sibling = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu fern rook opal rho sigma tau echo"
        )
        docs = spark.createDataFrame(
            [
                (10, base_text, "en", "src0", 90),
                (11, sibling, "en", "src0", 90),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        index_docs = spark.createDataFrame(
            [(1, base_text)], "doc_id long, text string"
        )
        staged = _with_stages(
            docs, 0.0, ("en",), 1, None, index_docs=index_docs
        )
        tags = {r["doc_id"]: r["__stage"] for r in staged.collect()}
        assert tags[10] == "drop:index_dup"
        # the sibling must SURVIVE: with 10 out of the election, 11 is
        # its own keeper
        assert tags[11] == "kept", tags


class TestDsirSelectionStage:
    def test_dsir_stage_selects_target_like_docs(self, spark):
        """With dsir_target/dsir_k, the funnel's selection stage becomes
        importance resampling: target-like docs are kept, off-target ones
        fall to drop:sampled_out."""
        from classic_fcd_spark.pipeline.curation import _with_stages

        wiki = (
            "the quick brown fox jumps over the lazy dog near the wide "
            "river bank under a pale morning sky while birds circle slowly"
        )
        spam = (
            "buy now cheap deals click here win prizes free offer act "
            "fast limited stock exclusive discount join today instant savings"
        )
        docs = spark.createDataFrame(
            [(i, wiki + f" tail{i}", "en", "src0", 90) for i in range(6)]
            + [(100 + i, spam + f" tail{i}", "en", "src1", 90) for i in range(6)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        target = spark.createDataFrame(
            [(1000 + i, wiki + f" extra{i}") for i in range(4)],
            "doc_id long, text string",
        )
        staged = _with_stages(
            docs, 0.0, ("en",), 1, None, dsir_target=target, dsir_k=5
        )
        tags = {r["doc_id"]: r["__stage"] for r in staged.collect()}
        kept = [d for d, t in tags.items() if t == "kept"]
        assert len(kept) == 5
        # scores differ by tens of nats; allow the sampler one off-target
        assert len([d for d in kept if d < 100]) >= 4
        # the earlier intra-batch near-dup stage may catch the planted
        # twins first (stage ORDER is the contract); everything else the
        # DSIR stage rejects reads drop:sampled_out
        assert all(
            t in ("kept", "drop:sampled_out", "drop:near_dup")
            for t in tags.values()
        ), tags
        assert any(t == "drop:sampled_out" for t in tags.values()), tags


class TestSpanCutAndPerplexityStages:
    def test_span_cut_shrinks_kept_tokens(self, spark):
        docs = _docs(spark)
        plain = curate_corpus(docs, min_quality=0.0, keep_langs=("en", "de", "fr"))
        cut = curate_corpus(
            docs,
            min_quality=0.0,
            keep_langs=("en", "de", "fr"),
            cut_spans_min_len=10,
        )
        t_plain = plain.agg(F.sum("n_tokens")).collect()[0][0]
        t_cut = cut.agg(F.sum("n_tokens")).collect()[0][0]
        # the synthetic corpus plants long duplicated regions -> the
        # surgery must remove tokens from the packed output
        assert t_cut < t_plain

    def test_span_cut_matches_standalone_operator(self, spark):
        from classic_fcd_spark.operators.spans import remove_duplicated_spans

        docs = _docs(spark)
        staged = _with_stages(
            docs, 0.0, ("en", "de", "fr"), 1, None, cut_spans_min_len=10
        )
        in_funnel = {
            r["doc_id"]: r["text"]
            for r in staged.select("doc_id", "text").collect()
        }
        standalone = {
            r["doc_id"]: r["text_clean"]
            for r in remove_duplicated_spans(docs, k=8, min_span_len=10).collect()
        }
        assert in_funnel == standalone

    def test_perplexity_stage_drops_above_threshold(self, spark):
        from classic_fcd_spark.operators.lm import unigram_nll_scores

        docs = _docs(spark)
        model = docs.filter(F.col("source") == "src0")
        # pick a threshold at the 90th percentile of actual scores so the
        # stage must drop a NONZERO, known set
        scores = unigram_nll_scores(docs, model)
        thresh = scores.approxQuantile("mean_nll_e6", [0.9], 0.0)[0]
        expect_bad = {
            r["doc_id"]
            for r in scores.filter(F.col("mean_nll_e6") > thresh).collect()
        }
        assert expect_bad
        staged = _with_stages(
            docs,
            0.0,
            ("en", "de", "fr"),
            1,
            None,
            lm_model_docs=model,
            max_mean_nll_e6=int(thresh),
        )
        dropped = {
            r["doc_id"]
            for r in staged.filter(F.col("__stage") == "drop:perplexity").collect()
        }
        # perplexity fires after quality/lang/repetition: every expected
        # doc is either dropped here or caught by an EARLIER stage
        earlier = {
            r["doc_id"]
            for r in staged.filter(
                F.col("__stage").isin(
                    "drop:quality", "drop:lang", "drop:repetition"
                )
            ).collect()
        }
        assert dropped == expect_bad - earlier
        assert dropped  # nonzero with min_quality=0 and all langs kept
