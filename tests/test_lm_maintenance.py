"""Incremental trigram-LM maintenance (streaming/lm_maintenance.py):
the maintained model must be EXACTLY the from-scratch fit of the
accumulated corpus — table-level integer equality AND score-level
e9-integer equality — with per-batch idempotent replay (VERDICT r8
item 5's "Done =" criterion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )


def _table_rows(model):
    return (
        sorted(tuple(r) for r in model.uni_model.collect()),
        sorted(tuple(r) for r in model.pair_model.collect()),
        sorted(tuple(r) for r in model.tri_model.collect()),
    )


class TestIncrementalLm:
    def test_incremental_equals_from_scratch_exactly(self, spark, tmp_path):
        from classic_fcd_spark.operators.lm import (
            fit_trigram_prob_model,
            score_trigram_prob,
        )
        from classic_fcd_spark.streaming.lm_maintenance import (
            load_trigram_model_incremental,
            run_lm_maintenance_available_now,
        )

        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        docs.repartitionByRange(4, "doc_id").write.parquet(feed)

        mdir = str(tmp_path / "model")
        run_lm_maintenance_available_now(
            spark, feed, mdir, str(tmp_path / "ckpt")
        )
        inc = load_trigram_model_incremental(spark, mdir)
        full = fit_trigram_prob_model(docs)

        # counting is a homomorphism over corpus union: the summed
        # deltas must equal the one-shot fit's tables EXACTLY
        assert _table_rows(inc) == _table_rows(full)
        assert inc.ut == full.ut

        # and the consumer-visible contract: identical e9-integer scores
        probe = docs.limit(50)
        got = {
            r["doc_id"]: (r["n_tokens"], r["sum_p_e9"])
            for r in score_trigram_prob(probe, inc).collect()
        }
        want = {
            r["doc_id"]: (r["n_tokens"], r["sum_p_e9"])
            for r in score_trigram_prob(probe, full).collect()
        }
        assert got == want

    def test_catchup_merges_only_new_batches(self, spark, tmp_path):
        """S2: fit on the first half, then drop the second half and
        re-drain under the same checkpoint — the merged model equals a
        fit of the whole corpus; the first half is never recounted
        (its delta partitions are untouched)."""
        import os

        from classic_fcd_spark.operators.lm import fit_trigram_prob_model
        from classic_fcd_spark.streaming.lm_maintenance import (
            load_trigram_model_incremental,
            run_lm_maintenance_available_now,
        )

        docs = _docs(spark)
        half1 = docs.filter(F.col("doc_id") < 250)
        half2 = docs.filter(F.col("doc_id") >= 250)
        feed = str(tmp_path / "feed")
        ckpt = str(tmp_path / "ckpt")
        mdir = str(tmp_path / "model")

        half1.repartitionByRange(2, "doc_id").write.parquet(feed)
        run_lm_maintenance_available_now(spark, feed, mdir, ckpt)
        mt_before = {
            p: os.path.getmtime(os.path.join(f"{mdir}/uni_delta", p))
            for p in os.listdir(f"{mdir}/uni_delta")
            if p.startswith("batch_pt=")
        }

        half2.coalesce(1).write.mode("append").parquet(feed)
        run_lm_maintenance_available_now(spark, feed, mdir, ckpt)

        # old delta partitions untouched (refit cost ∝ batch, not corpus)
        for p, t in mt_before.items():
            assert os.path.getmtime(os.path.join(f"{mdir}/uni_delta", p)) == t

        inc = load_trigram_model_incremental(spark, mdir)
        full = fit_trigram_prob_model(docs)
        assert _table_rows(inc) == _table_rows(full)

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        """A micro-batch re-delivered after a crash overwrites its own
        delta partition — counts unchanged (exactly-once)."""
        from classic_fcd_spark.streaming.lm_maintenance import (
            load_trigram_model_incremental,
            write_lm_delta_batch,
        )

        docs = _docs(spark)
        mdir = str(tmp_path / "model")
        write_lm_delta_batch(docs.filter(F.col("doc_id") < 100), 0, mdir)
        write_lm_delta_batch(docs.filter(F.col("doc_id") >= 100), 1, mdir)
        once = _table_rows(load_trigram_model_incremental(spark, mdir))
        # replay batch 1 (same rows, same id)
        write_lm_delta_batch(docs.filter(F.col("doc_id") >= 100), 1, mdir)
        again = _table_rows(load_trigram_model_incremental(spark, mdir))
        assert once == again
