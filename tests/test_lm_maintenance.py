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


class TestCompaction:
    """compact_lm_deltas folds the live deltas into one epoch partition:
    the loaded model must be unchanged (bit-exact) through compaction,
    post-compaction batches, and re-compaction; a compaction that
    crashed before its manifest commit must be invisible."""

    def _seed(self, spark, tmp_path, n_batches=4):
        from classic_fcd_spark.streaming.lm_maintenance import (
            write_lm_delta_batch,
        )

        docs = _docs(spark)
        mdir = str(tmp_path / "model")
        per = 500 // n_batches
        for b in range(n_batches):
            write_lm_delta_batch(
                docs.filter(
                    (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
                ),
                b,
                mdir,
            )
        return docs, mdir

    def test_compaction_preserves_model_exactly(self, spark, tmp_path):
        import os

        from classic_fcd_spark.streaming.lm_maintenance import (
            compact_lm_deltas,
            load_trigram_model_incremental,
            write_lm_delta_batch,
        )

        docs, mdir = self._seed(spark, tmp_path)
        before = _table_rows(load_trigram_model_incremental(spark, mdir))
        epoch = compact_lm_deltas(spark, mdir)
        assert epoch == "epoch-0"
        # folded: exactly one live partition per table remains
        parts = [
            d for d in os.listdir(f"{mdir}/uni_delta") if d.startswith("batch_pt=")
        ]
        assert parts == [f"batch_pt={epoch}"]
        assert _table_rows(load_trigram_model_incremental(spark, mdir)) == before

        # new batches land beside the epoch; re-compaction folds them in
        write_lm_delta_batch(docs.filter(F.col("doc_id") % 7 == 0), 99, mdir)
        grown = _table_rows(load_trigram_model_incremental(spark, mdir))
        assert grown != before
        assert compact_lm_deltas(spark, mdir) == "epoch-1"
        assert _table_rows(load_trigram_model_incremental(spark, mdir)) == grown
        # idempotent no-op when there is nothing to fold
        assert compact_lm_deltas(spark, mdir) == "epoch-1"

    def test_fold_is_pinned_to_the_listdir_snapshot(self, spark, tmp_path):
        """A delta batch landing AFTER the snapshot but BEFORE the table
        reads must be left live (not folded yet not covered → it would
        be double-counted).  Simulated by writing the late batch between
        the manifest read and the fold — the isin(live) pin keeps the
        folded set equal to the manifest's covered set."""
        from unittest import mock

        from classic_fcd_spark.streaming import lm_maintenance as lmm

        docs, mdir = self._seed(spark, tmp_path)
        before = _table_rows(lmm.load_trigram_model_incremental(spark, mdir))
        late = docs.filter(F.col("doc_id") % 5 == 0)

        real_listdir = lmm.os.listdir
        fired = {"done": False}

        def listdir_then_land(path):
            out = real_listdir(path)
            if not fired["done"]:
                fired["done"] = True
                lmm.write_lm_delta_batch(late, 777, mdir)
            return out

        with mock.patch.object(lmm.os, "listdir", side_effect=listdir_then_land):
            epoch = lmm.compact_lm_deltas(spark, mdir)
        assert epoch == "epoch-0"
        covered, _ = lmm._epoch_state(mdir)
        assert "777" not in covered  # late batch NOT claimed by the manifest
        import os

        live = [
            d for d in os.listdir(f"{mdir}/uni_delta")
            if d.startswith("batch_pt=") and "epoch" not in d
        ]
        assert live == ["batch_pt=777"]  # ...and still live on disk
        # model == epoch + the late batch, counted exactly once
        expect = _table_rows(
            lmm.load_trigram_model_incremental(spark, mdir)
        )
        lmm.compact_lm_deltas(spark, mdir)  # fold it in; model unchanged
        assert _table_rows(
            lmm.load_trigram_model_incremental(spark, mdir)
        ) == expect
        assert expect != before

    def test_covered_replay_is_a_noop(self, spark, tmp_path):
        """Replaying a batch whose partition was already folded into the
        epoch must not resurrect it as a live partition (that would
        double-count it)."""
        import os

        from classic_fcd_spark.streaming.lm_maintenance import (
            compact_lm_deltas,
            load_trigram_model_incremental,
            write_lm_delta_batch,
        )

        docs, mdir = self._seed(spark, tmp_path)
        compact_lm_deltas(spark, mdir)
        before = _table_rows(load_trigram_model_incremental(spark, mdir))
        write_lm_delta_batch(docs.filter(F.col("doc_id") < 125), 0, mdir)
        live = [
            d for d in os.listdir(f"{mdir}/uni_delta")
            if d.startswith("batch_pt=") and "epoch" not in d
        ]
        assert live == []
        assert _table_rows(load_trigram_model_incremental(spark, mdir)) == before

    def test_new_checkpoint_same_model_dir_is_not_dropped(self, spark, tmp_path):
        """The ADVICE r9 hazard: after compaction, a NEW checkpoint
        reusing model_dir restarts batch ids at 0 — the run namespace
        keeps the new batch 0 out of the covered set, so its counts
        land instead of being silently excluded."""
        from classic_fcd_spark.operators.lm import fit_trigram_prob_model
        from classic_fcd_spark.streaming.lm_maintenance import (
            compact_lm_deltas,
            load_trigram_model_incremental,
            run_lm_maintenance_available_now,
        )

        docs = _docs(spark)
        half1 = docs.filter(F.col("doc_id") < 250)
        half2 = docs.filter(F.col("doc_id") >= 250)
        mdir = str(tmp_path / "model")

        feed1 = str(tmp_path / "feed1")
        half1.coalesce(1).write.parquet(feed1)
        run_lm_maintenance_available_now(spark, feed1, mdir, str(tmp_path / "c1"))
        compact_lm_deltas(spark, mdir)

        # a brand-new checkpoint over a new feed, same model_dir:
        # its batch ids restart at 0
        feed2 = str(tmp_path / "feed2")
        half2.coalesce(1).write.parquet(feed2)
        run_lm_maintenance_available_now(spark, feed2, mdir, str(tmp_path / "c2"))

        inc = load_trigram_model_incremental(spark, mdir)
        full = fit_trigram_prob_model(docs)
        assert _table_rows(inc) == _table_rows(full)

    def test_auto_compaction_bounds_partitions_bit_exactly(self, spark, tmp_path):
        """compact_every=N inside the maintenance loop: live partition
        count stays < N after the drain, and the maintained model is
        still EXACTLY the from-scratch fit."""
        import os

        from classic_fcd_spark.operators.lm import fit_trigram_prob_model
        from classic_fcd_spark.streaming.lm_maintenance import (
            load_trigram_model_incremental,
            run_lm_maintenance_available_now,
        )

        docs = _docs(spark)
        feed = str(tmp_path / "feed")
        docs.repartitionByRange(6, "doc_id").write.parquet(feed)
        mdir = str(tmp_path / "model")
        run_lm_maintenance_available_now(
            spark, feed, mdir, str(tmp_path / "ckpt"), compact_every=3
        )
        live = [
            d for d in os.listdir(f"{mdir}/uni_delta")
            if d.startswith("batch_pt=") and "epoch" not in d
        ]
        assert len(live) < 3
        inc = load_trigram_model_incremental(spark, mdir)
        full = fit_trigram_prob_model(docs)
        assert _table_rows(inc) == _table_rows(full)
        assert inc.ut == full.ut

    def test_uncommitted_epoch_is_invisible(self, spark, tmp_path):
        """A compaction that died after writing its epoch dirs but
        BEFORE the manifest rename must not change what loaders see,
        and a retry must succeed."""
        import os
        import shutil

        from classic_fcd_spark.streaming.lm_maintenance import (
            compact_lm_deltas,
            load_trigram_model_incremental,
        )

        _, mdir = self._seed(spark, tmp_path)
        before = _table_rows(load_trigram_model_incremental(spark, mdir))

        # simulate the crash window: epoch dirs present, no manifest
        # (copy batch 0's dirs as a bogus half-written epoch)
        for t in ("uni", "pair", "tri"):
            shutil.copytree(
                f"{mdir}/{t}_delta/batch_pt=0",
                f"{mdir}/{t}_delta/batch_pt=epoch-0",
            )
        assert _table_rows(load_trigram_model_incremental(spark, mdir)) == before
        # retry overwrites the orphan and commits
        assert compact_lm_deltas(spark, mdir) == "epoch-0"
        assert _table_rows(load_trigram_model_incremental(spark, mdir)) == before
