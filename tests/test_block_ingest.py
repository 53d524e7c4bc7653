"""Unified per-block ingest (streaming/block_ingest.py): ONE
foreachBatch fan-out under a SINGLE checkpoint writes bronze +
account_tx silver + both serving extracts + the minute rollup — the
Spark composition of the reference's atomic per-block transaction
(src/collector/block/block.ts:142-197 saveBlockInformation).

The crash-injection tests kill the sink after each individual stage of
the transaction body, restart the stream from the SAME checkpoint, and
prove every sink converges to the state of an uninterrupted run —
byte-equal row sets, no duplicates, no losses (VERDICT r8 item 1's
"Done =" criterion).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import classic_fcd_spark.streaming.block_ingest as bi
from classic_fcd_spark.sources.fixtures import gen_txs, tx_hash_str

N_FILES = 6


def _write_feed(spark, path: str) -> None:
    gen_txs(spark).repartitionByRange(N_FILES, "height").write.parquet(path)


def _state(spark, out: str) -> dict:
    """Full observable state of all six sinks, order-normalized."""
    ext_tx = spark.read.parquet(f"{out}/{bi.EXTRACT}/tx_by_hash")
    ext_at = spark.read.parquet(f"{out}/{bi.EXTRACT}/account_tx")
    return {
        "blocks": sorted(
            tuple(r)
            for r in bi.read_blocks(spark, out)
            .select("height", "n_txs")
            .collect()
        ),
        "bronze": sorted(
            r["hash"] for r in bi.read_bronze(spark, out).select("hash").collect()
        ),
        "silver": sorted(
            (r["account"], r["hash"])
            for r in bi.read_account_tx(spark, out)
            .select("account", "hash")
            .collect()
        ),
        "ext_tx": sorted(
            r["hash"] for r in ext_tx.select("hash").collect()
        ),
        "ext_at": sorted(
            (r["account"], r["hash"])
            for r in ext_at.select("account", "hash").collect()
        ),
        "rollup": sorted(
            tuple(r) for r in bi.read_rollup(spark, out).collect()
        ),
    }


@pytest.fixture(scope="module")
def control(spark, tmp_path_factory):
    """Uninterrupted run: the convergence target for every crash case."""
    base = tmp_path_factory.mktemp("ingest_ctrl")
    feed = str(base / "feed")
    out = str(base / "out")
    _write_feed(spark, feed)
    bi.run_block_ingest_available_now(spark, feed, str(base / "ckpt"), out)
    return {"feed": feed, "out": out, "state": _state(spark, out)}


class TestUnifiedIngest:
    def test_all_sinks_consistent_after_clean_run(self, spark, control):
        st = control["state"]
        txs = gen_txs(spark)
        # bronze == the feed, exactly once
        assert st["bronze"] == sorted(r["hash"] for r in txs.select("hash").collect())
        assert len(st["bronze"]) == len(set(st["bronze"]))
        # extracts mirror bronze/silver exactly (no lag under one ckpt)
        assert st["ext_tx"] == st["bronze"]
        assert st["ext_at"] == st["silver"]
        # block entities: one row per height, tx counts match bronze
        assert len(st["blocks"]) == len(
            {h for h, _ in st["blocks"]}
        )
        assert sum(n for _, n in st["blocks"]) == len(st["bronze"])
        # rollup == the batch twin computed over the whole feed at once
        from classic_fcd_spark.pipeline.medallion import tx_volume_minute_silver

        want = sorted(tuple(r) for r in tx_volume_minute_silver(txs).collect())
        assert st["rollup"] == want

    def test_rollup_recompute_prunes_bronze_partitions(self, spark, control):
        """The per-batch rollup recompute must read only the touched
        days of bronze: the day literals resolve to PartitionFilters on
        the scan (bronze is day-partitioned inside each batch dir), so
        the recompute stays O(touched days) as bronze accumulates."""
        minutes = [
            r[0]
            for r in bi.read_rollup(spark, control["out"])
            .select("minute")
            .limit(2)
            .collect()
        ]
        scoped = bi.rollup_scoped_bronze(spark, control["out"], minutes)
        plan = scoped._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [", 1)
        assert len(pf) == 2 and bi.DAY_COL in pf[1].split("]", 1)[0], plan[:1500]

    def test_extract_serves_point_lookups(self, spark, control):
        from classic_fcd_spark.serving.extract import lookup_tx

        h = tx_hash_str(95 * 3 + 0)
        ext = f"{control['out']}/{bi.EXTRACT}"
        assert lookup_tx(spark, ext, h).count() == 1

    @pytest.mark.parametrize(
        "stage", ["account_tx_silver", "merge_tx_lookup_extract", "merge_upsert"]
    )
    def test_crash_after_each_stage_converges_on_restart(
        self, spark, tmp_path, control, stage
    ):
        """Kill the transaction body mid-batch-3 at three boundaries:
        after bronze (before silver), after silver (before the
        extracts), and after the extracts (before the rollup).  The
        restart replays batch 3 under the same checkpoint and every
        sink must equal the uninterrupted run."""
        from pyspark.errors.exceptions.captured import StreamingQueryException

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        feed = control["feed"]

        orig = getattr(bi, stage)
        calls = {"n": 0}

        def bomb(*a, **k):
            calls["n"] += 1
            if calls["n"] == 4:  # batch ids 0..3 -> crash inside batch 3
                raise RuntimeError("injected crash")
            return orig(*a, **k)

        setattr(bi, stage, bomb)
        try:
            with pytest.raises(StreamingQueryException):
                bi.run_block_ingest_available_now(spark, feed, ckpt, out)
        finally:
            setattr(bi, stage, orig)
        assert calls["n"] == 4, "crash point never reached"

        # the wounded state is genuinely divergent (the test has teeth):
        # bronze already carries batch 3, the crashed-or-later sinks do not
        mid = _state(spark, out)
        assert mid != control["state"]
        assert len(mid["bronze"]) > len(mid["ext_tx"]) or mid["rollup"] != control[
            "state"
        ]["rollup"]

        # restart from the SAME checkpoint: batch 3 replays, all five
        # sinks converge to the uninterrupted run
        bi.run_block_ingest_available_now(spark, feed, ckpt, out)
        assert _state(spark, out) == control["state"]

    def test_catchup_processes_only_new_files(self, spark, tmp_path, control):
        """S2 under the unified checkpoint: a second availableNow drain
        after new feed files arrive ingests ONLY those files, and the
        sinks advance together."""
        import shutil

        feed = str(tmp_path / "feed")
        shutil.copytree(control["feed"], feed)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        bi.run_block_ingest_available_now(spark, feed, ckpt, out)
        before = _state(spark, out)
        assert before == control["state"]

        from classic_fcd_spark.sources.fixtures import FIXTURE_N_BLOCKS

        # genuinely NEW blocks (heights past the fixture's range) — a
        # re-delivery of existing heights would be the duplicate-hash
        # case, which the extracts dedup by key but bronze appends
        late = gen_txs(spark, n=FIXTURE_N_BLOCKS + 20).filter(
            F.col("height") > FIXTURE_N_BLOCKS
        )
        late.coalesce(1).write.mode("append").parquet(feed)
        bi.run_block_ingest_available_now(spark, feed, ckpt, out)
        after = _state(spark, out)
        assert len(after["bronze"]) == len(before["bronze"]) + late.count()
        assert after["ext_tx"] == after["bronze"]
