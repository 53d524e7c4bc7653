"""Day-in-the-life composition (VERDICT r11 item 5): the nine-sink
per-block ingest (streaming/block_ingest.py, the saveBlockInformation
transaction) feeding the scheduled daily-gold pass
(pipeline/daily_gold.py, the collector.ts cron layer) on the SAME
corpus — the last composition seam with no cross-layer test.

Three contracts:
1. Gold computed FROM THE INGESTED TABLES is byte-equal to the batch
   twin computed from fixture bronze (the ingest preserves everything
   the gold layer reads).
2. A crash at the ingest→gold boundary — ingest committed, gold pass
   killed mid-flight — converges on a full-day re-run: the availableNow
   ingest replays nothing (checkpoint), the gold MERGE completes.
3. Golden dashboard rows: the stored window rows equal the driver-gated
   fcd_dashboard DuckDB oracle for those days — the engine's analogue
   of the reference's dashboard e2e assertions
   (src/e2etest/dashboard.spec.ts:22-50: pinned response fields over a
   freshly collected database).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

import classic_fcd_spark.pipeline.daily_gold as dg
import classic_fcd_spark.streaming.block_ingest as bi
from classic_fcd_spark.sources.fixtures import gen_blocks, gen_txs, gen_validators

ASOF = "2021-01-04"  # window = 2021-01-01 .. 2021-01-03, never today
GOLD_TABLES = [dg.DASHBOARD, dg.VALIDATOR_RETURNS, dg.RICHLIST, dg.UNVESTED]
N_FILES = 6


def _ingest_gold_inputs(spark, out: str):
    """The ingest→gold seam: day-grain gold computed from the STREAMED
    tables (blockreward bronze, tx bronze, account_tx silver) instead of
    the fixture generators."""
    from classic_fcd_spark.pipeline.medallion import (
        dashboard_gold,
        minute_rewards_silver,
    )
    from classic_fcd_spark.queries.fcd import validator_returns_view

    txs_i = bi.read_bronze(spark, out)
    at_i = bi.read_account_tx(spark, out)
    blk_i = bi.read_rewards_bronze(spark, out)
    return {
        "dashboard_df": dashboard_gold(
            txs_i, at_i, minute_rewards_silver(blk_i)
        ),
        "validator_returns_df": validator_returns_view(
            blk_i, gen_validators(spark)
        ),
    }


def _run_day(spark, feed: str, ckpt: str, out: str, gold: str) -> None:
    """One 'day': the per-block ingest catches up, then the scheduled
    gold pass runs over what the ingest wrote."""
    bi.run_block_ingest_available_now(spark, feed, ckpt, out)
    dg.run_daily_gold(spark, gold, ASOF, **_ingest_gold_inputs(spark, out))


def _gold_state(spark, gold: str) -> dict:
    return {
        t: sorted(tuple(r) for r in dg.read_gold(spark, gold, t).collect())
        for t in GOLD_TABLES
    }


@pytest.fixture(scope="module")
def day(spark, tmp_path_factory):
    """Uninterrupted ingest→gold day over the bundle feed (blocks with
    reward events + txs — all nine sinks exercise)."""
    base = tmp_path_factory.mktemp("e2e_day")
    feed, ckpt, out, gold = (
        str(base / d) for d in ("feed", "ckpt", "out", "gold")
    )
    bi.build_block_bundle_feed(
        gen_txs(spark), gen_blocks(spark)
    ).repartitionByRange(N_FILES, "height").write.parquet(feed)
    _run_day(spark, feed, ckpt, out, gold)
    return {
        "base": base,
        "feed": feed,
        "out": out,
        "gold": gold,
        "state": _gold_state(spark, gold),
    }


class TestE2EDay:
    def test_ingested_gold_equals_batch_twin(self, spark, day, tmp_path):
        """Contract 1: the gold pass over the STREAMED tables writes the
        same bytes as the pass over fixture bronze — the ingest lost
        nothing the gold layer reads (tx rows, addresses, reward
        events), and the injected-gold runner is the batch runner."""
        twin = str(tmp_path / "gold_twin")
        dg.run_daily_gold(spark, twin, ASOF)  # fixture-bronze defaults
        assert _gold_state(spark, twin) == day["state"]

    def test_crash_at_ingest_gold_boundary_converges(
        self, spark, day, tmp_path, monkeypatch
    ):
        """Contract 2: ingest commits, the gold pass dies on its FIRST
        merge; the next day-run replays the checkpoint (no new files →
        no sink writes) and completes the gold pass to the
        uninterrupted state."""
        base = tmp_path
        feed = day["feed"]  # same corpus, fresh checkpoint/out/gold
        ckpt, out, gold = (str(base / d) for d in ("ckpt", "out", "gold"))

        orig = dg.collect_validator_returns
        calls = {"n": 0}

        def bomb(*a, **k):
            calls["n"] += 1
            raise RuntimeError("injected crash at the ingest-gold boundary")

        monkeypatch.setattr(dg, "collect_validator_returns", bomb)
        with pytest.raises(RuntimeError, match="injected crash"):
            _run_day(spark, feed, ckpt, out, gold)
        assert calls["n"] == 1  # the ingest half committed, gold did not
        monkeypatch.setattr(dg, "collect_validator_returns", orig)
        _run_day(spark, feed, ckpt, out, gold)  # the next scheduled day
        assert _gold_state(spark, gold) == day["state"]

    def test_crash_inside_gold_merge_converges(
        self, spark, day, tmp_path, monkeypatch
    ):
        """Contract 2, deeper: the validator-return MERGE lands, the
        dashboard MERGE dies mid-pass; re-run converges (the stored
        day's exists-guard sees only completed promotions thanks to the
        heal-before-read discipline)."""
        base = tmp_path
        ckpt, out, gold = (str(base / d) for d in ("ckpt", "out", "gold"))
        orig = dg.collect_dashboard

        def bomb(*a, **k):
            raise RuntimeError("injected crash")

        monkeypatch.setattr(dg, "collect_dashboard", bomb)
        with pytest.raises(RuntimeError, match="injected crash"):
            _run_day(spark, day["feed"], ckpt, out, gold)
        monkeypatch.setattr(dg, "collect_dashboard", orig)
        _run_day(spark, day["feed"], ckpt, out, gold)
        assert _gold_state(spark, gold) == day["state"]

    def test_golden_dashboard_rows_match_driver_oracle(self, spark, day):
        """Contract 3 (dashboard.spec.ts:22-50 semantics): the stored
        dashboard rows for the window days are pinned against the
        driver-gated fcd_dashboard DuckDB oracle — cross-engine golden
        values for the END of the composed ingest→gold path."""
        import duckdb

        from classic_fcd_spark.queries import oracle_sql_map

        dash_sql = oracle_sql_map()["fcd_dashboard"]
        stored = dg.read_gold(spark, day["gold"], dg.DASHBOARD)
        cols = ", ".join(stored.columns)
        want = sorted(
            tuple(r)
            for r in duckdb.sql(
                f"SELECT {cols} FROM ({dash_sql}) WHERE day < '{ASOF}'"
            ).fetchall()
        )
        got = sorted(tuple(r) for r in stored.collect())
        assert got == want
        assert len(got) == 3  # the trailing window, one row per day
