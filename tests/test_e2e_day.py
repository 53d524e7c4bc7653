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

# slow tier (r16, VERDICT r15 item 7): full-day ingest/gold e2e — run with --runslow
pytestmark = pytest.mark.slow
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


class TestE2EDayServing:
    """r13 extension (VERDICT r12 item 2): the day does not stop at
    gold — the SAME ingested corpus continues through the serving
    extract maintenance and the endpoint wrappers, closing the last
    seam (ingest→gold→serving) with cross-layer pins:

    1. Dashboard-family endpoint responses computed over the STREAMED
       tables (via serving.endpoints.bronze_sources) are byte-equal to
       the fixture-bronze twins — dashboard.spec.ts:22-50 semantics
       end-to-end over a freshly collected database.
    2. The tx page (get_tx_list) over the streamed tx/account_tx tables
       equals the fixture twin page-by-page — tx.spec.ts:6-16 semantics.
    3. The serving extract maintained FROM the streamed bronze serves
       point lookups identical to the batch-written twin, and a crash
       at the gold→extract boundary (extract maintenance killed before
       its first account-page merge commits) converges on re-run.
    """

    @staticmethod
    def _streamed(spark, out):
        return (
            bi.read_bronze(spark, out),
            bi.read_account_tx(spark, out),
            bi.read_rewards_bronze(spark, out),
        )

    def test_dashboard_endpoints_over_streamed_tables(self, spark, day):
        import classic_fcd_spark.serving.endpoints as E

        txs_i, at_i, blk_i = self._streamed(spark, day["out"])
        endpoints = [
            E.get_account_growth,
            E.get_active_accounts,
            E.get_registered_accounts,
            E.get_transaction_vol,
            E.get_block_rewards,
        ]
        want = {f.__name__: f(spark) for f in endpoints}
        with E.bronze_sources(txs=txs_i, blocks=blk_i, account_tx=at_i):
            got = {f.__name__: f(spark) for f in endpoints}
        assert got == want
        # non-triviality: the growth series actually has rows
        assert len(want["get_account_growth"]["cumulative"]) > 0

    def test_bronze_sources_canary_perturbed_table_changes_response(
        self, spark, day
    ):
        """Canary for a silently bypassed seam (ADVICE r13): the equality
        pin above compares responses over inputs that are equal BY
        CONSTRUCTION, so an endpoint that ignored bronze_sources and
        called gen_txs directly would still pass it.  Run one endpoint
        under a deliberately PERTURBED override (every tx from the
        busiest fixture account dropped) and assert the response
        actually moves — proof the override is load-bearing."""
        import classic_fcd_spark.serving.endpoints as E
        from pyspark.sql import functions as F2

        from classic_fcd_spark.pipeline.medallion import account_tx_silver

        txs_i, at_i, blk_i = self._streamed(spark, day["out"])
        baseline = E.get_transaction_vol(spark)
        victim = at_i.groupBy("account").count().orderBy(
            F2.col("count").desc()
        ).first()["account"]
        txs_p = txs_i.filter(
            ~F2.exists("msgs", lambda m: m["value"].contains(victim))
        )
        with E.bronze_sources(
            txs=txs_p, blocks=blk_i, account_tx=account_tx_silver(txs_p)
        ):
            perturbed = E.get_transaction_vol(spark)
        assert perturbed != baseline, (
            "dropping an account's txs left the endpoint response "
            "unchanged — the bronze_sources seam is being bypassed"
        )

    def test_tx_page_over_streamed_tables_keyset_walk(self, spark, day):
        from classic_fcd_spark.serving.api import get_tx_list
        from classic_fcd_spark.sources.fixtures import addr_str, gen_txs
        from classic_fcd_spark.pipeline.medallion import account_tx_silver

        txs_i, at_i, _ = self._streamed(spark, day["out"])
        txs_f = gen_txs(spark)
        at_f = account_tx_silver(txs_f)
        account = addr_str(7)  # on many txs by fixture arithmetic (i%50)
        cursor_i = cursor_f = None
        pages = 0
        while True:
            got = get_tx_list(txs_i, at_i, account, limit=10, offset=cursor_i)
            want = get_tx_list(txs_f, at_f, account, limit=10, offset=cursor_f)
            assert got == want
            pages += 1
            cursor_i, cursor_f = got["next"], want["next"]
            if cursor_i is None:
                break
        assert pages >= 2  # the account is busy enough to paginate

    def test_extract_from_streamed_bronze_with_boundary_crash(
        self, spark, day, tmp_path, monkeypatch
    ):
        import classic_fcd_spark.serving.extract as ex
        from classic_fcd_spark.pipeline.medallion import account_tx_silver
        from classic_fcd_spark.sources.fixtures import (
            addr_str,
            gen_txs,
            tx_hash_str,
        )

        txs_i, _, _ = self._streamed(spark, day["out"])
        flat = str(tmp_path / "txs_flat")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "extract")
        # the maintenance streams the INGESTED bronze (file-ized once,
        # N_FILES micro-batch boundaries like the feed)
        txs_i.repartitionByRange(N_FILES, "height").write.parquet(flat)

        # gold→extract boundary crash: the first account-page merge dies
        # before committing; the tx merge of that batch already landed
        orig = ex.merge_account_page_extract
        def bomb(*a, **k):
            raise RuntimeError("injected crash at the gold-extract boundary")

        monkeypatch.setattr(ex, "merge_account_page_extract", bomb)
        with pytest.raises(Exception, match="injected crash"):
            ex.run_extract_maintenance_available_now(spark, flat, ckpt, out)
        monkeypatch.setattr(ex, "merge_account_page_extract", orig)
        # the next maintenance run replays the uncommitted batch(es);
        # merges are idempotent upserts, so the extract converges
        ex.run_extract_maintenance_available_now(spark, flat, ckpt, out)

        # twin extract written batch-wise from fixture bronze
        twin = str(tmp_path / "twin")
        txs_f = gen_txs(spark)
        ex.write_tx_lookup_extract(txs_f, twin)
        ex.write_account_page_extract(account_tx_silver(txs_f), twin)

        def rows(path, sub):
            df = spark.read.parquet(f"{path}/{sub}").drop(ex.KB)
            cols = sorted(df.columns)
            # key=repr: nullable columns (code) make raw tuples unorderable
            return sorted(
                (tuple(r) for r in df.select(*cols).collect()), key=repr
            )

        assert rows(out, "tx_by_hash") == rows(twin, "tx_by_hash")
        assert rows(out, "account_tx") == rows(twin, "account_tx")

        # point reads off the converged extract match the analytics path
        h = tx_hash_str(105)
        got_tx = ex.lookup_tx(spark, out, h.upper()).select("hash", "height").collect()
        assert [(r["hash"], r["height"]) for r in got_tx] == [(h, 35)]
        page = ex.lookup_account_page(spark, out, addr_str(7), limit=10)
        want_page = (
            account_tx_silver(txs_f)
            .filter(F.col("account") == addr_str(7))
            .orderBy(F.col("height").desc(), F.col("hash").desc())
            .limit(10)
            .collect()
        )
        assert [(r["hash"], r["height"]) for r in page[:10]] == [
            (r["hash"], r["height"]) for r in want_page
        ]
