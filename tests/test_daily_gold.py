"""Composed daily gold runner (pipeline/daily_gold.py): the reference's
per-day cron layer (collector.ts:50-67 — 00:10 validator return, 00:20
dashboard, 13:00 richlist/vesting) as one idempotent MERGE pass.

Mirrors tests/test_block_ingest.py's crash discipline: kill the pass at
every job boundary, re-run, and prove every table converges to the
uninterrupted run's bytes; plus the reference's exists-guard semantics
(collectDashboard.ts:36-42 — a stored day is NOT recomputed unless
updateExisting).
"""

from __future__ import annotations

import pytest

import classic_fcd_spark.pipeline.daily_gold as dg

ASOF = "2021-01-04"  # the fixture's last calendar day
TABLES = [dg.DASHBOARD, dg.VALIDATOR_RETURNS, dg.RICHLIST, dg.UNVESTED]
STAGES = [
    "collect_validator_returns",
    "collect_dashboard",
    "collect_richlist",
    "collect_unvested",
]


def _state(spark, out: str) -> dict:
    return {
        t: sorted(tuple(r) for r in dg.read_gold(spark, out, t).collect())
        for t in TABLES
    }


@pytest.fixture(scope="module")
def control(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("daily_gold") / "out")
    dg.run_daily_gold(spark, out, ASOF)
    return {"out": out, "state": _state(spark, out)}


class TestDailyGold:
    def test_window_and_shapes(self, spark, control):
        dash = dg.read_gold(spark, control["out"], dg.DASHBOARD)
        days = sorted(r["day"] for r in dash.select("day").distinct().collect())
        # trailing-3-day window [asof-3, asof): never today
        assert days == ["2021-01-01", "2021-01-02", "2021-01-03"]
        vr_days = {
            r["day"]
            for r in dg.read_gold(spark, control["out"], dg.VALIDATOR_RETURNS)
            .select("day")
            .distinct()
            .collect()
        }
        assert vr_days == set(days)
        rich = dg.read_gold(spark, control["out"], dg.RICHLIST)
        assert {r["day"] for r in rich.select("day").distinct().collect()} == {ASOF}
        assert rich.count() > 0
        unv = sorted(
            tuple(r)
            for r in dg.read_gold(spark, control["out"], dg.UNVESTED).collect()
        )
        assert len(unv) > 0 and all(r[0] == ASOF for r in unv)

    def test_gold_matches_gated_queries(self, spark, control):
        """The stored window rows are exactly the driver-gated queries'
        rows for those days — the runner adds scheduling, not math."""
        from classic_fcd_spark.queries.fcd import fcd_dashboard

        want = sorted(
            tuple(r)
            for r in fcd_dashboard(spark, "")
            .drop("max_block_ts", "max_price_ts")
            .filter("day < '2021-01-04'")
            .collect()
        )
        got = sorted(
            tuple(r)
            for r in dg.read_gold(spark, control["out"], dg.DASHBOARD).collect()
        )
        assert got == want

    def test_rerun_is_idempotent(self, spark, tmp_path, control):
        out = str(tmp_path / "out")
        dg.run_daily_gold(spark, out, ASOF)
        dg.run_daily_gold(spark, out, ASOF)
        assert _state(spark, out) == control["state"]

    @pytest.mark.parametrize("stage", STAGES)
    def test_crash_at_each_job_boundary_converges(
        self, spark, tmp_path, control, monkeypatch, stage
    ):
        out = str(tmp_path / "out")
        orig = getattr(dg, stage)

        def bomb(*a, **k):
            raise RuntimeError("injected crash")

        monkeypatch.setattr(dg, stage, bomb)
        with pytest.raises(RuntimeError, match="injected crash"):
            dg.run_daily_gold(spark, out, ASOF)
        monkeypatch.setattr(dg, stage, orig)
        # resume the scheduled pass: everything converges
        dg.run_daily_gold(spark, out, ASOF)
        assert _state(spark, out) == control["state"]

    def test_snapshot_replace_drops_departed_rows(self, spark, tmp_path):
        """richlist.ts parity: the reference TRUNCATES the day and
        reloads from the tracking file, so an account that left the
        richlist must not survive a re-collection — replace semantics,
        not upsert (a MERGE would keep the stale row)."""
        import os

        from pyspark.sql import functions as F

        from classic_fcd_spark.streaming.minute_pipeline import merge_upsert

        out = str(tmp_path / "out")
        dg.run_daily_gold(spark, out, ASOF)
        table = os.path.join(out, dg.RICHLIST)
        stale = spark.createDataFrame(
            [(ASOF, "uluna", "terra1departedwhale", 999_999, 123)],
            "day string, denom string, account string, amount long, pct_e9 long",
        )
        merge_upsert(
            spark, stale, table, ["day", "denom", "account"],
            partition_expr=F.col("day"),
        )
        assert any(
            r["account"] == "terra1departedwhale"
            for r in dg.read_gold(spark, out, dg.RICHLIST).collect()
        )
        dg.collect_richlist(spark, out, ASOF)  # the next day's 13:00 run
        rows = dg.read_gold(spark, out, dg.RICHLIST).collect()
        assert not any(r["account"] == "terra1departedwhale" for r in rows)
        assert len(rows) > 0

    def test_exists_guard_skips_stored_days(self, spark, tmp_path):
        """collectDashboard.ts:36-42 parity: a stored day is left alone
        on re-run (even if its bytes diverge) unless updateExisting."""
        import os

        from pyspark.sql import functions as F

        from classic_fcd_spark.streaming.minute_pipeline import merge_upsert

        out = str(tmp_path / "out")
        dg.run_daily_gold(spark, out, ASOF)
        table = os.path.join(out, dg.DASHBOARD)
        poison = spark.createDataFrame(
            [("2021-01-02", -1, -1, -1)],
            "day string, tx_count long, active_accounts long, reward_total long",
        )
        merge_upsert(spark, poison, table, ["day"], partition_expr=F.col("day"))
        dg.run_daily_gold(spark, out, ASOF)  # guard: day exists -> skipped
        rows = {
            r["day"]: r["tx_count"]
            for r in dg.read_gold(spark, out, dg.DASHBOARD).collect()
        }
        assert rows["2021-01-02"] == -1
        dg.run_daily_gold(spark, out, ASOF, update_existing=True)
        rows = {
            r["day"]: r["tx_count"]
            for r in dg.read_gold(spark, out, dg.DASHBOARD).collect()
        }
        assert rows["2021-01-02"] > 0
