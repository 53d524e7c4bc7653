"""Sessionization contracts (operators/windows.py sessionize/session_stats).

Gates: DuckDB oracle over the driver's events table (same lag+cumsum
formulation recomputed independently in SQL), hand-pinned gap semantics,
and a single-shuffle plan assert (both windows must share one
partitioning)."""

from __future__ import annotations

import datetime
import pytest

import duckdb

from tests.conftest import SF_SMALL


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


class TestSessionize:
    def test_gap_semantics_pinned(self, spark):
        from classic_fcd_spark.operators.windows import sessionize

        rows = [(1, _ts(0)), (1, _ts(100)), (1, _ts(401)), (1, _ts(500)), (2, _ts(0))]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r["user_id"], r["ts"]): r["session_id"]
            for r in sessionize(df, ["user_id"], "ts", 300).collect()
        }
        # session_window convention (empirical): exact-gap arrivals
        # MERGE; only strictly longer silences split
        assert got[(1, _ts(0))] == 0
        assert got[(1, _ts(100))] == 0  # 100s gap
        assert got[(1, _ts(401))] == 1  # 301s gap > 300 -> new session
        assert got[(1, _ts(500))] == 1
        assert got[(2, _ts(0))] == 0  # fresh key restarts ordinals

    def test_exact_gap_merges_like_session_window(self, spark):
        """An event exactly `gap` after the previous one MERGES into the
        session — Structured Streaming's session_window does the same
        (the equivalence test below covers the chained case), so the
        batch and streaming twins agree at the boundary."""
        from classic_fcd_spark.operators.windows import sessionize

        df = spark.createDataFrame(
            [(1, _ts(0)), (1, _ts(300))], "user_id long, ts timestamp"
        )
        got = {r["ts"]: r["session_id"] for r in sessionize(df, ["user_id"], "ts", 300).collect()}
        assert got[_ts(300)] == 0

    def test_matches_duckdb_oracle_on_events(self, spark):
        from classic_fcd_spark.operators.windows import session_stats
        from classic_fcd_spark.session import load_tables

        ev = load_tables(spark, SF_SMALL)["events"].select("user_id", "ts")
        gap = 600
        got = {
            (r["user_id"], r["session_id"]): (
                str(r["session_start"]),
                str(r["session_end"]),
                r["n_events"],
            )
            for r in session_stats(ev, ["user_id"], "ts", gap).collect()
        }
        con = duckdb.connect()
        expected = {
            (r[0], r[1]): (str(r[2]), str(r[3]), r[4])
            for r in con.sql(
                f"""
                WITH ev AS (
                    SELECT user_id, ts,
                           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts) AS gap_us
                    FROM read_parquet('{SF_SMALL}/events.parquet')
                ),
                tagged AS (
                    SELECT user_id, ts,
                           SUM(CASE WHEN gap_us IS NULL OR gap_us > {gap} * 1000000
                                    THEN 1 ELSE 0 END) OVER (
                               PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1 AS session_id
                    FROM ev
                )
                SELECT user_id, session_id, MIN(ts), MAX(ts), COUNT(*)
                FROM tagged GROUP BY 1, 2
                """
            ).fetchall()
        }
        assert got == expected
        assert len(got) > 0

    def test_single_shuffle_plan(self, spark):
        from classic_fcd_spark.operators.windows import sessionize
        from classic_fcd_spark.session import load_tables

        ev = load_tables(spark, SF_SMALL)["events"].select("user_id", "ts")
        plan = (
            sessionize(ev, ["user_id"], "ts", 600)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both window expressions must share one partitioning: exactly
        # one hash exchange in the plan (plus none hidden as BNLJ)
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        assert "BroadcastNestedLoopJoin" not in plan

    def test_streaming_twin_agrees_with_batch(self, spark, tmp_path):
        """The Structured Streaming session_window path must produce the
        SAME sessions (start, end=last event, count) as the batch
        operator over identical data — the backfill/live duality."""
        from classic_fcd_spark.operators.windows import session_stats
        from classic_fcd_spark.streaming.sessions import (
            run_session_stats_available_now,
        )

        rows = [
            (1, _ts(0)), (1, _ts(100)), (1, _ts(700)), (1, _ts(720)),
            (2, _ts(0)), (2, _ts(599)), (2, _ts(1199)),  # chained: one session
            (3, _ts(0)), (3, _ts(600)),  # exact gap: merges
            (4, _ts(0)), (4, _ts(601)),  # gap > 600: splits
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        events_dir = str(tmp_path / "events")
        df.coalesce(1).write.parquet(events_dir)
        # sentinel file (separate micro-batch): one far-future event per
        # the watermark's GLOBAL clock, so every real session closes and
        # append mode emits it; excluded from the comparison below
        spark.createDataFrame(
            [(99, _ts(10_000_000))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(events_dir)

        batch = {
            (r["user_id"], str(r["session_start"])): (
                str(r["session_end"]),
                r["n_events"],
            )
            for r in session_stats(
                spark.read.parquet(events_dir), ["user_id"], "ts", 600
            ).collect()
            if r["user_id"] != 99
        }
        streamed = {
            (r["user_id"], str(r["session_start"])): (
                str(r["session_end"]),
                r["n_events"],
            )
            for r in run_session_stats_available_now(
                spark, events_dir, str(tmp_path / "ckpt"), ["user_id"], gap_seconds=600
            )
            if r["user_id"] != 99
        }
        assert streamed == batch
        # users 1-3 each one merged session; user 4 splits into two
        assert len(batch) == 5

    def test_flush_emits_withheld_tail_without_sentinel(self, spark, tmp_path):
        """flush=True must return EVERY session — including the tail the
        watermark withholds — with NO far-future sentinel in the source.
        Completeness target = the batch twin over the same files."""
        from classic_fcd_spark.operators.windows import session_stats
        from classic_fcd_spark.streaming.sessions import (
            run_session_stats_available_now,
        )

        rows = [
            (1, _ts(0)), (1, _ts(100)),          # old session
            (1, _ts(5000)), (1, _ts(5050)),      # newer session
            (2, _ts(4900)), (2, _ts(6000)),      # two 1-event sessions
        ]
        events_dir = str(tmp_path / "events")
        # two files -> two micro-batches, so the watermark advances and
        # SOME sessions close on the stream path (the flush union must
        # dedupe against them, not just concatenate)
        spark.createDataFrame(
            rows[:2], "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(events_dir)
        spark.createDataFrame(
            rows[2:], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(events_dir)

        batch = {
            (r["user_id"], str(r["session_start"])): (
                str(r["session_end"]),
                r["n_events"],
            )
            for r in session_stats(
                spark.read.parquet(events_dir), ["user_id"], "ts", 600
            ).collect()
        }
        flushed = run_session_stats_available_now(
            spark, events_dir, str(tmp_path / "ckpt"), ["user_id"],
            gap_seconds=600, flush=True,
        )
        got = {
            (r["user_id"], str(r["session_start"])): (
                str(r["session_end"]),
                r["n_events"],
            )
            for r in flushed
        }
        assert got == batch
        assert len(flushed) == len(got)  # no duplicate emission
        # sanity: the default (flush=False) path really does withhold the
        # tail on this data — otherwise this test proves nothing
        unflushed = run_session_stats_available_now(
            spark, events_dir, str(tmp_path / "ckpt2"), ["user_id"],
            gap_seconds=600,
        )
        assert len(unflushed) < len(flushed)

    @pytest.mark.slow  # 29 s checkpoint-restart cycle (r16 tiering)
    def test_streaming_restart_resumes_from_checkpoint(self, spark, tmp_path):
        """T2 shape for sessions: a second availableNow run with the same
        checkpoint processes ONLY newly-arrived files — already-emitted
        sessions do not re-emit, later events keep forming sessions."""
        from classic_fcd_spark.streaming.sessions import (
            run_session_stats_available_now,
        )

        events_dir = str(tmp_path / "events")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [(1, _ts(0)), (1, _ts(100))], "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(events_dir)
        # flush sentinel closes the first session
        spark.createDataFrame(
            [(99, _ts(100_000))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(events_dir)

        first = run_session_stats_available_now(
            spark, events_dir, ckpt, ["user_id"], gap_seconds=600
        )
        got1 = {(r["user_id"], str(r["session_start"])) for r in first}
        assert (1, str(_ts(0))) in got1

        # new data arrives; a later flush closes it
        spark.createDataFrame(
            [(2, _ts(200_000)), (2, _ts(200_100))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(events_dir)
        spark.createDataFrame(
            [(99, _ts(300_000))], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(events_dir)

        second = run_session_stats_available_now(
            spark, events_dir, ckpt, ["user_id"], gap_seconds=600
        )
        got2 = {(r["user_id"], str(r["session_start"])): r["n_events"] for r in second}
        # user 1's session was emitted in run 1 and must NOT re-emit
        assert (1, str(_ts(0))) not in got2
        assert got2.get((2, str(_ts(200_000)))) == 2
