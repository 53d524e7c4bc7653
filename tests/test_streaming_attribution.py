"""Stream-stream attribution join: exact batch/stream agreement + a
DuckDB oracle for the batch twin + bounded-state plan evidence."""

from __future__ import annotations

import os

import duckdb

from tests.conftest import SF_SMALL

_HORIZON = 3600


class TestStreamingAttribution:
    def test_stream_equals_batch_equals_duckdb(self, spark, tmp_path):
        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.streaming.attribution import (
            attribution_batch,
            run_attribution_available_now,
        )

        import time

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # file-source needs a directory; split the events into two
        # time-ordered drops so the join spans micro-batches
        src_file = os.path.join(SF_SMALL, "events.parquet")
        t = pq.read_table(src_file)
        lo = pc.quantile(pc.cast(t["ts"], "int64"), 0.5)[0].as_py()
        events_dir = str(tmp_path / "events")
        os.makedirs(events_dir)
        first = t.filter(pc.less_equal(pc.cast(t["ts"], "int64"), int(lo)))
        second = t.filter(pc.greater(pc.cast(t["ts"], "int64"), int(lo)))
        p1 = os.path.join(events_dir, "drop1.parquet")
        p2 = os.path.join(events_dir, "drop2.parquet")
        pq.write_table(first, p1)
        pq.write_table(second, p2)
        now = time.time()
        os.utime(p1, (now - 100, now - 100))
        os.utime(p2, (now, now))

        got = run_attribution_available_now(
            spark, events_dir, str(tmp_path / "chk"), _HORIZON
        )
        got_pairs = {
            (r["view_id"], r["purchase_id"]): r["lag_secs"] for r in got
        }
        assert len(got_pairs) == len(got)  # emitted exactly once each

        ev = load_tables(spark, SF_SMALL)["events"]
        batch = attribution_batch(ev, _HORIZON)
        batch_pairs = {
            (r["view_id"], r["purchase_id"]): r["lag_secs"]
            for r in batch.collect()
        }
        assert got_pairs == batch_pairs
        assert len(got_pairs) > 0

        oracle = duckdb.sql(
            f"""
            SELECT v.event_id AS view_id, p.event_id AS purchase_id,
                   CAST(floor((epoch_us(CAST(p.ts AS TIMESTAMP))
                        - epoch_us(CAST(v.ts AS TIMESTAMP))) / 1000000.0) AS BIGINT)
                       AS lag_secs
            FROM read_parquet('{events_dir}/*.parquet') v
            JOIN read_parquet('{events_dir}/*.parquet') p
              ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND p.ts >= v.ts
             AND p.ts < v.ts + INTERVAL {_HORIZON} SECOND
            """
        ).fetchall()
        expected = {(r[0], r[1]): r[2] for r in oracle}
        assert got_pairs == expected

    def test_plan_shows_watermarked_stateful_join(self, spark):
        from classic_fcd_spark.streaming.attribution import attribution_stream

        events_dir = os.path.join(SF_SMALL, "events.parquet")
        plan = attribution_stream(spark, events_dir)
        # unbound stream-stream join: both watermarks present in the
        # analyzed plan (the state-retention bound derives from them)
        s = plan._jdf.queryExecution().analyzed().toString()
        assert s.lower().count("eventtimewatermark") >= 2, s[:2000]
