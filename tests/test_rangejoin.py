"""Interval-join contracts (operators/rangejoin.py).

Gates: exact equivalence with a brute-force predicate join on random
data (hypothesis), a DuckDB oracle over the driver's events table, the
half-open boundary pinned, and a plan assert that the bucketized join is
an equi-join (no BroadcastNestedLoopJoin / CartesianProduct — the whole
point of the operator).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMALL

UTC = datetime.timezone.utc


def _ts(seconds: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=seconds)


_cases = st.tuples(
    st.lists(st.integers(0, 5000), min_size=1, max_size=30, unique=True),  # event secs
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(1, 2000)),  # (start, span)
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([60, 600, 3600]),  # bucket widths
)


class TestIntervalJoin:
    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(case=_cases)
    def test_matches_bruteforce(self, spark, case):
        from classic_fcd_spark.operators.rangejoin import interval_join

        ev_secs, ivs, bucket = case
        events = spark.createDataFrame(
            [(i, _ts(s)) for i, s in enumerate(ev_secs)], "event_id long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [(j, _ts(s), _ts(s + span)) for j, (s, span) in enumerate(ivs)],
            "iv_id long, start timestamp, end timestamp",
        )
        got = {
            (r["event_id"], r["iv_id"])
            for r in interval_join(
                events, "ts", intervals, "start", "end", bucket
            ).collect()
        }
        expected = {
            (i, j)
            for i, s in enumerate(ev_secs)
            for j, (st_, span) in enumerate(ivs)
            if st_ <= s < st_ + span
        }
        assert got == expected

    def test_half_open_boundary(self, spark):
        from classic_fcd_spark.operators.rangejoin import interval_join

        events = spark.createDataFrame(
            [(1, _ts(0)), (2, _ts(3600))], "event_id long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [(10, _ts(0), _ts(3600))], "iv_id long, start timestamp, end timestamp"
        )
        got = {
            (r["event_id"], r["iv_id"])
            for r in interval_join(events, "ts", intervals, "start", "end", 3600).collect()
        }
        assert got == {(1, 10)}  # start inclusive, end exclusive

    def test_left_join_keeps_unmatched(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.rangejoin import interval_join

        events = spark.createDataFrame(
            [(1, _ts(10)), (2, _ts(99999))], "event_id long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [(10, _ts(0), _ts(100))], "iv_id long, start timestamp, end timestamp"
        )
        rows = {
            r["event_id"]: r["iv_id"]
            for r in interval_join(
                events, "ts", intervals, "start", "end", 60, how="left"
            ).collect()
        }
        assert rows == {1: 10, 2: None}

    def test_no_nested_loop_in_plan(self, spark):
        from classic_fcd_spark.operators.rangejoin import interval_join
        from classic_fcd_spark.session import load_tables

        events = load_tables(spark, SF_SMALL)["events"]
        iv = spark.createDataFrame(
            [(j, _ts(j * 7200), _ts(j * 7200 + 3600)) for j in range(50)],
            "iv_id long, start timestamp, end timestamp",
        )
        out = interval_join(events.select("event_id", "ts"), "ts", iv, "start", "end")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
        assert "CartesianProduct" not in plan, plan[:1500]

    def test_duckdb_oracle_on_events(self, spark):
        """Maintenance-window enrichment over the driver's events table,
        verified against DuckDB's native IEJoin on the same parquet."""
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.rangejoin import interval_join
        from classic_fcd_spark.session import load_tables

        events = load_tables(spark, SF_SMALL)["events"].select("event_id", "ts")
        lo = events.agg(F.min("ts")).collect()[0][0]
        base = int(lo.replace(tzinfo=UTC).timestamp())
        ivs = [
            (
                j,
                datetime.datetime.fromtimestamp(base + j * 7200, UTC).replace(tzinfo=None),
                datetime.datetime.fromtimestamp(base + j * 7200 + 3600, UTC).replace(tzinfo=None),
            )
            for j in range(40)
        ]
        intervals = spark.createDataFrame(
            ivs, "iv_id long, start timestamp, end timestamp"
        )
        got = {
            (r["event_id"], r["iv_id"])
            for r in interval_join(events, "ts", intervals, "start", "end", 1800).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')"
        )
        iv_rows = ", ".join(
            f"({j}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for j, s, e in ivs
        )
        expected = {
            (r[0], r[1])
            for r in con.sql(
                f"SELECT e.event_id, i.iv_id FROM events e "
                f"JOIN (VALUES {iv_rows}) i(iv_id, s, en) "
                f"ON e.ts >= i.s AND e.ts < i.en"
            ).fetchall()
        }
        assert got == expected
        assert len(got) > 0
