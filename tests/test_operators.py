"""Unit tests for the reusable operator library (SURVEY §2.3/2.5/2.6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from classic_fcd_spark.operators.asof import asof_join
from classic_fcd_spark.operators.pagination import keyset_page_df
from classic_fcd_spark.operators.topk import top_k, with_share_of_total
from classic_fcd_spark.operators.windows import (
    cumulative,
    day_over_day,
    latest_per_key,
    moving_avg,
    time_weighted_avg,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_latest_at_or_before(self, spark):
        # J10: "price one day before" — latest right row <= left ts per key.
        prices = spark.createDataFrame(
            [
                ("ukrw", _ts("2021-01-01 00:00:00"), 1.0),
                ("ukrw", _ts("2021-01-02 00:00:00"), 2.0),
                ("uusd", _ts("2021-01-01 12:00:00"), 10.0),
            ],
            ["denom", "pts", "price"],
        )
        lookups = spark.createDataFrame(
            [
                ("ukrw", _ts("2021-01-01 12:00:00")),  # → 1.0
                ("ukrw", _ts("2021-01-02 00:00:00")),  # boundary → 2.0
                ("uusd", _ts("2021-01-01 00:00:00")),  # before any → null
            ],
            ["denom", "ts"],
        )
        out = {
            (r["denom"], r["ts"].isoformat()): r["price_asof"]
            for r in asof_join(
                lookups, prices, ["denom"], "ts", "pts", ["price"]
            ).collect()
        }
        assert out[("ukrw", "2021-01-01T12:00:00")] == 1.0
        assert out[("ukrw", "2021-01-02T00:00:00")] == 2.0
        assert out[("uusd", "2021-01-01T00:00:00")] is None


class TestWindows:
    def test_cumulative_and_dod(self, spark):
        df = spark.createDataFrame(
            [("d1", 1), ("d2", 3), ("d3", 2)], ["day", "v"]
        )
        cum = {r["day"]: r["c"] for r in cumulative(df, "day", "v", "c").collect()}
        assert cum == {"d1": 1, "d2": 4, "d3": 6}
        dod = {r["day"]: r["d"] for r in day_over_day(df, "day", "v", "d").collect()}
        assert dod == {"d1": None, "d2": 2, "d3": -1}

    def test_moving_avg(self, spark):
        df = spark.createDataFrame([("d1", 2.0), ("d2", 4.0), ("d3", 6.0)], ["day", "v"])
        got = {r["day"]: r["m"] for r in moving_avg(df, "day", "v", "m", 2).collect()}
        assert got == {"d1": 2.0, "d2": 3.0, "d3": 5.0}

    def test_latest_per_key_tiebreak(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "x"), ("a", 1, "y"), ("b", 2, "z")], ["k", "o", "v"]
        )
        got = {r["k"]: r["v"] for r in latest_per_key(df, ["k"], "o", ["v"]).collect()}
        assert got == {"a": "y", "b": "z"}

    def test_time_weighted_avg(self, spark):
        # W9: value 10 for 30s then 20 for 10s → (10*30 + 20*10)/40 = 12.5
        df = spark.createDataFrame(
            [
                ("v1", _ts("2021-01-01 00:00:00"), 10.0),
                ("v1", _ts("2021-01-01 00:00:30"), 20.0),
            ],
            ["val", "ts", "power"],
        )
        end = F.lit("2021-01-01 00:00:40").cast("timestamp")
        got = time_weighted_avg(df, ["val"], "ts", "power", end).collect()[0]
        assert got["twavg"] == 12.5


class TestPaginationTopK:
    def test_keyset_page(self, spark):
        df = spark.range(1, 101).withColumnRenamed("id", "k")
        rows = keyset_page_df(df, "k", 10, before=50, descending=True).collect()
        assert [r["k"] for r in rows] == list(range(49, 38, -1))  # 11 = n+1

    def test_top_k_and_share(self, spark):
        df = spark.createDataFrame(
            [("a", 10.0), ("b", 30.0), ("c", 60.0)], ["acct", "amt"]
        )
        shared = with_share_of_total(df, "amt")
        got = {r["acct"]: r["share"] for r in shared.collect()}
        assert abs(got["c"] - 0.6) < 1e-12
        top = top_k(shared, "amt", 2, "acct").collect()
        assert [r["acct"] for r in top] == ["c", "b"]


class TestPlanQuality:
    """Plan audits: the properties that make these queries scale must be
    visible in the physical plan, not assumed (brief: '.explain' the plan
    and iterate until it's the plan you'd want)."""

    def _plan(self, spark, name):
        from classic_fcd_spark.queries import query_fn_map

        df = query_fn_map()[name](spark, SF_SMALL)
        return df._jdf.queryExecution().executedPlan().toString()

    def _pricing_plan(self, spark):
        # pricing_summary left the driver registry in r9 (slot ->
        # scd2_order_history) but keeps its plan audits here
        from classic_fcd_spark.queries.core import pricing_summary

        df = pricing_summary(spark, SF_SMALL)
        return df._jdf.queryExecution().executedPlan().toString()

    def test_filter_pushes_to_parquet_scan(self, spark):
        plan = self._pricing_plan(spark)
        assert "PushedFilters: [" in plan
        assert "l_shipdate" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]

    def test_dim_joins_broadcast(self, spark):
        # revenue_by_nation is the unregistered bench workload (heaviest
        # multi-way join) — audit its plan directly
        from classic_fcd_spark.queries.core import revenue_by_nation

        df = revenue_by_nation(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_scan_prunes_columns(self, spark):
        # pricing_summary touches 7 of lineitem's 16 columns; the scan's
        # ReadSchema must not include untouched ones like l_comment
        plan = self._pricing_plan(spark)
        read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
        assert "l_comment" not in read_schema
        assert "l_quantity" in read_schema


class TestKeysetServingVariant:
    def test_keyset_page_rows_and_cursor(self, spark):
        from classic_fcd_spark.operators.pagination import keyset_page

        df = spark.range(1, 101).withColumnRenamed("id", "k")
        rows, cursor = keyset_page(df, "k", 10, before=50, descending=True)
        assert [r["k"] for r in rows] == list(range(49, 39, -1))
        assert cursor == 40
        rows2, cursor2 = keyset_page(df, "k", 10, before=cursor, descending=True)
        assert [r["k"] for r in rows2] == list(range(39, 29, -1))
        # exhausted tail: fewer than limit rows -> no cursor
        rows3, cursor3 = keyset_page(df, "k", 10, before=5, descending=True)
        assert [r["k"] for r in rows3] == [4, 3, 2, 1] and cursor3 is None


class TestRegistryGate:
    def test_inventory_fits_driver_window(self):
        """The external driver checks exactly the first MAX_GATED
        registered queries; the registry must hold the line so no entry
        silently escapes the correctness gate (the r2 finding)."""
        from classic_fcd_spark.queries.registry import (
            MAX_GATED,
            QUERIES,
            QueryDef,
            query_fn_map,
        )

        n = len(query_fn_map())
        assert n <= MAX_GATED
        # pushing past the cap must fail loudly, not silently ungate
        try:
            for i in range(MAX_GATED - n + 1):
                QUERIES[f"__overflow_{i}"] = QueryDef(
                    fn=lambda s, d: None, oracle="SELECT 1", doc="overflow probe"
                )
            try:
                query_fn_map()
                raise AssertionError("registry accepted > MAX_GATED entries")
            except RuntimeError as e:
                assert "gates only" in str(e)
        finally:
            for k in [k for k in QUERIES if k.startswith("__overflow_")]:
                del QUERIES[k]

    def test_proposals_dims_broadcast(self, spark):
        """fcd_proposals joins two bounded dims (chain listing, validator
        accounts) — both must broadcast, never shuffle the vote side."""
        from classic_fcd_spark.queries.fcd_read import fcd_proposals

        plan = (
            fcd_proposals(spark, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the 7x20 proposal-x-validator expansion is an explicit broadcast
        # cross join (bounded dims); the vote-side joins must be hash joins
        assert "BroadcastHashJoin" in plan


class TestPlanAudit:
    def test_plan_audit_clean(self, spark):
        """Every registered query's physical plan is free of
        non-allowlisted scale red flags (cartesian / nested-loop joins,
        unpartitioned windows) — scripts/plan_audit.py is the reviewed
        allowlist; a new flag here means a new hand review, not a
        test fix."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "plan_audit",
            os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_audit.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from classic_fcd_spark.queries import query_fn_map

        qmap = query_fn_map()
        flagged = {}
        for name, fn in qmap.items():
            hits, _ = mod.audit(spark, name, fn)
            if hits:
                flagged[name] = hits
        assert flagged == {}


class TestDayGrainWindowBoundedness:
    """The accepted single-partition windows (queries/core.py day-grain
    series): pin that the window INPUT cardinality equals the number of
    calendar days in the corpus — the boundedness argument for running
    them unpartitioned."""

    def test_window_input_is_calendar_days(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.session import load_tables
        from tests.conftest import SF_SMALL

        ev = load_tables(spark, SF_SMALL)["events"]
        n_days = ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("d")
        ).distinct().count()
        first_seen = ev.groupBy("user_id").agg(
            F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day")
        )
        per_day = first_seen.groupBy("day").agg(F.count("*").alias("n"))
        assert per_day.count() <= n_days
        # a century of days would still be a bounded single task
        assert n_days < 40_000


class TestPricingSummaryOracle:
    """pricing_summary left the driver window in r9 (slot rotated to
    scd2_order_history); this is its oracle gate now — the same DuckDB
    SQL that drove its green r1-r8 driver rows, over the same parquet.
    The grouped-decimal-sums pattern and the money policy stay
    driver-gated via fcd_dashboard / fcd_minute_fees."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.core import (
            PRICING_SUMMARY_ORACLE_SQL,
            pricing_summary,
        )

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/lineitem.parquet')"
        )
        cols = [
            "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
            "avg_qty", "avg_price", "avg_disc", "count_order",
        ]
        got = {
            (r["l_returnflag"], r["l_linestatus"]): tuple(r[c] for c in cols)
            for r in pricing_summary(spark, SF_SMALL).collect()
        }
        want = {
            (r[0], r[1]): tuple(r[2:])
            for r in con.sql(PRICING_SUMMARY_ORACLE_SQL).fetchall()
        }
        # exact (bit-identical) float compare — the decimal money policy
        assert got == want
        assert len(got) > 0
