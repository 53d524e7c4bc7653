"""SCD2 snapshot-collapse contracts: DuckDB oracle equivalence, run
semantics (flapping values reopen rows), point-in-time reconstruction,
and the single-shuffle plan."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _snaps(spark):
    rows = [
        # entity A: power changes 100 -> 100 -> 120 -> 120 -> 100 (flap back)
        ("A", "2024-01-01", 100, "ok"),
        ("A", "2024-01-02", 100, "ok"),
        ("A", "2024-01-03", 120, "ok"),
        ("A", "2024-01-04", 120, "ok"),
        ("A", "2024-01-05", 100, "ok"),
        # entity B: status flips, power constant; NULL -> value counts
        ("B", "2024-01-01", 50, None),
        ("B", "2024-01-02", 50, "ok"),
        ("B", "2024-01-03", 50, "ok"),
        ("B", "2024-01-04", 50, "jailed"),
    ]
    df = spark.createDataFrame(
        rows, "entity string, day string, power long, status string"
    )
    return df.withColumn("day", F.to_date("day"))


class TestScd2:
    def test_matches_duckdb_oracle_and_run_semantics(self, spark):
        from classic_fcd_spark.operators.windows import scd2_from_snapshots

        out = scd2_from_snapshots(
            _snaps(spark), ["entity"], "day", ["power", "status"]
        )
        got = {
            (r["entity"], str(r["valid_from"])): (
                r["power"],
                r["status"],
                str(r["valid_to"]) if r["valid_to"] else None,
                r["is_current"],
            )
            for r in out.collect()
        }
        # flap back to 100 opens a NEW row (runs, not value dedup)
        assert got[("A", "2024-01-05")] == (100, "ok", None, True)
        assert got[("A", "2024-01-01")] == (100, "ok", "2024-01-03", False)
        assert got[("B", "2024-01-01")] == (50, None, "2024-01-02", False)

        oracle = duckdb.sql(
            """
            WITH s(entity, day, power, status) AS (VALUES
                ('A', DATE '2024-01-01', 100, 'ok'),
                ('A', DATE '2024-01-02', 100, 'ok'),
                ('A', DATE '2024-01-03', 120, 'ok'),
                ('A', DATE '2024-01-04', 120, 'ok'),
                ('A', DATE '2024-01-05', 100, 'ok'),
                ('B', DATE '2024-01-01', 50, NULL),
                ('B', DATE '2024-01-02', 50, 'ok'),
                ('B', DATE '2024-01-03', 50, 'ok'),
                ('B', DATE '2024-01-04', 50, 'jailed')),
            d AS (
                SELECT *,
                       lag(power) OVER w IS DISTINCT FROM power
                       OR lag(status) OVER w IS DISTINCT FROM status
                       OR lag(day) OVER w IS NULL AS chg
                FROM s WINDOW w AS (PARTITION BY entity ORDER BY day)
            ),
            starts AS (SELECT entity, day, power, status FROM d WHERE chg)
            SELECT entity, day AS valid_from, power, status,
                   lead(day) OVER (PARTITION BY entity ORDER BY day) AS valid_to
            FROM starts
            """
        ).fetchall()
        expected = {
            (r[0], str(r[1])): (
                r[2],
                r[3],
                str(r[4]) if r[4] else None,
            )
            for r in oracle
        }
        assert {k: v[:3] for k, v in got.items()} == expected

    def test_point_in_time_reconstruction(self, spark):
        """Joining the collapsed table on valid_from <= t < valid_to must
        reproduce the raw snapshot at every snapshot date."""
        from classic_fcd_spark.operators.windows import scd2_from_snapshots

        snaps = _snaps(spark)
        hist = scd2_from_snapshots(snaps, ["entity"], "day", ["power", "status"])
        probe = snaps.alias("s").join(
            hist.alias("h"),
            (F.col("s.entity") == F.col("h.entity"))
            & (F.col("s.day") >= F.col("h.valid_from"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("s.day") < F.col("h.valid_to"))
            ),
        )
        mism = probe.filter(
            (F.col("s.power") != F.col("h.power"))
            | ~F.col("s.status").eqNullSafe(F.col("h.status"))
        )
        assert probe.count() == snaps.count()  # exactly one interval per snap
        assert mism.count() == 0

    def test_single_shuffle_plan(self, spark):
        from classic_fcd_spark.operators.windows import scd2_from_snapshots

        out = scd2_from_snapshots(
            _snaps(spark), ["entity"], "day", ["power", "status"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
