"""Core relational query inventory: aggregations, windows, pagination.

Every query here is the Spark-first re-expression of a reference operator
family (file:line citations per query doc) over the driver's TPC-H-ish
tables; the paired oracle is ANSI SQL for DuckDB.

r3 consolidation: the r2 TPC-H pattern-twins (minute_rollup,
daily_active_users, latest_event_per_user, top_customers_share,
orders_with_shipped_items, customers_without_orders, daily_event_tally…)
were folded into their fcd-shaped siblings so the whole inventory fits
the driver's 50-row correctness gate — each cut query's operators remain
oracle-gated by the surviving twin named in COVERAGE.md.
`revenue_by_nation` stays as a bench/plan-audit workload (the heaviest
multi-way shuffle join) but is no longer a registry entry: J5/J6/A8 are
gated by fcd_validator_returns / fcd_rewards_converted / pricing_summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classic_fcd_spark.operators.pagination import keyset_page_df
from classic_fcd_spark.operators.windows import cumulative, day_over_day
from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.session import load_tables


def _dec(col, prec=28, scale=6):
    return F.col(col).cast(f"decimal({prec},{scale})") if isinstance(col, str) else col.cast(f"decimal({prec},{scale})")


def _day(col):
    return F.date_format(col, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# A8/A9-family: grouped sums with derived expressions (flagship).
#
# Oracle policy note (r7, found by the sf1 sweep): decimal-sum -> double
# conversions in the ORACLES route through VARCHAR
# (CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE)) because DuckDB's direct
# DECIMAL -> DOUBLE cast is not correctly rounded at ~1e10 magnitudes
# (1 ulp high on 27864155010.941590), while Spark's BigDecimal
# .doubleValue and DuckDB's string->double parse both are.  The Spark
# side needs no change — the exact decimal sum is identical; only the
# final float rendering differed.
# r9 slot rotation: pricing_summary left the driver window (slot ->
# scd2_order_history); the grouped-decimal-sums pattern and the decimal
# money policy stay driver-gated via fcd_dashboard / fcd_minute_fees /
# fcd_rewards_converted, and this query keeps its oracle as an in-test
# gate (tests/test_operators.py TestPricingSummaryOracle), its bench
# slot, and the plan audits.
# ---------------------------------------------------------------------------
PRICING_SUMMARY_ORACLE_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9 grouped daily sums; decimal money policy (SURVEY §1.3);
    reference src/collector/dashboard/rewardsInfo.ts:18-44."""
    li = load_tables(spark, sf_dir)["lineitem"]
    base = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc_price = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
    return (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A11 + W1: cumulative account growth via first-seen-date (the O(n) rewrite
# of the reference's per-day DISTINCT subquery).
# ---------------------------------------------------------------------------
@register(
    "account_growth",
    """
    WITH first_seen AS (
        SELECT user_id, MIN(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS day
        FROM events GROUP BY user_id
    ), per_day AS (
        SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS total_users
    FROM per_day
    """,
    doc="A11 cumulative distinct accounts (O(n) first-seen rewrite of the "
    "reference's '10x faster' subquery, src/collector/dashboard/accountGrowth.ts:12-27) "
    "+ W1 running sum (src/service/dashboard/getAccountGrowth.ts:6-55). "
    "A12 daily-active is gated by fcd_dashboard's active_accounts.",
)
def account_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    first_seen = ev.groupBy("user_id").agg(F.min(_day("ts")).alias("day"))
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    # The cumulative window below is deliberately UNPARTITIONED and fires
    # Spark's single-partition WindowExec warning.  That is accepted, not
    # a scale risk: its input is per_day — one row per CALENDAR DAY after
    # the aggregation — so even a century of data is ~36.5k narrow rows
    # on one task.  A global ordered series has no partition key by
    # definition; the heavy work (the per-user first-seen scan) is
    # already distributed above.  Cardinality pinned in
    # tests/test_operators.py::TestDayGrainWindowBoundedness.
    out = cumulative(per_day, "day", "new_users", "total_users")
    # pin int64 on both engines: DuckDB's windowed SUM yields HUGEINT
    return out.withColumn("total_users", F.col("total_users").cast("long"))


# ---------------------------------------------------------------------------
# J5/J6 + A8: multi-way join with broadcast dims — bench/plan-audit
# workload (unregistered; see module docstring).
# ---------------------------------------------------------------------------
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 broadcast dim join + A8 grouped sums over the heaviest shuffle
    join in the TPC-H-ish set; reference src/collector/dashboard/
    blockReward.ts:14-42.  Kept for bench.py + the broadcast plan test."""
    t = load_tables(spark, sf_dir)
    # nation/region are bounded dims (25/5 rows at any scale) → broadcast;
    # lineitem⋈orders is the big shuffle join, AQE handles skew.
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# L1: keyset pagination.
# ---------------------------------------------------------------------------
@register(
    "keyset_page_orders",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str, o_orderpriority
    FROM orders
    WHERE o_orderkey < 5000
    ORDER BY o_orderkey DESC
    LIMIT 101
    """,
    doc="L1 keyset pagination (limit n+1, cursor = n-th id); reference "
    "src/service/transaction/getTxList.ts:138-160",
)
def keyset_page_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    page = keyset_page_df(orders, "o_orderkey", 100, before=5000, descending=True)
    return page.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
        "o_orderpriority",
    )


# ---------------------------------------------------------------------------
# W5 + W4: moving average and day-over-day diff on a daily series.
# ---------------------------------------------------------------------------
@register(
    "daily_volume_ma",
    """
    WITH daily AS (
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS volume
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT day, volume,
           CAST(CAST(SUM(CAST(volume AS DECIMAL(28,6))) OVER w10 AS VARCHAR) AS DOUBLE)
             / COUNT(*) OVER w10 AS ma10,
           volume - LAG(volume, 1) OVER (ORDER BY day) AS dod_diff
    FROM daily
    WINDOW w10 AS (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    doc="W5 10-day moving average (src/service/dashboard/getStakingReturn.ts:15-43) "
    "+ W4 lag diff (getRegisteredAccounts.ts:4-30) + A9 daily volume "
    "(src/collector/dashboard/txVolume.ts:14-41)",
)
def daily_volume_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(_day("ts").alias("day"))
        .agg(F.sum(_dec("value")).cast("double").alias("volume"))
    )
    # exact decimal window sum / count instead of AVG-over-double: window
    # AVG over floats may associate differently across engines (oracle parity)
    # Unpartitioned w10/lag windows: accepted single-partition WindowExec
    # (same boundedness argument as account_growth — input is one row per
    # calendar day post-aggregation, bounded by elapsed days)
    from pyspark.sql import Window

    w10 = Window.orderBy("day").rowsBetween(-9, Window.currentRow)
    out = daily.withColumn(
        "ma10",
        F.sum(_dec("volume")).over(w10).cast("double") / F.count("*").over(w10),
    )
    return day_over_day(out, "day", "volume", "dod_diff")
