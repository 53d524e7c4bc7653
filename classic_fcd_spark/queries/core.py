"""Core relational query inventory: aggregations, joins, windows, pagination.

Every query here is the Spark-first re-expression of a reference operator
family (file:line citations per query doc) over the driver's TPC-H-ish
tables; the paired oracle is ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from classic_fcd_spark.operators.pagination import keyset_page_df
from classic_fcd_spark.operators.topk import top_k
from classic_fcd_spark.operators.windows import (
    cumulative,
    day_over_day,
    latest_per_key,
)
from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.session import load_tables


def _dec(col, prec=28, scale=6):
    return F.col(col).cast(f"decimal({prec},{scale})") if isinstance(col, str) else col.cast(f"decimal({prec},{scale})")


def _day(col):
    return F.date_format(col, "yyyy-MM-dd")


def _minute(col):
    return F.date_format(F.date_trunc("minute", col), "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# A8/A9-family: grouped sums with derived expressions (flagship).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A8/A9 grouped daily sums; decimal money policy (SURVEY §1.3); "
    "reference src/collector/dashboard/rewardsInfo.ts:18-44",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# A2-A6/T3: minute-grain rollup of a stream table.
# ---------------------------------------------------------------------------
@register(
    "minute_rollup",
    """
    SELECT strftime(date_trunc('minute', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS minute,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    doc="A2-A6 minute fee/volume rollups + T3 minute-boundary trigger; "
    "reference src/collector/block/reward.ts:16-81, network.ts:14-107",
)
def minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(
            _minute(F.col("ts")).alias("minute"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# A12: daily active accounts (count distinct per day).
# ---------------------------------------------------------------------------
@register(
    "daily_active_users",
    """
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS active_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
    doc="A12 daily active accounts; reference src/collector/dashboard/accountGrowth.ts:29-49",
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(_day("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.count("*").alias("n_events"),
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
    "+ W1 running sum (src/service/dashboard/getAccountGrowth.ts:6-55)",
)
def account_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    first_seen = ev.groupBy("user_id").agg(F.min(_day("ts")).alias("day"))
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    out = cumulative(per_day, "day", "new_users", "total_users")
    # pin int64 on both engines: DuckDB's windowed SUM yields HUGEINT
    return out.withColumn("total_users", F.col("total_users").cast("long"))


# ---------------------------------------------------------------------------
# J5/J6 + A8: multi-way join with broadcast dims.
# ---------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="J5 broadcast dim join + J6 (date,denom)-style lookup + A8 grouped sums; "
    "reference src/collector/dashboard/blockReward.ts:14-42",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# W7/W8/D6: latest row per key.
# ---------------------------------------------------------------------------
@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, event_type, value,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="W7/W8 latest-row-per-key (DISTINCT ON) + D6 latest-vote dedup; "
    "reference src/service/dashboard/getGeneralInfo.ts:21-37, "
    "src/service/governance/helper/voteSummary.ts:124",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return latest_per_key(ev, ["user_id"], "ts", tiebreak_cols=["event_id"]).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
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
# W11 + A21/A22: ranking with share-of-total.
# ---------------------------------------------------------------------------
@register(
    "top_customers_share",
    """
    SELECT c_custkey, c_name, c_acctbal,
           CAST(c_acctbal AS DOUBLE)
             / CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER () AS DOUBLE) AS share,
           ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="W11 richlist ranking + A22 share-of-total + A21 delegator weights; "
    "reference src/service/treasury/richList.ts:9-31, src/collector/richlist.ts:15-37",
)
def top_customers_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir)["customer"]
    total = F.sum(F.col("c_acctbal").cast("decimal(18,2)")).over(Window.partitionBy())
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    enriched = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        (F.col("c_acctbal") / total.cast("double")).alias("share"),
        F.row_number().over(w).alias("rnk"),
    )
    return top_k(enriched, "c_acctbal", 20, "c_custkey")


# ---------------------------------------------------------------------------
# J4: semi join.
# ---------------------------------------------------------------------------
@register(
    "orders_with_shipped_items",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_totalprice
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    )
    GROUP BY o_orderstatus
    """,
    doc="J4 semi-join (page of tx ids ⋉ tx); reference "
    "src/service/transaction/getTxList.ts:138-167",
)
def orders_with_shipped_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    shipped = t["lineitem"].filter(
        F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    return (
        t["orders"]
        .join(shipped, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# J9/D1: anti join.
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
    doc="J9 anti-join (delegated-but-not-voted) + D1 except-set; reference "
    "src/service/governance/getProposal.ts:36-57, "
    "src/collector/gov/removeDeletedProposals.ts:10-33. Predicate on the "
    "probe side keeps the result non-empty on the synthetic data (202 rows "
    "at sf0.01) so the hash check is meaningful.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big_orders = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# W5 + W4: moving average and day-over-day diff on a daily series.
# ---------------------------------------------------------------------------
@register(
    "daily_volume_ma",
    """
    WITH daily AS (
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS volume
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT day, volume,
           CAST(SUM(CAST(volume AS DECIMAL(28,6))) OVER w10 AS DOUBLE)
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
    w10 = Window.orderBy("day").rowsBetween(-9, Window.currentRow)
    out = daily.withColumn(
        "ma10",
        F.sum(_dec("volume")).over(w10).cast("double") / F.count("*").over(w10),
    )
    return day_over_day(out, "day", "volume", "dod_diff")
