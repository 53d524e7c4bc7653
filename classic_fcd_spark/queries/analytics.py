"""Ordered/temporal analytics inventory: as-of join and time-weighted
average — the two operator families no fcd-shaped query covers.

r3 consolidation (driver 50-row gate): daily_event_tally folded into
fcd_vote_tally (A20 pivot), candle_buckets_15m into fcd_price_buckets_15m
(A18), props_json_rollup into fcd_last_hour_ops + fcd_delegation_txs
(F11/F12 json paths), union_merge_volumes into fcd_tx_volume_minute
(D2 Send+MultiSend merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classic_fcd_spark.operators.asof import asof_join
from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.session import load_tables


# ---------------------------------------------------------------------------
# J10: as-of (point-in-time) join — latest purchase value at-or-before each
# view event, per user.
# ---------------------------------------------------------------------------
@register(
    "asof_latest_purchase",
    """
    SELECT v.user_id, v.event_id,
           strftime(CAST(v.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
           p.value AS last_purchase_value
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
    doc="J10 as-of join ('price one day before', src/service/market/helper.ts:21-40) "
    "as a single-shuffle union+window — no per-row correlated lookups",
)
def asof_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pvalue")
    )
    joined = asof_join(views, purchases, ["user_id"], "ts", "pts", ["pvalue"])
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("pvalue_asof").alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# W9: time-weighted average — the reference's hardest operator.
# ---------------------------------------------------------------------------
@register(
    "time_weighted_value",
    """
    WITH seg AS (
        SELECT user_id, CAST(value AS DECIMAL(18,6)) AS value,
               epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w) - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id,
           CAST(CAST(SUM(value * dur_us) * 1000000 AS HUGEINT)
                // CAST(SUM(dur_us) AS HUGEINT) AS BIGINT) AS twavg_e6,
           COUNT(dur_us) AS n_segments
    FROM seg
    GROUP BY user_id
    HAVING COUNT(dur_us) > 0
    """,
    doc="W9 time-weighted average voting power "
    "(src/service/staking/helper.ts:142-211): the reference walks events "
    "backwards in a JS loop per validator; here one lead() window + one "
    "grouped sum — one shuffle, scales to billions of events. Last (open) "
    "segment excluded: lead()=null drops it on both engines. Numeric "
    "policy: duration stays exact integer microseconds, value is decimal "
    "before the multiply, and the ratio is emitted as floor(avg*1e6) via "
    "integer division — fully exact (DuckDB's wide-decimal→double cast is "
    "not correctly rounded, so a double ratio cannot hash-match).",
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts")
    seg = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("value"),
        (F.unix_micros(F.lead("ts", 1).over(w)) - F.unix_micros(F.col("ts"))).alias(
            "dur_us"
        ),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.expr(
                "CAST(CAST(SUM(value * dur_us) * 1000000 AS DECIMAL(38,0))"
                " div CAST(SUM(dur_us) AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("twavg_e6"),
            F.count("dur_us").alias("n_segments"),
        )
        .filter(F.col("n_segments") > 0)
    )
