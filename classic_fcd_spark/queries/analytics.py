"""Ordered/temporal analytics inventory: as-of join, pivot tally,
time-weighted average, candle buckets, JSON extraction, union-merge.

These cover the reference operator families that the core module doesn't:
J10 (price-at-boundary), A20 (vote tally pivot), W9 (time-weighted voting
power — the hardest reference operator), A18 (candle price buckets),
F11/P2 (jsonb path access), D2/A5 (union + re-aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classic_fcd_spark.operators.asof import asof_join
from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.session import load_tables

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _dec(col, prec=28, scale=6):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _day(col):
    return F.date_format(col, "yyyy-MM-dd")


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
# A20: tally pivot — the vote-count-by-option shape as groupBy().pivot().
# ---------------------------------------------------------------------------
@register(
    "daily_event_tally",
    """
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    """,
    doc="A20 vote tally (count by option, pivoted) — "
    "src/service/governance/helper/voteSummary.ts:15-78; explicit pivot "
    "value list keeps the plan a single pass (no distinct-values pre-scan)",
)
def daily_event_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    out = (
        ev.groupBy(_day("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
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


# ---------------------------------------------------------------------------
# A18: candle-style interval buckets (15-minute), per event type.
# ---------------------------------------------------------------------------
@register(
    "candle_buckets_15m",
    """
    SELECT strftime(make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 * 1000000 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS bucket_start,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_value,
           strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS first_ts,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="A18 candle price buckets (DATE_TRUNC hour + TRUNC(minute/N), "
    "src/service/market/getPrice.ts:37-90) as tumbling window(ts, 15 min); "
    "groupBy on the window start is a plain hash aggregate",
)
def candle_buckets_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            (F.sum(_dec("value")).cast("double") / F.count("*")).alias("avg_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.count("*").alias("n"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
            "avg_value",
            "first_ts",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# F11/P2: JSON path extraction + predicate on extracted field.
# ---------------------------------------------------------------------------
@register(
    "props_json_rollup",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS distinct_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
    doc="F11 jsonb path access (data->'tx'->'value'->'msg', e.g. "
    "rewardAndCommissionSum.ts:12-16) + P2 containment predicate on the "
    "extracted field; get_json_object stays JVM-side (no UDF)",
)
def props_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("distinct_k"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# D2 + A5: union of two aggregates, then merge (re-aggregate).
# ---------------------------------------------------------------------------
@register(
    "union_merge_volumes",
    """
    WITH a AS (
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS vol
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), b AS (
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS vol
        FROM events WHERE event_type = 'click' GROUP BY 1
    )
    SELECT day, CAST(SUM(vol) AS DOUBLE) AS total_vol, COUNT(*) AS n_sources
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    GROUP BY day
    """,
    doc="D2 union+merge of DenomMaps (Send + MultiSend volumes, "
    "src/collector/block/network.ts:100-107) as unionByName → re-aggregate",
)
def union_merge_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]

    def daily(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy(_day("ts").alias("day"))
            .agg(F.sum(_dec("value")).cast("decimal(28,6)").alias("vol"))
        )

    return (
        daily("purchase")
        .unionByName(daily("click"))
        .groupBy("day")
        .agg(
            F.sum("vol").cast("double").alias("total_vol"),
            F.count("*").alias("n_sources"),
        )
    )
