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


# ---------------------------------------------------------------------------
# Interval (range) join — promoted to the driver gate in r5 (the
# fcd_market_cap slot; that A6/J6 pattern stays driver-green via
# fcd_rewards_converted).  OSS Spark compiles BETWEEN joins to
# BroadcastNestedLoopJoin; operators/rangejoin.py bucketizes instead —
# this row proves the bucket math + residual filter exact against
# DuckDB's native IEJoin plan for the same predicate.
# ---------------------------------------------------------------------------
_IV_N = 200  # intervals: [t0 + j*7200s, t0 + j*7200s + 3600s), j = 0..199
_IV_STEP = 7200
_IV_SPAN = 3600


@register(
    "interval_joined_events",
    f"""
    WITH base AS (SELECT CAST(min(ts) AS TIMESTAMP) AS t0 FROM events),
    iv AS (
        SELECT gs.j AS iv_id,
               t0 + to_seconds(CAST(gs.j * {_IV_STEP} AS BIGINT)) AS ivstart,
               t0 + to_seconds(CAST(gs.j * {_IV_STEP} + {_IV_SPAN} AS BIGINT)) AS ivend
        FROM base, generate_series(0, {_IV_N - 1}) AS gs(j)
    )
    SELECT e.event_id AS event_id, iv.iv_id AS iv_id
    FROM events e JOIN iv ON e.ts >= iv.ivstart AND e.ts < iv.ivend
    """,
    doc="Bucketized interval join (events x time-intervals, half-open "
    "[start,end)): OSS Spark plans a BETWEEN join as BNLJ — O(|events| x "
    "|intervals|), the scale-killer at 100 TB; operators/rangejoin.py "
    "quantizes time, explodes each interval over its covered buckets, "
    "equi-joins on the bucket id (shuffle-partitionable, AQE-skew-"
    "splittable, broadcastable) and applies the exact predicate as a "
    "residual filter.  The interval dim is data-derived (t0 = min event "
    "time, 200 alternating on/off hours); the oracle is DuckDB's native "
    "IEJoin over the same predicate — an independent algorithm, same "
    "rows.  Microsecond-exact boundary semantics unit-gated in "
    "tests/test_rangejoin.py.",
)
def interval_joined_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from classic_fcd_spark.operators.rangejoin import interval_join

    ev = load_tables(spark, sf_dir)["events"].select("event_id", "ts")
    # base epoch computed Spark-side in µs (a collected naive datetime
    # rendered in a non-UTC host tz would shift the whole interval grid)
    base_us = ev.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    us = F.col("id") * (_IV_STEP * 1_000_000) + F.lit(base_us)
    iv = spark.range(_IV_N).select(
        F.col("id").alias("iv_id"),
        F.timestamp_micros(us).alias("ivstart"),
        F.timestamp_micros(us + _IV_SPAN * 1_000_000).alias("ivend"),
    )
    return interval_join(ev, "ts", iv, "ivstart", "ivend", 1800).select(
        "event_id", "iv_id"
    )


# ---------------------------------------------------------------------------
# Gap sessionization — promoted to the driver gate in r5 (the slot freed
# by merging the two ANN rows into `ann_search`).  The streaming twin
# (streaming/sessions.py, native session_window) computes identical
# sessions — exact batch/stream agreement is unit-gated in
# tests/test_sessionize.py.
# ---------------------------------------------------------------------------
_SESSION_GAP_S = 600


@register(
    "sessionized_events",
    f"""
    WITH d AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            > {_SESSION_GAP_S * 1_000_000} THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
        FROM d
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS start_str,
           strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS end_str,
           COUNT(*) AS n_events,
           epoch_us(CAST(max(ts) AS TIMESTAMP))
             - epoch_us(CAST(min(ts) AS TIMESTAMP)) AS duration_us
    FROM s GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (600 s silence splits): lag-diff flags "
    "session starts, a running sum numbers them — two stacked windows "
    "over ONE (key, ts) partitioning, so Catalyst plans a single sort + "
    "single shuffle (plan-asserted in tests/test_sessionize.py); the "
    "rollup is one map-side-combining aggregate on (key, session_id).  "
    "The standard product-analytics operator; the streaming twin uses "
    "native session_window with watermark-evicted state and agrees "
    "exactly (unit-gated).  Boundary convention: an event EXACTLY gap "
    "seconds after the previous one merges — only strictly longer "
    "silence splits — matching Structured Streaming.",
)
def sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from classic_fcd_spark.operators.windows import session_stats

    ev = load_tables(spark, sf_dir)["events"].select("user_id", "ts")
    st = session_stats(ev, ["user_id"], "ts", _SESSION_GAP_S)
    return st.select(
        "user_id",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start_str"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("end_str"),
        "n_events",
        (
            F.unix_micros("session_end") - F.unix_micros("session_start")
        ).alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# SCD2 snapshot collapse — promoted to the driver gate in r9 (the
# pricing_summary slot, per the r8 brief; grouped-decimal-sums stay
# driver-gated via fcd_dashboard / fcd_minute_fees).  The reference
# polls validator/general_info state on a schedule (src/collector/
# general) — the warehouse layout for that snapshot stream is SCD2
# change intervals (operators/windows.py:scd2_from_snapshots).  Here
# the snapshot stream is each customer's order states in order-date
# order; the orderkey tie-break makes the per-key snapshot sequence a
# total order, so the collapse is deterministic (the snapshot-poller
# contract) and hash-exact cross-engine: every output column is a
# string/int/bool.
# ---------------------------------------------------------------------------
@register(
    "scd2_order_history",
    """
    WITH s AS (
        SELECT o_custkey AS entity,
               strftime(o_orderdate, '%Y-%m-%d') || '-'
                 || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS snap_ts,
               o_orderstatus AS status, o_orderpriority AS priority
        FROM orders
    ),
    d AS (
        SELECT *, lag(status) OVER w IS DISTINCT FROM status
                OR lag(priority) OVER w IS DISTINCT FROM priority
                OR lag(snap_ts) OVER w IS NULL AS chg
        FROM s WINDOW w AS (PARTITION BY entity ORDER BY snap_ts)
    ),
    starts AS (SELECT entity, snap_ts, status, priority FROM d WHERE chg)
    SELECT entity, snap_ts AS valid_from, status, priority,
           lead(snap_ts) OVER (PARTITION BY entity ORDER BY snap_ts) AS valid_to,
           lead(snap_ts) OVER (PARTITION BY entity ORDER BY snap_ts) IS NULL
             AS is_current
    FROM starts
    """,
    doc="SCD2 history from a snapshot stream (the validator/general_info "
    "poller's warehouse layout): null-safe lag change-detection + lead "
    "interval-closing over ONE (key, ts) partitioning — a single "
    "shuffle+sort for the whole collapse (plan-asserted in "
    "tests/test_scd2.py); storage O(changes), point-in-time enrichment "
    "becomes an interval/as-of join.",
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from classic_fcd_spark.operators.windows import scd2_from_snapshots

    orders = load_tables(spark, sf_dir)["orders"]
    snaps = orders.select(
        F.col("o_custkey").alias("entity"),
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.lit("-"),
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        ).alias("snap_ts"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    return scd2_from_snapshots(snaps, ["entity"], "snap_ts", ["status", "priority"])
